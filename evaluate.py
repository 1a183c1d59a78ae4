#!/usr/bin/env python
"""Standalone evaluation — rebuild of reference ``evaluate.py:20-101``.

``evaluate(model, variables, loader, rng, config, max_samples)`` averages the
thresholded metric suite over validation batches and collects visualization
samples; the CLI evaluates a checkpoint on a chosen split.
"""

import argparse
import logging


def evaluate(model, variables, loader, rng, config=None, max_samples: int = 4,
             amp: bool = False, apply_sigmoid_for_metrics: bool = False):
    """-> (metrics dict averaged over batches, <=max_samples viz triples)."""
    from vaeunet_tpu.training.config import TrainConfig
    from vaeunet_tpu.training.loop import evaluate_model
    from vaeunet_tpu.training.step import make_eval_step

    config = config or TrainConfig(amp=amp)
    eval_step = make_eval_step(
        config, model=model,
        apply_sigmoid_for_metrics=apply_sigmoid_for_metrics)
    return evaluate_model(eval_step, variables, loader, rng,
                          max_samples=max_samples)


def main():
    parser = argparse.ArgumentParser(description="Evaluate a checkpoint")
    parser.add_argument("--model", "-m", required=True)
    parser.add_argument("--split", default="val", choices=["train", "val", "test"])
    parser.add_argument("--lesion-type", default="EX")
    parser.add_argument("--scale", type=float, default=1.0)
    parser.add_argument("--patch-size", type=lambda x: None if x.lower() == "none" else int(x),
                        default=None)
    parser.add_argument("--batch-size", type=int, default=6)
    parser.add_argument("--max-images", type=int, default=None)
    parser.add_argument("--data-dir", default="./data")
    parser.add_argument("--fixed-threshold", action="store_true",
                        help="Compute metrics on sigmoid probabilities "
                        "instead of raw logits (fixes the reference quirk, "
                        "SURVEY.md section 2.4-2)")
    parser.add_argument("--seed", type=int, default=0)
    args = parser.parse_args()
    logging.basicConfig(level=logging.INFO, format="%(levelname)s: %(message)s")

    import jax

    from vaeunet_tpu.compat.loading import load_model_and_variables
    from vaeunet_tpu.data.dataset import IDRIDDataset
    from vaeunet_tpu.data.loader import Loader

    model, variables, _ = load_model_and_variables(args.model)
    dataset = IDRIDDataset(args.data_dir, split=args.split, scale=args.scale,
                           patch_size=args.patch_size,
                           lesion_type=args.lesion_type,
                           max_images=args.max_images)
    loader = Loader(dataset, args.batch_size, shuffle=False, drop_last=False)
    metrics, _ = evaluate(model, variables, loader, jax.random.PRNGKey(args.seed),
                          apply_sigmoid_for_metrics=args.fixed_threshold)
    for k, v in metrics.items():
        logging.info("%s: %.4f", k, v)


if __name__ == "__main__":
    main()
