#!/usr/bin/env python
"""Analyze VAE-UNet performance and uncertainty — TPU-native CLI.

Flag-compatible rebuild of the reference ``analyze_model.py:1230-1269``.
Loads a checkpoint (reference .pth or vaeunet_tpu orbax run dir), runs the
N-sample uncertainty analysis over the test split, and writes
``analysis_metrics.csv`` + global plots under
``<output_dir>/<LESION>_T<T>_N<N>/``.
"""

import argparse
import logging


def get_args():
    parser = argparse.ArgumentParser(
        description="Analyze VAE-UNet model performance and uncertainty")
    parser.add_argument("--model", "-m", default="best_model.pth", metavar="FILE")
    parser.add_argument("--lesion_type", type=str, required=True,
                        choices=["EX", "HE", "MA", "SE", "OD"])
    parser.add_argument("--temperature", type=float, default=1.0)
    parser.add_argument("--samples", type=int, default=10)
    parser.add_argument("--patch_size", type=int, default=None)
    parser.add_argument("--overlap", type=int, default=100)
    parser.add_argument("--scale", type=float, default=1.0)
    parser.add_argument("--attention", dest="use_attention", action="store_true")
    parser.add_argument("--no-attention", dest="use_attention",
                        action="store_false")
    parser.add_argument("--latent-injection", type=str, default="all",
                        choices=["all", "first", "last", "bottleneck",
                                 "inject_no_bottleneck", "none"])
    parser.add_argument("--output_dir", type=str, default="./analysis_results")
    parser.add_argument("--max_images", type=int, default=None)
    parser.add_argument("--temp_values", type=float, nargs="+",
                        default=[0.5, 1.0, 1.5, 2.0, 2.5, 3.0])
    parser.add_argument("--model_label", type=str, default="VAE-UNet")
    parser.add_argument("--batch_size", type=int, default=4)
    parser.add_argument("--extended-metrics", action="store_true",
                        help="Emit the older analyzer's superset columns")
    parser.add_argument("--no_wandb", action="store_true")
    parser.add_argument("--wandb_project", type=str, default="VAE_UNet_Analysis")
    parser.add_argument("--data-dir", type=str, default="./data")
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--threshold-mode", choices=["fixed", "area"],
                        default="fixed",
                        help="Decision rule: global 0.5 (reference "
                             "behavior) or per-image expected-area "
                             "threshold (framework extension)")
    parser.add_argument("--area-factor", type=float, default=1.0)
    parser.set_defaults(use_attention=True)
    return parser.parse_args()


def main():
    logging.basicConfig(
        level=logging.INFO,
        format="%(asctime)s - %(name)s - %(levelname)s - %(message)s")
    args = get_args()

    from vaeunet_tpu.analysis.analyze import AnalyzeArgs, analyze_model
    from vaeunet_tpu.data.dataset import IDRIDDataset
    from vaeunet_tpu.utils.tracking import Tracker

    tracker = None
    if not args.no_wandb:
        tracker = Tracker(project=args.wandb_project, config=vars(args),
                          job_type="analysis")

    from vaeunet_tpu.compat.loading import load_model_and_variables
    model, variables, _ = load_model_and_variables(
        args.model, overrides={"use_attention": args.use_attention,
                               "latent_injection": args.latent_injection})

    dataset = IDRIDDataset(args.data_dir, split="test", scale=args.scale,
                           patch_size=None, lesion_type=args.lesion_type,
                           max_images=args.max_images, skip_border_check=True)

    a = AnalyzeArgs(
        lesion_type=args.lesion_type, temperature=args.temperature,
        samples=args.samples, patch_size=args.patch_size,
        overlap=args.overlap, output_dir=args.output_dir,
        max_images=args.max_images, temp_values=tuple(args.temp_values),
        model_label=args.model_label, batch_size=args.batch_size,
        extended_metrics=args.extended_metrics, seed=args.seed,
        threshold_mode=args.threshold_mode, area_factor=args.area_factor)
    df = analyze_model(model, variables, dataset, a, tracker=tracker)
    if tracker:
        tracker.finish()
    logging.info("Analyzed %d images", len(df))


if __name__ == "__main__":
    main()
