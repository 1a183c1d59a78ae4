#!/usr/bin/env python
"""Visualize VAE-UNet uncertainty — TPU-native CLI.

Flag-compatible rebuild of the reference ``visualize_vae.py:1213-1452``:
walks the unique test images and writes a 3x3 uncertainty panel per image to
``outputs/<model>/<lesion>/<p{size}|full>/T{t}/N{n}/<img>_<timestamp>.png``,
with optional multi-temperature comparison and weighted temperature
ensembling.
"""

import argparse
import datetime
import logging
from pathlib import Path


def get_args():
    parser = argparse.ArgumentParser(description="Visualize VAE-UNet predictions")
    parser.add_argument("--model", "-m", default="best_model.pth", metavar="FILE")
    parser.add_argument("--lesion_type", type=str, default="EX",
                        choices=["EX", "HE", "MA", "SE", "OD"])
    parser.add_argument("--samples", "-n", type=int, default=5,
                        help="Number of latent samples per image")
    parser.add_argument("--temperature", "-t", type=float, default=1.0)
    parser.add_argument("--patch_size", "-p", type=int, default=None)
    parser.add_argument("--overlap", type=int, default=100)
    parser.add_argument("--scale", "-s", type=float, default=1.0)
    parser.add_argument("--max_images", type=int, default=None)
    parser.add_argument("--batch_size", type=int, default=4)
    parser.add_argument("--skip_border_check", action="store_true", default=True)
    parser.add_argument("--compare_temperatures", action="store_true",
                        help="Also render per-temperature mean/std rows")
    parser.add_argument("--ensemble", action="store_true",
                        help="Also render the weighted multi-T ensemble")
    parser.add_argument("--temperatures", type=float, nargs="+",
                        default=[0.5, 1.0, 2.0, 3.0])
    parser.add_argument("--unweighted", dest="weighted", action="store_false",
                        default=True)
    parser.add_argument("--latent-injection", type=str, default="all",
                        choices=["all", "first", "last", "bottleneck",
                                 "inject_no_bottleneck", "none"])
    parser.add_argument("--attention", dest="use_attention",
                        action="store_true", default=True)
    parser.add_argument("--no-attention", dest="use_attention",
                        action="store_false")
    parser.add_argument("--output_dir", type=str, default="./outputs")
    parser.add_argument("--data-dir", type=str, default="./data")
    parser.add_argument("--seed", type=int, default=0)
    return parser.parse_args()


def main():
    logging.basicConfig(level=logging.INFO, format="%(levelname)s: %(message)s")
    args = get_args()

    import jax
    import matplotlib
    matplotlib.use("Agg")

    from vaeunet_tpu.analysis.visualize import (generate_and_compare_ensemble,
                                                plot_reconstruction,
                                                visualize_temperature_sampling)
    from vaeunet_tpu.compat.loading import load_model_and_variables
    from vaeunet_tpu.data.dataset import IDRIDDataset

    model, variables, _ = load_model_and_variables(
        args.model, overrides={"use_attention": args.use_attention,
                               "latent_injection": args.latent_injection})

    dataset = IDRIDDataset(args.data_dir, split="test", scale=args.scale,
                           patch_size=None, lesion_type=args.lesion_type,
                           max_images=args.max_images,
                           skip_border_check=args.skip_border_check)

    model_name = Path(args.model).stem
    mode = f"p{args.patch_size}" if args.patch_size else "full"
    out_dir = (Path(args.output_dir) / model_name / args.lesion_type / mode
               / f"T{args.temperature}" / f"N{args.samples}")
    out_dir.mkdir(parents=True, exist_ok=True)

    rng = jax.random.PRNGKey(args.seed)
    timestamp = datetime.datetime.now().strftime("%Y%m%d_%H%M")
    count = 0
    for img_id in dataset.unique_image_ids():
        if args.max_images and count >= args.max_images:
            break
        logging.info("Visualizing %s", img_id)
        rng, sub = jax.random.split(rng)
        fig = plot_reconstruction(model, variables, dataset, img_id, sub,
                                  num_samples=args.samples,
                                  patch_size=args.patch_size,
                                  temperature=args.temperature,
                                  batch_size=args.batch_size,
                                  overlap=args.overlap)
        fig.savefig(out_dir / f"{img_id}_{timestamp}.png", dpi=150,
                    bbox_inches="tight")
        import matplotlib.pyplot as plt
        plt.close(fig)

        if args.compare_temperatures or args.ensemble:
            img, mask = dataset.get_image_and_mask(img_id)
            if args.compare_temperatures:
                rng, sub = jax.random.split(rng)
                fig = visualize_temperature_sampling(
                    model, variables, img, mask, sub,
                    temperatures=args.temperatures,
                    samples_per_temp=args.samples,
                    patch_size=args.patch_size, batch_size=args.batch_size,
                    overlap=args.overlap)
                fig.savefig(out_dir / f"{img_id}_{timestamp}_temps.png",
                            dpi=150, bbox_inches="tight")
                plt.close(fig)
            if args.ensemble:
                rng, sub = jax.random.split(rng)
                fig, results = generate_and_compare_ensemble(
                    model, variables, img, mask, sub,
                    temperatures=args.temperatures,
                    samples_per_temp=args.samples, weighted=args.weighted,
                    patch_size=args.patch_size, batch_size=args.batch_size,
                    overlap=args.overlap)
                fig.savefig(out_dir / f"{img_id}_{timestamp}_ensemble.png",
                            dpi=150, bbox_inches="tight")
                plt.close(fig)
                logging.info("Ensemble results for %s: %s", img_id, results)
        count += 1
    logging.info("Wrote visualizations for %d images to %s", count, out_dir)


if __name__ == "__main__":
    main()
