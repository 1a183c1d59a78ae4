#!/usr/bin/env python
"""Predict masks from input images — milesial-style CLI.

The BASELINE names the upstream predict.py sigmoid-threshold CLI as a parity
surface (SURVEY.md scope note): load a model, scale each input image,
forward, sigmoid > threshold, save/visualize the binary mask.  Works with
both the plain UNet and the VAE-UNet (deterministic z=mu path).
"""

import argparse
import logging
from pathlib import Path

import numpy as np
from PIL import Image


def get_args():
    parser = argparse.ArgumentParser(description="Predict masks from input images")
    parser.add_argument("--model", "-m", default="MODEL.pth", metavar="FILE",
                        help="Specify the file in which the model is stored")
    parser.add_argument("--input", "-i", metavar="INPUT", nargs="+",
                        help="Filenames of input images", required=True)
    parser.add_argument("--output", "-o", metavar="OUTPUT", nargs="+",
                        help="Filenames of output images")
    parser.add_argument("--viz", "-v", action="store_true",
                        help="Visualize the images as they are processed")
    parser.add_argument("--no-save", "-n", action="store_true",
                        help="Do not save the output masks")
    parser.add_argument("--mask-threshold", "-t", type=float, default=0.5,
                        help="Minimum probability to consider a mask pixel white")
    parser.add_argument("--scale", "-s", type=float, default=0.5,
                        help="Scale factor for the input images")
    parser.add_argument("--bilinear", action="store_true", default=False)
    parser.add_argument("--classes", "-c", type=int, default=1)
    parser.add_argument("--model-type", type=str, default="basic",
                        choices=["basic", "resnet"])
    return parser.parse_args()


def _out_name(in_path: str) -> str:
    p = Path(in_path)
    return str(p.with_name(f"{p.stem}_OUT.png"))


def predict_img(model, variables, pil_img, scale: float, threshold: float):
    import jax.numpy as jnp

    from vaeunet_tpu.data.dataset import preprocess_pil
    from vaeunet_tpu.inference.predict import predict_image
    from vaeunet_tpu.ops.resize import resize_bilinear

    arr = preprocess_pil(pil_img, scale, is_mask=False).astype(np.float32) / 255.0
    probs, _ = predict_image(model, variables, jnp.asarray(arr),
                             out_threshold=threshold)
    # upscale probabilities back to the original size then threshold
    # (milesial predict semantics)
    full = resize_bilinear(probs[None], (pil_img.size[1], pil_img.size[0]),
                           align_corners=False)[0]
    return np.asarray(full[..., 0] > threshold)


def main():
    logging.basicConfig(level=logging.INFO, format="%(levelname)s: %(message)s")
    args = get_args()

    from vaeunet_tpu.compat.loading import load_model_and_variables

    # architecture comes from the checkpoint itself (state-dict keys for
    # .pth, stored config for orbax runs); --model-type/--classes/--bilinear
    # are accepted for milesial flag parity but the checkpoint wins.
    model, variables, _ = load_model_and_variables(args.model)
    logging.info("Model loaded from %s", args.model)

    out_files = args.output or [_out_name(f) for f in args.input]
    for in_file, out_file in zip(args.input, out_files):
        logging.info("Predicting image %s ...", in_file)
        img = Image.open(in_file).convert("RGB")
        mask = predict_img(model, variables, img, args.scale,
                           args.mask_threshold)
        if not args.no_save:
            Image.fromarray((mask * 255).astype(np.uint8)).save(out_file)
            logging.info("Mask saved to %s", out_file)
        if args.viz:
            import matplotlib
            matplotlib.use("Agg")
            import matplotlib.pyplot as plt
            fig, axes = plt.subplots(1, 2, figsize=(10, 5))
            axes[0].imshow(img)
            axes[0].set_title("Input image")
            axes[1].imshow(mask, cmap="gray")
            axes[1].set_title("Output mask")
            for a in axes:
                a.axis("off")
            viz_path = str(Path(out_file).with_suffix(".viz.png"))
            fig.savefig(viz_path, dpi=150, bbox_inches="tight")
            plt.close(fig)
            logging.info("Visualization saved to %s", viz_path)


if __name__ == "__main__":
    main()
