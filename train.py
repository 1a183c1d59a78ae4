#!/usr/bin/env python
"""Train the (VAE-)UNet on fundus images — TPU-native CLI.

Flag-compatible rebuild of the reference ``train.py:624-668`` (same names,
same defaults), dispatching into vaeunet_tpu.  Differences:
- ``--load`` accepts either a reference ``.pth`` checkpoint (converted via
  vaeunet_tpu.compat) or a vaeunet_tpu orbax run dir
- ``--resume`` restores the FULL training state (optimizer/scheduler/PRNG),
  which the reference could not do
- ``--num-devices`` enables data-parallel training over a TPU mesh
"""

import argparse
import logging


def get_args():
    parser = argparse.ArgumentParser(
        description="Train the UNet on images and target masks")
    parser.add_argument("--epochs", "-e", metavar="E", type=int, default=100)
    parser.add_argument("--batch-size", "-b", dest="batch_size", metavar="B",
                        type=int, default=6)
    parser.add_argument("--learning-rate", "-l", metavar="LR", type=float,
                        default=1e-4)
    parser.add_argument("--load", "-f", type=str, default=False,
                        help="Load model weights from a .pth/.orbax checkpoint")
    parser.add_argument("--reset-best", action="store_true", default=False,
                        help="With --resume: start best-val tracking fresh "
                        "(fine-tunes under a new objective save their own best)")
    parser.add_argument("--resume", type=str, default=None,
                        help="Resume full training state from a run dir")
    parser.add_argument("--scale", "-s", type=float, default=1.0)
    parser.add_argument("--validation", "-v", dest="val", type=float,
                        default=10.0, help="(kept for flag parity; unused — "
                        "IDRiD ships explicit splits)")
    parser.add_argument("--amp", action="store_true", default=True)
    parser.add_argument("--no-amp", dest="amp", action="store_false")
    parser.add_argument("--bilinear", action="store_true", default=False)
    parser.add_argument("--classes", "-c", type=int, default=1)
    parser.add_argument("--patch-size", "-p",
                        type=lambda x: None if x.lower() == "none" else int(x),
                        default=None)
    parser.add_argument("--gradient-clipping", type=float, default=1.0)
    parser.add_argument("--max-images", type=int, default=None)
    parser.add_argument("--use-checkpointing", action="store_true", default=False,
                        help="Gradient rematerialization (memory saver)")
    parser.add_argument("--remat-policy", type=str, default="full",
                        choices=["full", "save_convs"],
                        help="With --use-checkpointing: 'save_convs' keeps "
                        "conv/resize products and recomputes only BN/ReLU")
    parser.add_argument("--gradient-accumulation-steps", type=int, default=2)
    parser.add_argument("--early-stopping-patience", type=int, default=5)
    parser.add_argument("--loss", type=str, default="auto",
                        choices=["auto", "combined", "focal"],
                        help="Override the per-lesion loss rule (auto = "
                        "reference behavior: MA->focal+dice, else BCE+dice)")
    parser.add_argument("--lesion-type", type=str, default="EX")
    parser.add_argument("--model-type", type=str, default="resnet",
                        choices=["basic", "resnet"])
    parser.add_argument("--skip", dest="use_skip", action="store_true")
    parser.add_argument("--no-skip", dest="use_skip", action="store_false")
    parser.add_argument("--attention", dest="use_attention", action="store_true")
    parser.add_argument("--no-attention", dest="use_attention",
                        action="store_false")
    parser.add_argument("--kl-anneal-epochs", type=int, default=20)
    parser.add_argument("--free-bits", type=float, default=1e-3)
    parser.add_argument("--latent-injection", type=str, default="all",
                        choices=["all", "first", "last", "bottleneck",
                                 "inject_no_bottleneck", "none"])
    parser.add_argument("--beta", type=float, default=0.001)
    parser.add_argument("--seed", type=int, default=42)
    parser.add_argument("--data-dir", type=str, default="./data")
    parser.add_argument("--dataset", type=str, default="idrid",
                        choices=["idrid", "basic"],
                        help="'basic' = Carvana-style dir-of-images dataset")
    parser.add_argument("--mask-suffix", type=str, default="_mask")
    parser.add_argument("--checkpoint-dir", type=str, default="./checkpoints")
    parser.add_argument("--num-devices", type=int, default=1,
                        help="Data-parallel devices (1 = single chip)")
    parser.add_argument("--lr-patience", type=int, default=None,
                        help="Plateau-LR patience override (validations)")
    parser.add_argument("--lr-factor", type=float, default=None,
                        help="Plateau-LR decay factor override")
    parser.add_argument("--device-cache-max-bytes", type=int,
                        default=6_000_000_000,
                        help="HBM budget for the device-resident dataset; "
                        "raise on chips with headroom (v5e: 16 GB total)")
    parser.add_argument("--no-device-cache", dest="device_cache",
                        action="store_false", default=True,
                        help="Disable the HBM-resident dataset (falls back "
                        "to host-fed batches)")
    parser.add_argument("--pretrained-encoder", type=str, default=None,
                        metavar="DIR",
                        help="Init the ResNet encoder from a self-supervised "
                        "checkpoint (scripts/pretrain_encoder.py) — the "
                        "in-domain substitute for the reference's ImageNet "
                        "init (unet_resnet.py:131-137)")
    parser.add_argument("--oversample-large-lesions", type=float, default=0.0,
                        dest="oversample_lesion", metavar="K",
                        help="Replicate large-lesion train patches "
                        "(1 + min(4, floor(lesion_frac * K)) copies); 0 keeps "
                        "the reference's balanced sampling")
    parser.add_argument("--deep-supervision", action="store_true",
                        default=False,
                        help="Aux dice+BCE losses on decoder levels 0-2 "
                        "(framework extension; from-scratch training aid)")
    parser.add_argument("--kl-clamp-leak", type=float, default=0.0,
                        help="Gradient leak through the +-100 KL clamp "
                        "(0 = reference parity; ~0.01 restores a restoring "
                        "force on runaway latent dims)")
    parser.add_argument("--debug-nans", action="store_true", default=False,
                        help="Enable jax_debug_nans and disable buffer "
                        "donation (NaN post-mortem; the reference's NaN "
                        "guards as a debug mode)")
    parser.set_defaults(use_attention=True, use_skip=True)
    return parser.parse_args()


def main():
    args = get_args()
    logging.basicConfig(level=logging.INFO, format="%(levelname)s: %(message)s")

    import jax
    from vaeunet_tpu.training.config import TrainConfig
    from vaeunet_tpu.training.loop import train_model

    logging.info("Using devices: %s", jax.devices())

    config = TrainConfig(
        model_type=args.model_type,
        n_channels=3,
        n_classes=args.classes,
        bilinear=args.bilinear,
        use_attention=args.use_attention,
        use_skip=args.use_skip,
        latent_injection=args.latent_injection,
        epochs=args.epochs,
        batch_size=args.batch_size,
        learning_rate=args.learning_rate,
        amp=args.amp,
        gradient_clipping=args.gradient_clipping,
        gradient_accumulation_steps=args.gradient_accumulation_steps,
        early_stopping_patience=args.early_stopping_patience,
        beta=args.beta,
        free_bits=args.free_bits,
        kl_anneal_epochs=args.kl_anneal_epochs,
        data_dir=args.data_dir,
        dataset_type=args.dataset,
        mask_suffix=args.mask_suffix,
        img_scale=args.scale,
        patch_size=args.patch_size,
        max_images=args.max_images,
        lesion_type=args.lesion_type,
        loss=args.loss,
        reset_best=args.reset_best,
        seed=args.seed,
        checkpoint_dir=args.checkpoint_dir,
        use_remat=args.use_checkpointing,
        remat_policy=args.remat_policy,
        num_devices=args.num_devices,
        device_cache=args.device_cache,
        device_cache_max_bytes=args.device_cache_max_bytes,
        debug_nans=args.debug_nans,
        lr_patience=args.lr_patience,
        lr_factor=args.lr_factor,
        oversample_lesion=args.oversample_lesion,
        deep_supervision=args.deep_supervision,
        kl_clamp_leak=args.kl_clamp_leak,
    )

    variables = None
    if args.load:
        if str(args.load).endswith(".pth"):
            from vaeunet_tpu.compat.torch_weights import load_reference_checkpoint
            variables, meta = load_reference_checkpoint(args.load)
            logging.info("Converted reference checkpoint %s (params: %s)",
                         args.load, meta)
        else:
            import jax.numpy as jnp
            from vaeunet_tpu.training.checkpoint import restore_checkpoint
            from vaeunet_tpu.training.state import create_train_state
            template = create_train_state(config, jax.random.PRNGKey(0))
            restored, _ = restore_checkpoint(args.load, template)
            variables = restored.variables()
            logging.info("Loaded weights from %s", args.load)

    if args.pretrained_encoder:
        import orbax.checkpoint as ocp
        from pathlib import Path
        from vaeunet_tpu.training.pretrain import transplant_encoder
        from vaeunet_tpu.training.state import create_train_state
        if variables is None:
            state = create_train_state(config, jax.random.PRNGKey(config.seed))
            variables = state.variables()
        with ocp.PyTreeCheckpointer() as ckptr:
            enc = ckptr.restore(
                Path(args.pretrained_encoder).absolute() / "encoder")
        variables = transplant_encoder(variables, enc)
        logging.info("Initialized encoder from %s", args.pretrained_encoder)

    if config.num_devices > 1:
        from vaeunet_tpu.parallel.dp import train_model_dp
        train_model_dp(config, variables=variables, resume_from=args.resume)
    else:
        train_model(config, variables=variables, resume_from=args.resume)


if __name__ == "__main__":
    main()
