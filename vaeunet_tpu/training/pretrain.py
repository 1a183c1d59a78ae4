"""In-domain self-supervised encoder pretraining (masked reconstruction).

The reference initializes its ResNet34 encoder from ImageNet weights
(unet_resnet.py:131-137, timm ``pretrained=True``); no weights file ships in
this zero-egress environment, so this module supplies the substitute: a
masked-patch reconstruction pretext (MAE-style, but dense-conv rather than
ViT-token) trained on the unlabeled fundus patches themselves.

Task: random square blocks of the input patch are blanked to the dataset
mean; the ResNet encoder sees the corrupted patch; a light upsampling head
reconstructs the original; the loss is MSE weighted toward the masked
region.  Learning to in-paint fundus texture forces the encoder to model
vasculature/lesion appearance — transferable features for segmentation.

Usage: ``scripts/pretrain_encoder.py`` trains and saves an
``{'params': {'encoder': ...}, 'batch_stats': {'encoder': ...}}`` orbax
checkpoint; ``train.py --pretrained-encoder <dir>`` transplants that subtree
into a fresh UNetResNet before supervised training.
"""

from __future__ import annotations

import logging
from typing import Any, Dict

import flax.linen as nn
import jax
import jax.numpy as jnp

from vaeunet_tpu.models.resnet import ResNetEncoder
from vaeunet_tpu.ops.layers import BatchNorm, Conv
from vaeunet_tpu.ops.resize import resize_bilinear

log = logging.getLogger(__name__)


class MaskedReconstructor(nn.Module):
    """ResNet encoder + light progressive-upsample head -> RGB recon."""

    n_channels: int = 3
    backbone: str = "resnet34"

    def setup(self):
        self.encoder = ResNetEncoder(self.n_channels, backbone=self.backbone,
                                     name="encoder")
        widths = (256, 128, 64, 32, 16)
        self.head_convs = [Conv(w, kernel_size=3, name=f"head_conv{i}")
                           for i, w in enumerate(widths)]
        self.head_bns = [BatchNorm(w, name=f"head_bn{i}")
                         for i, w in enumerate(widths)]
        self.out_conv = Conv(self.n_channels, kernel_size=1, name="head_out")

    def __call__(self, x, train: bool = False):
        feats = self.encoder(x, train=train)
        h = feats[-1]                                   # H/32, 512ch
        for conv, bn in zip(self.head_convs, self.head_bns):
            hw = (h.shape[1] * 2, h.shape[2] * 2)
            h = resize_bilinear(h, hw, align_corners=False)
            h = nn.relu(bn(conv(h), use_running_average=not train))
        if h.shape[1:3] != x.shape[1:3]:
            h = resize_bilinear(h, x.shape[1:3], align_corners=False)
        return self.out_conv(h)


class ContrastiveProjector(nn.Module):
    """ResNet encoder + global pool + 2-layer projection head (SimCLR).

    The second ImageNet-prior substitute pretext (the masked-recon attempt
    lost its A/B, RESULTS r2): instance discrimination over two on-device
    augmented views of each fundus patch, NT-Xent over the batch.  Uses the
    SAME augmentation policy the supervised step folds in (data/augment.py
    — the jnp rebuild of the reference's albumentations Compose,
    utils/data_loading.py:116-180), so the invariances learned are exactly
    the ones training exploits.
    """

    n_channels: int = 3
    backbone: str = "resnet34"
    proj_dim: int = 128

    def setup(self):
        self.encoder = ResNetEncoder(self.n_channels, backbone=self.backbone,
                                     name="encoder")
        self.proj1 = nn.Dense(256, name="proj1")
        self.proj2 = nn.Dense(self.proj_dim, name="proj2")

    def __call__(self, x, train: bool = False):
        feats = self.encoder(x, train=train)
        h = feats[-1].mean(axis=(1, 2))                 # [B, 512]
        z = self.proj2(nn.relu(self.proj1(h))).astype(jnp.float32)
        return z / (jnp.linalg.norm(z, axis=-1, keepdims=True) + 1e-8)


def ntxent_loss(z1: jnp.ndarray, z2: jnp.ndarray,
                temperature: float = 0.2) -> jnp.ndarray:
    """Normalized-temperature cross entropy (SimCLR eq. 1) for paired
    views: z1[i] and z2[i] are positives; all other 2B-2 rows negatives.
    Inputs must be L2-normalized [B, D]."""
    z = jnp.concatenate([z1, z2], axis=0)               # [2B, D]
    b = z1.shape[0]
    sim = (z @ z.T) / temperature
    sim = jnp.where(jnp.eye(2 * b, dtype=bool), -jnp.inf, sim)
    labels = jnp.concatenate([jnp.arange(b) + b, jnp.arange(b)])
    logp = jax.nn.log_softmax(sim, axis=-1)
    return -jnp.take_along_axis(logp, labels[:, None], axis=1).mean()


def make_contrastive_step(model: ContrastiveProjector, learning_rate: float,
                          weight_decay: float = 1e-5, amp: bool = True,
                          indexed: bool = False, temperature: float = 0.2):
    """Same driver contract as make_pretrain_step (tx, jit'd step); the
    step's aux pair is (loss, loss) so scripts can share the logging path.
    Both views are augmented inside the compiled program — no host pixel
    traffic beyond the uint8 cache gather."""
    import optax

    from vaeunet_tpu.data.augment import augment_sample

    tx = optax.chain(optax.clip_by_global_norm(1.0),
                     optax.adamw(learning_rate, weight_decay=weight_decay))

    def two_views(rng, images):
        dummy = jnp.zeros(images.shape[:-1] + (1,), images.dtype)
        k1, k2 = jax.random.split(rng)
        ks1 = jax.random.split(k1, images.shape[0])
        ks2 = jax.random.split(k2, images.shape[0])
        v1, _ = jax.vmap(augment_sample)(ks1, images, dummy)
        v2, _ = jax.vmap(augment_sample)(ks2, images, dummy)
        return v1, v2

    def loss_fn(params, batch_stats, v1, v2):
        x = jnp.concatenate([v1, v2], axis=0)
        if amp:
            x = x.astype(jnp.bfloat16)
        z, mutated = model.apply(
            {"params": params, "batch_stats": batch_stats}, x, train=True,
            mutable=["batch_stats"])
        z1, z2 = jnp.split(z, 2, axis=0)
        return (ntxent_loss(z1, z2, temperature),
                mutated["batch_stats"])

    def core(params, batch_stats, opt_state, images, rng):
        rng, sub = jax.random.split(rng)
        v1, v2 = two_views(sub, images)
        (loss, batch_stats), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params, batch_stats, v1, v2)
        updates, opt_state = tx.update(grads, opt_state, params)
        import optax as _optax
        params = _optax.apply_updates(params, updates)
        return params, batch_stats, opt_state, rng, loss, loss

    if indexed:
        @jax.jit
        def step(params, batch_stats, opt_state, data_images, idx, rng):
            images = jnp.take(data_images, idx,
                              axis=0).astype(jnp.float32) / 255.0
            return core(params, batch_stats, opt_state, images, rng)
    else:
        step = jax.jit(core)

    return tx, step


def make_block_mask(rng, batch: int, hw: int, block: int = 32,
                    mask_ratio: float = 0.4):
    """[B,H,W,1] float mask: 1 where the input is blanked (to reconstruct)."""
    g = hw // block
    keep = jax.random.uniform(rng, (batch, g, g)) < mask_ratio
    m = keep.astype(jnp.float32)
    m = jnp.repeat(jnp.repeat(m, block, axis=1), block, axis=2)
    return m[..., None]


def make_pretrain_step(model: MaskedReconstructor, learning_rate: float,
                       weight_decay: float = 1e-5, amp: bool = True,
                       indexed: bool = False):
    """``indexed=True``: step(params, bs, opt, data_images_u8, idx, rng) —
    the batch is gathered from an HBM-resident uint8 patch array inside the
    compiled program (data.device_cache), so epochs run without host pixel
    traffic (the tunnel H2D path is ~5x slower than compute here)."""
    import optax

    tx = optax.chain(optax.clip_by_global_norm(1.0),
                     optax.adamw(learning_rate, weight_decay=weight_decay))

    def loss_fn(params, batch_stats, images, mask, fill):
        x = images * (1.0 - mask) + fill * mask
        if amp:
            x = x.astype(jnp.bfloat16)
        recon, mutated = model.apply(
            {"params": params, "batch_stats": batch_stats}, x, train=True,
            mutable=["batch_stats"])
        recon = recon.astype(jnp.float32)
        se = jnp.square(recon - images)
        masked = (se * mask).sum() / (mask.sum() * images.shape[-1] + 1e-8)
        visible = (se * (1 - mask)).sum() / (
            (1 - mask).sum() * images.shape[-1] + 1e-8)
        loss = masked + 0.1 * visible
        return loss, (mutated["batch_stats"], masked)

    def core(params, batch_stats, opt_state, images, rng):
        rng, sub = jax.random.split(rng)
        mask = make_block_mask(sub, images.shape[0], images.shape[1])
        fill = images.mean(axis=(1, 2), keepdims=True)
        (loss, (batch_stats, masked_mse)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params, batch_stats, images, mask, fill)
        updates, opt_state = tx.update(grads, opt_state, params)
        import optax as _optax
        params = _optax.apply_updates(params, updates)
        return params, batch_stats, opt_state, rng, loss, masked_mse

    if indexed:
        @jax.jit
        def step(params, batch_stats, opt_state, data_images, idx, rng):
            images = jnp.take(data_images, idx,
                              axis=0).astype(jnp.float32) / 255.0
            return core(params, batch_stats, opt_state, images, rng)
    else:
        step = jax.jit(core)

    return tx, step


def encoder_subtree(variables: Dict[str, Any]) -> Dict[str, Any]:
    """Extract the transplantable encoder state from pretrain variables."""
    return {"params": {"encoder": variables["params"]["encoder"]},
            "batch_stats": {"encoder": variables["batch_stats"]["encoder"]}}


def transplant_encoder(variables: Dict[str, Any],
                       encoder_state: Dict[str, Any]) -> Dict[str, Any]:
    """Return ``variables`` with the encoder subtree replaced (shape-checked).

    ``variables``: a UNetResNet (or any model with a top-level 'encoder'
    module) init; ``encoder_state``: as produced by :func:`encoder_subtree`.
    """
    import flax

    src = encoder_state["params"]["encoder"]
    dst = variables["params"]["encoder"]
    src_shapes = jax.tree.map(jnp.shape, src)
    dst_shapes = jax.tree.map(jnp.shape, dst)
    if src_shapes != dst_shapes:
        raise ValueError("pretrained encoder param shapes do not match model "
                         f"(backbone mismatch?): {src_shapes} vs {dst_shapes}")
    variables = flax.core.unfreeze(variables)
    variables["params"] = dict(variables["params"], encoder=src)
    variables["batch_stats"] = dict(
        variables["batch_stats"],
        encoder=encoder_state["batch_stats"]["encoder"])
    return variables
