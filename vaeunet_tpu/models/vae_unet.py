"""VAE-UNet: ResNet34-encoder U-Net with a variational bottleneck, flax/NHWC.

Rebuild of reference ``unet/unet_resnet.py``:
- DecoderBlock                      <- unet_resnet.py:31-101
- UNetResNet (mu/logvar heads,
  reparameterize, z_initial,
  injection strategies, decoder)    <- unet_resnet.py:103-279

Key TPU-first deviations from the torch original (outputs are identical):
- the latent z is spatially constant, so "interpolate z to HxW"
  (unet_resnet.py:217-221) is implemented as a broadcast, not a gather;
- sampling is functional: the PRNG key is threaded explicitly, and the
  N-sample uncertainty ensemble vmaps ``decode_features`` over a batch of z
  instead of a Python loop (cf. visualize_vae.py:617-647);
- modules are defined in ``setup`` so ``encode`` / ``decode_features`` are
  first-class apply methods.

Injection strategies (unet_resnet.py:104-123):
  'all'                  bottleneck + all 4 decoder levels
  'first'                bottleneck + level 0
  'last'                 bottleneck + level 3
  'bottleneck'           bottleneck only
  'inject_no_bottleneck' levels 0-3, decoder starts from encoder features
  'none'                 no injection anywhere (z = mu, deterministic)
  (i0, i1, ...)          bottleneck + the listed 0-based levels
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
from flax import linen as nn
from jax.ad_checkpoint import checkpoint_name

from vaeunet_tpu.models.resnet import ResNetEncoder
from vaeunet_tpu.ops.layers import BatchNorm, Conv, SlicedConv
from vaeunet_tpu.ops.pool import avg_pool_global
from vaeunet_tpu.ops.resize import broadcast_latent_spatial, resize_bilinear

LatentInjection = Union[str, Tuple[int, ...]]


def resolve_injection(latent_injection: LatentInjection) -> Tuple[Tuple[bool, ...], bool, bool]:
    """-> (use_latent per decoder level, use_bottleneck, should_sample).

    Mirrors unet_resnet.py:156-175 and :210 exactly, including the fallback of
    unknown strings to 'all'.
    """
    if isinstance(latent_injection, (tuple, list)):
        use_latent = tuple(i in tuple(latent_injection) for i in range(4))
        return use_latent, True, True
    s = latent_injection
    if s in ("all", "inject_no_bottleneck"):
        use_latent = (True, True, True, True)
    elif s == "first":
        use_latent = (True, False, False, False)
    elif s == "last":
        use_latent = (False, False, False, True)
    elif s in ("bottleneck", "none"):
        use_latent = (False, False, False, False)
    else:  # unknown -> 'all' (reference behavior)
        use_latent = (True, True, True, True)
        s = "all"
    use_bottleneck = s not in ("none", "inject_no_bottleneck")
    should_sample = s not in ("none", "inject_no_bottleneck")
    return use_latent, use_bottleneck, should_sample


class AttentionGate(nn.Module):
    """Same additive gate as parts.AttentionGate but with the unet_resnet
    channel plan (unet_resnet.py:6-29): gate signal g is the upsampled decoder
    feature, x is the skip.

    ``resize_to``: pass the decoder feature at its *pre-upsample* resolution
    and let the gate upsample AFTER its 1x1 projection.  A 1x1 conv is a
    per-pixel channel matmul and bilinear resize is a per-channel spatial
    matmul, so ``W_g(resize(g)) == resize(W_g(g))`` exactly (up to fp
    rounding) — but the commuted order reads the C_in-channel tensor at 1/4
    the pixels and runs the resize on f_int channels instead of C_in.  HLO
    attribution showed the gate's reads of the upsampled decoder feature
    were the single hottest item in the train step (~30% of estimated
    cycles, most of it in decoder_3 where that tensor is 268 MB).
    """

    f_int: int
    exact: bool = False   # strict parity mode: conv-emitter 1x1 lowering

    @nn.compact
    def __call__(self, g, x, train: bool = False,
                 resize_to: Optional[Tuple[int, int]] = None):
        dot = not self.exact
        g1 = Conv(self.f_int, kernel_size=1, name="W_g_conv",
                  use_dot_1x1=dot)(g)
        if resize_to is not None and tuple(g.shape[1:3]) != tuple(resize_to):
            g1 = resize_bilinear(g1, resize_to, align_corners=True)
        g1 = BatchNorm(self.f_int, name="W_g_bn")(g1, use_running_average=not train)
        x1 = Conv(self.f_int, kernel_size=1, name="W_x_conv",
                  use_dot_1x1=dot)(x)
        x1 = BatchNorm(self.f_int, name="W_x_bn")(x1, use_running_average=not train)
        psi = nn.relu(g1 + x1)
        psi = Conv(1, kernel_size=1, name="psi_conv", use_dot_1x1=dot)(psi)
        psi = BatchNorm(1, name="psi_bn")(psi, use_running_average=not train)
        psi = nn.sigmoid(psi)
        # capturable attention map — the functional replacement for the
        # reference's forward hooks on AttentionGate.psi
        # (analyze_model.py:48-57,725-744): apply with
        # mutable=['intermediates'] to collect.
        self.sow("intermediates", "psi", psi)
        return x * psi


class DecoderBlock(nn.Module):
    """Upsample -> (attention-gated) skip concat -> optional z concat ->
    (3x3 conv + BN + ReLU) x 2.  (unet_resnet.py:31-101)

    With ``fused=True`` (default) the block computes the same math without
    materializing the concatenation or the z broadcast: conv1 is applied as
    kernel slices summed over components, and the spatially-constant latent
    branch is evaluated at 1x1 with its 3x3-conv contribution reconstructed
    exactly from border-class tap sums (HLO profiling showed the broadcast +
    concat copies were ~14% of step time).  Parameters and checkpoints are
    identical in both modes.
    """

    in_channels: int
    out_channels: int
    latent_dim: int
    use_attention: bool = True
    use_skip: bool = True
    use_latent: bool = True
    skip_channels: int = 0      # required when fused and use_skip
    fused: bool = True
    # emit checkpoint_name('remat_save') markers for the save_convs remat
    # policy; off by default so the compiled HLO of the standard path is
    # unchanged (the markers alter the module hash and force recompiles)
    save_names: bool = False

    def setup(self):
        if self.use_latent:
            self.z_proj_conv = Conv(self.latent_dim, kernel_size=1,
                                    name="z_proj_conv",
                                    use_dot_1x1=self.fused)
            self.z_proj_bn = BatchNorm(self.latent_dim, name="z_proj_bn")
        if self.use_attention and self.use_skip:
            self.attention = AttentionGate(self.in_channels // 4,
                                           exact=not self.fused,
                                           name="attention")
        total_in = (self.in_channels
                    + (self.skip_channels if self.use_skip else 0)
                    + (self.latent_dim if self.use_latent else 0))
        if self.fused:
            self.conv1 = SlicedConv(total_in, self.out_channels, name="conv1")
        else:
            self.conv1 = Conv(self.out_channels, kernel_size=3, padding=1,
                              use_bias=False, name="conv1")
        self.bn1 = BatchNorm(self.out_channels, name="bn1")
        self.conv2 = Conv(self.out_channels, kernel_size=3, padding=1,
                          use_bias=False, name="conv2")
        self.bn2 = BatchNorm(self.out_channels, name="bn2")

    def __call__(self, x, skip, z, train: bool = False):
        """x: [B,h,w,Cin]; skip: [B,H,W,Cs] or None; z: [B,D] (spatially
        constant latent) or None."""
        if skip is not None:
            out_hw = skip.shape[1:3]
        else:
            out_hw = (x.shape[1] * 2, x.shape[2] * 2)

        if self.fused:
            # gate from the pre-upsample decoder feature (commuted 1x1
            # projection — see AttentionGate docstring), then upsample x
            if skip is not None and self.use_skip and self.use_attention:
                skip = self.attention(x, skip, train=train, resize_to=out_hw)
            x = resize_bilinear(x, out_hw, align_corners=True)
        else:
            x = resize_bilinear(x, out_hw, align_corners=True)
            if skip is not None and self.use_skip and self.use_attention:
                skip = self.attention(x, skip, train=train)
        has_skip = skip is not None and self.use_skip
        if self.save_names:
            # remat_policy='save_convs': the matmul-heavy products a
            # selective rematerialization must NOT recompute (resize
            # contraction, gated skip); BN/ReLU between them is recomputed.
            x = checkpoint_name(x, "remat_save")
            if has_skip:
                skip = checkpoint_name(skip, "remat_save")

        if self.fused:
            y = self.conv1(x, 0)
            offset = self.in_channels
            if has_skip:
                y = y + self.conv1(skip, offset)
                offset += self.skip_channels
            if self.use_latent:
                b, h, w = x.shape[0], out_hw[0], out_hw[1]
                zv = self.z_proj_conv(z[:, None, None, :])
                zv = self.z_proj_bn(zv, use_running_average=not train,
                                    virtual_n=b * h * w)
                zv = nn.relu(zv)[:, 0, 0, :]
                y = y + self.conv1.constant_input_term(zv, offset, out_hw)
        else:
            components = [x]
            if has_skip:
                components.append(skip)
            if self.use_latent:
                z_sp = broadcast_latent_spatial(z, out_hw)
                z_sp = self.z_proj_conv(z_sp)
                z_sp = self.z_proj_bn(z_sp, use_running_average=not train)
                components.append(nn.relu(z_sp))
            y = self.conv1(jnp.concatenate(components, axis=-1))
        if self.save_names:
            y = checkpoint_name(y, "remat_save")
        y = nn.relu(self.bn1(y, use_running_average=not train))
        y = self.conv2(y)
        if self.save_names:
            y = checkpoint_name(y, "remat_save")
        y = nn.relu(self.bn2(y, use_running_average=not train))
        return y


class UNetResNet(nn.Module):
    """VAE-UNet flagship model.  (unet_resnet.py:103-279)

    ``__call__`` returns (logits, mu, logvar) like the reference forward;
    pass ``rngs={'latent': key}`` to apply when sampling is active.
    """

    n_channels: int = 3
    n_classes: int = 1
    backbone: str = "resnet34"
    latent_dim: int = 32
    use_attention: bool = True
    use_skip: bool = True
    latent_injection: LatentInjection = "all"
    # fused decoder blocks: identical math/params, no concat or z-broadcast
    # materialization (see DecoderBlock docstring); False = naive lowering
    fused_decoder: bool = True
    # Rematerialize decoder blocks in backward (nn.remat): trades recompute
    # FLOPs for HBM traffic — the step is bandwidth-bound at ~2.7x FLOP
    # headroom, so this can WIN time, not just memory (A/B in RESULTS.md).
    use_remat: bool = False
    # 'full': recompute everything in backward (max memory saving).
    # 'save_convs': save the conv/resize/gate products ('dec_save' names)
    # and recompute only BN/ReLU — cuts saved-activation HBM traffic
    # without re-running the MXU-heavy ops.
    remat_policy: str = "full"
    # Deep supervision (framework extension, off by default = reference
    # parity): 1x1 aux heads on decoder levels 0-2 whose logits are sown to
    # 'intermediates' for auxiliary losses at 1/16, 1/8, 1/4 resolution.
    # Standard from-scratch segmentation aid (nnU-Net practice) — shortens
    # the gradient path to the encoder that ImageNet pretraining would
    # otherwise warm-start.
    deep_supervision: bool = False
    # |logvar| cap applied at the head.  The reference clamps per-dim KL to
    # 100 (loss.py:158), which *zeroes the gradient* of runaway dimensions —
    # so logvar can drift to values where exp() overflows and sampling
    # returns inf/NaN at inference (observed on real IDRiD training).  A cap
    # of 30 (std up to e^15) never binds for healthy posteriors but keeps
    # sampling finite.  Set to None for strict reference behavior.
    logvar_clamp: Optional[float] = 30.0

    def setup(self):
        use_latent, use_bottleneck, should_sample = resolve_injection(
            self.latent_injection)
        self.use_bottleneck = use_bottleneck
        self.should_sample = should_sample

        self.encoder = ResNetEncoder(self.n_channels, backbone=self.backbone,
                                     use_remat=self.use_remat,
                                     remat_policy=self.remat_policy,
                                     name="encoder")
        enc_ch = self.encoder.feature_channels  # resnet34: [64,64,128,256,512]

        dot = self.fused_decoder
        self.mu_conv = Conv(self.latent_dim, kernel_size=1, name="mu_conv",
                            use_dot_1x1=dot)
        self.logvar_conv = Conv(self.latent_dim, kernel_size=1,
                                name="logvar_conv", use_dot_1x1=dot)

        # bottleneck projection width = encoder bottleneck channels
        # (512 for resnet34, reproducing unet_resnet.py:150-154 exactly;
        # scales to 2048 for bottleneck backbones)
        bott = enc_ch[-1]
        self.z_initial_conv = Conv(bott, kernel_size=1, name="z_initial_conv",
                                   use_dot_1x1=self.fused_decoder)
        self.z_initial_bn = BatchNorm(bott, name="z_initial_bn")

        plans = [  # (in_ch, skip_ch, out_ch) per unet_resnet.py:181-186
            (bott, enc_ch[-2], 512),
            (512, enc_ch[-3], 256),
            (256, enc_ch[-4], 128),
            (128, enc_ch[0], 64),
        ]
        save_names = self.use_remat and self.remat_policy == "save_convs"
        if self.use_remat:
            policy = (jax.checkpoint_policies.save_only_these_names("remat_save")
                      if save_names else None)
            DB = nn.remat(DecoderBlock, static_argnums=(4,), policy=policy)
        else:
            DB = DecoderBlock
        self.decoder_blocks = [
            DB(in_ch, out_ch, self.latent_dim,
               use_attention=self.use_attention and self.use_skip,
               use_skip=self.use_skip,
               use_latent=use_latent[i],
               skip_channels=skip_ch,
               fused=self.fused_decoder,
               save_names=save_names,
               name=f"decoder_{i}")
            for i, (in_ch, skip_ch, out_ch) in enumerate(plans)
        ]
        self.final_conv = Conv(self.n_classes, kernel_size=1,
                               name="final_conv",
                               use_dot_1x1=self.fused_decoder)
        if self.deep_supervision:
            self.ds_heads = [Conv(self.n_classes, kernel_size=1,
                                  name=f"ds_head_{i}",
                                  use_dot_1x1=self.fused_decoder)
                             for i in range(3)]

    # ----- pieces -------------------------------------------------------

    def _clamp_logvar(self, logvar):
        if self.logvar_clamp is not None:
            return jnp.clip(logvar, -self.logvar_clamp, self.logvar_clamp)
        return logvar

    def encode(self, x, train: bool = False) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """-> (mu, logvar), each [B, latent_dim].  (unet_resnet.py:242-248)"""
        features = self.encoder(x, train=train)
        x_enc = features[-1]
        mu = avg_pool_global(self.mu_conv(x_enc))
        logvar = self._clamp_logvar(avg_pool_global(self.logvar_conv(x_enc)))
        return mu, logvar

    def encode_with_features(self, x, train: bool = False):
        features = self.encoder(x, train=train)
        x_enc = features[-1]
        mu = avg_pool_global(self.mu_conv(x_enc))
        logvar = self._clamp_logvar(avg_pool_global(self.logvar_conv(x_enc)))
        return mu, logvar, features

    def reparameterize(self, mu, logvar, rng, temperature: float = 1.0):
        """z = mu + eps * std * T.  (unet_resnet.py:191-194, vae_utils.py:5-10)

        eps comes from `ops.sampling.gaussian_like`: the in-kernel TPU
        hardware PRNG on the TPU backend (the reference's cuRAND
        ``torch.randn_like`` counterpart, unet_resnet.py:193), jax.random
        elsewhere.  The noise op has no differentiable inputs, so the
        mu/logvar arithmetic stays an ordinary XLA-fused, differentiable
        expression inside the training step."""
        from vaeunet_tpu.ops.sampling import gaussian_like
        std = jnp.exp(0.5 * logvar)
        eps = gaussian_like(rng, std.shape, std.dtype)
        return mu + eps * std * temperature

    def decode_features(self, z, features: Sequence[jnp.ndarray],
                        output_hw: Optional[Tuple[int, int]] = None,
                        train: bool = False):
        """Decoder from a latent z and precomputed encoder features.

        This is the body shared by forward / the N-sample ensemble
        (vae_utils.py:45-67); vmap over the z axis for ensembles.
        """
        bottleneck = features[-1]
        bhw = bottleneck.shape[1:3]
        if self.use_bottleneck:
            z_sp = broadcast_latent_spatial(z, bhw)
            x = nn.relu(self.z_initial_bn(self.z_initial_conv(z_sp),
                                          use_running_average=not train))
        else:
            x = bottleneck
        for i, block in enumerate(self.decoder_blocks):
            skip = features[-(i + 2)] if (i < len(features) - 1 and self.use_skip) else None
            x = block(x, skip, z, train)
            if self.deep_supervision and i < 3:
                # sow-only: dead code (XLA DCE) unless the caller requests
                # 'intermediates' — inference paths pay nothing
                self.sow("intermediates", f"ds_logits_{i}",
                         self.ds_heads[i](x))
        logits = self.final_conv(x)
        if output_hw is not None and tuple(output_hw) != tuple(logits.shape[1:3]):
            logits = resize_bilinear(logits, output_hw, align_corners=True)
        return logits

    # ----- forward ------------------------------------------------------

    def __call__(self, x, train: bool = False, sample: Optional[bool] = None):
        """-> (logits, mu, logvar).  (unet_resnet.py:196-240)

        `sample=None` follows the injection strategy (sampling unless the
        strategy is 'none'/'inject_no_bottleneck'); pass sample=False for a
        deterministic z=mu forward (the parity path).
        """
        input_hw = x.shape[1:3]
        mu, logvar, features = self.encode_with_features(x, train=train)
        do_sample = self.should_sample if sample is None else sample
        if do_sample:
            rng = self.make_rng("latent")
            z = self.reparameterize(mu, logvar, rng)
        else:
            z = mu
        logits = self.decode_features(z, features, output_hw=input_hw, train=train)
        return logits, mu, logvar

    def decode(self, z, input_size: Optional[Tuple[int, int]] = None,
               probe_hw: Tuple[int, int] = (512, 512), train: bool = False):
        """Standalone decode matching unet_resnet.py:250-279: runs the encoder
        on a zero image to obtain skip shapes (reference behavior, kept for
        API parity)."""
        zeros = jnp.zeros((z.shape[0], probe_hw[0], probe_hw[1], self.n_channels),
                          z.dtype)
        features = self.encoder(zeros, train=False)
        if not self.use_bottleneck:
            features = list(features)
            features[-1] = jnp.zeros_like(features[-1])
        return self.decode_features(z, features, output_hw=input_size, train=train)
