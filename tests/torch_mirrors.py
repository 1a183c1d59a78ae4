"""Torch mirrors of reference modules that cannot be imported directly
(unet/unet_resnet.py depends on timm, which is not installed).

These are *test fixtures*: independent torch implementations of the
architecture spec in SURVEY.md section 2 / the reference docstrings, used only
to produce golden outputs for parity tests.  Key naming matches the reference
checkpoints so ``vaeunet_tpu.compat.torch_weights`` converts them directly.
"""

import torch
import torch.nn as nn
import torch.nn.functional as F


class BasicBlockT(nn.Module):
    def __init__(self, cin, cout, stride=1):
        super().__init__()
        self.conv1 = nn.Conv2d(cin, cout, 3, stride=stride, padding=1, bias=False)
        self.bn1 = nn.BatchNorm2d(cout)
        self.conv2 = nn.Conv2d(cout, cout, 3, padding=1, bias=False)
        self.bn2 = nn.BatchNorm2d(cout)
        self.downsample = None
        if stride != 1 or cin != cout:
            self.downsample = nn.Sequential(
                nn.Conv2d(cin, cout, 1, stride=stride, bias=False),
                nn.BatchNorm2d(cout),
            )

    def forward(self, x):
        idt = x if self.downsample is None else self.downsample(x)
        y = F.relu(self.bn1(self.conv1(x)))
        y = self.bn2(self.conv2(y))
        return F.relu(y + idt)


class ResNet34FeaturesT(nn.Module):
    """resnet34 features_only equivalent: returns 5 feature maps at strides
    2/4/8/16/32 with channels 64/64/128/256/512 (what timm hands the
    reference at unet_resnet.py:131-137)."""

    def __init__(self, in_chans=3):
        super().__init__()
        self.conv1 = nn.Conv2d(in_chans, 64, 7, stride=2, padding=3, bias=False)
        self.bn1 = nn.BatchNorm2d(64)
        self.maxpool = nn.MaxPool2d(3, stride=2, padding=1)

        def stage(cin, cout, n, stride):
            blocks = [BasicBlockT(cin, cout, stride)]
            blocks += [BasicBlockT(cout, cout) for _ in range(n - 1)]
            return nn.Sequential(*blocks)

        self.layer1 = stage(64, 64, 3, 1)
        self.layer2 = stage(64, 128, 4, 2)
        self.layer3 = stage(128, 256, 6, 2)
        self.layer4 = stage(256, 512, 3, 2)

    def forward(self, x):
        feats = []
        x = F.relu(self.bn1(self.conv1(x)))
        feats.append(x)
        x = self.maxpool(x)
        for layer in (self.layer1, self.layer2, self.layer3, self.layer4):
            x = layer(x)
            feats.append(x)
        return feats


class AttentionGateT(nn.Module):
    """Additive attention gate (reference unet_resnet.py:6-29)."""

    def __init__(self, f_g, f_l, f_int):
        super().__init__()
        self.W_g = nn.Sequential(nn.Conv2d(f_g, f_int, 1), nn.BatchNorm2d(f_int))
        self.W_x = nn.Sequential(nn.Conv2d(f_l, f_int, 1), nn.BatchNorm2d(f_int))
        self.psi = nn.Sequential(nn.Conv2d(f_int, 1, 1), nn.BatchNorm2d(1),
                                 nn.Sigmoid())

    def forward(self, g, x):
        psi = F.relu(self.W_g(g) + self.W_x(x))
        return x * self.psi(psi)


class DecoderBlockT(nn.Module):
    """Reference DecoderBlock semantics (unet_resnet.py:31-101)."""

    def __init__(self, cin, cskip, cout, latent_dim,
                 use_attention=True, use_skip=True, use_latent=True):
        super().__init__()
        self.use_latent = use_latent
        self.use_skip = use_skip
        self.use_attention = use_attention and use_skip
        if use_latent:
            self.z_proj = nn.Sequential(nn.Conv2d(latent_dim, latent_dim, 1),
                                        nn.BatchNorm2d(latent_dim),
                                        nn.ReLU(inplace=True))
        if self.use_attention:
            self.attention = AttentionGateT(cin, cskip, cin // 4)
        c_in_total = cin + (cskip if use_skip else 0) + (latent_dim if use_latent else 0)
        self.conv1 = nn.Sequential(
            nn.Conv2d(c_in_total, cout, 3, padding=1, bias=False),
            nn.BatchNorm2d(cout), nn.ReLU(inplace=True))
        self.conv2 = nn.Sequential(
            nn.Conv2d(cout, cout, 3, padding=1, bias=False),
            nn.BatchNorm2d(cout), nn.ReLU(inplace=True))

    def forward(self, x, skip, z):
        size = skip.shape[2:] if skip is not None else (x.shape[2] * 2, x.shape[3] * 2)
        x = F.interpolate(x, size=size, mode="bilinear", align_corners=True)
        comps = [x]
        if skip is not None and self.use_skip:
            if self.use_attention:
                skip = self.attention(x, skip)
            comps.append(skip)
        if self.use_latent:
            zp = F.interpolate(z, size=size, mode="bilinear", align_corners=True)
            comps.append(self.z_proj(zp))
        y = torch.cat(comps, dim=1)
        return self.conv2(self.conv1(y))


class UNetResNetT(nn.Module):
    """Reference UNetResNet semantics (unet_resnet.py:103-279), deterministic
    z=mu variant for parity (sampling is RNG-incompatible across backends)."""

    def __init__(self, n_channels=3, n_classes=1, latent_dim=32,
                 use_attention=True, use_skip=True, latent_injection="all"):
        super().__init__()
        self.latent_injection = latent_injection
        self.use_skip = use_skip
        if isinstance(latent_injection, (list, tuple)):
            use_latent = [i in tuple(latent_injection) for i in range(4)]
        elif latent_injection in ("all", "inject_no_bottleneck"):
            use_latent = [True] * 4
        elif latent_injection == "first":
            use_latent = [True, False, False, False]
        elif latent_injection == "last":
            use_latent = [False, False, False, True]
        elif latent_injection in ("bottleneck", "none"):
            use_latent = [False] * 4
        else:
            use_latent = [True] * 4
        self.use_bottleneck = latent_injection not in ("none", "inject_no_bottleneck")

        self.encoder = ResNet34FeaturesT(n_channels)
        enc_ch = [64, 64, 128, 256, 512]
        self.mu_head = nn.Sequential(nn.Conv2d(enc_ch[-1], latent_dim, 1),
                                     nn.AdaptiveAvgPool2d(1))
        self.logvar_head = nn.Sequential(nn.Conv2d(enc_ch[-1], latent_dim, 1),
                                         nn.AdaptiveAvgPool2d(1))
        self.z_initial = nn.Sequential(nn.Conv2d(latent_dim, 512, 1),
                                       nn.BatchNorm2d(512), nn.ReLU(inplace=True))
        self.decoder_blocks = nn.ModuleList([
            DecoderBlockT(512, enc_ch[-2], 512, latent_dim, use_attention,
                          use_skip, use_latent[0]),
            DecoderBlockT(512, enc_ch[-3], 256, latent_dim, use_attention,
                          use_skip, use_latent[1]),
            DecoderBlockT(256, enc_ch[-4], 128, latent_dim, use_attention,
                          use_skip, use_latent[2]),
            DecoderBlockT(128, enc_ch[0], 64, latent_dim, use_attention,
                          use_skip, use_latent[3]),
        ])
        self.final_conv = nn.Conv2d(64, n_classes, 1)

    def forward(self, x):
        input_size = x.shape[2:]
        features = self.encoder(x)
        x_enc = features[-1]
        mu = self.mu_head(x_enc).squeeze(-1).squeeze(-1)
        logvar = self.logvar_head(x_enc).squeeze(-1).squeeze(-1)
        z = mu  # deterministic parity path
        z = z.unsqueeze(-1).unsqueeze(-1)
        initial_size = features[-1].shape[2:]
        z_spatial = F.interpolate(z, size=initial_size, mode="bilinear",
                                  align_corners=True)
        if self.use_bottleneck:
            y = self.z_initial(z_spatial)
        else:
            y = features[-1]
        for i, block in enumerate(self.decoder_blocks):
            skip = features[-(i + 2)] if i < len(features) - 1 and self.use_skip else None
            y = block(y, skip, z_spatial)
        out = self.final_conv(y)
        out = F.interpolate(out, size=input_size, mode="bilinear",
                            align_corners=True)
        return out, mu, logvar
