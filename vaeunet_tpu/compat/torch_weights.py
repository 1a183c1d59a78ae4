"""PyTorch -> flax weight conversion for reference checkpoints.

Lets a user of the reference load their trained ``.pth`` checkpoints
(train.py:542-565 format: dict with 'model_state_dict', 'params', ...)
directly into this framework.  Pure numpy — torch is only imported lazily for
unpickling ``.pth`` files.

Layout conventions:
- conv weights:            OIHW -> HWIO        (transpose 2,3,1,0)
- conv-transpose weights:  (in,out,kh,kw) -> (kh,kw,out,in), consumed by
                           ``lax.conv_transpose(..., transpose_kernel=True)``
- BatchNorm:   weight->scale, bias->bias (params collection);
               running_mean->mean, running_var->var (batch_stats collection)

Naming maps mirror the reference modules:
- plain UNet:   unet/unet_model.py:6-48 + unet/unet_parts.py
- UNetResNet:   unet/unet_resnet.py:103-189 (timm resnet34 encoder keys)
"""

from __future__ import annotations

from typing import Any, Dict, Mapping, Tuple

import numpy as np


def _np(t) -> np.ndarray:
    if isinstance(t, np.ndarray):
        return t
    return t.detach().cpu().numpy()  # torch tensor


def _conv(sd: Mapping[str, Any], key: str) -> np.ndarray:
    return _np(sd[key]).transpose(2, 3, 1, 0)  # OIHW -> HWIO


def _conv_t(sd: Mapping[str, Any], key: str) -> np.ndarray:
    return _np(sd[key]).transpose(2, 3, 1, 0)  # (in,out,kh,kw) -> (kh,kw,out,in)


def _set(tree: Dict, path: Tuple[str, ...], value: np.ndarray):
    node = tree
    for p in path[:-1]:
        node = node.setdefault(p, {})
    node[path[-1]] = np.asarray(value, np.float32)


def _bn(params: Dict, stats: Dict, sd, torch_prefix: str, flax_path: Tuple[str, ...]):
    _set(params, flax_path + ("scale",), _np(sd[f"{torch_prefix}.weight"]))
    _set(params, flax_path + ("bias",), _np(sd[f"{torch_prefix}.bias"]))
    _set(stats, flax_path + ("mean",), _np(sd[f"{torch_prefix}.running_mean"]))
    _set(stats, flax_path + ("var",), _np(sd[f"{torch_prefix}.running_var"]))


def _conv_with_bias(params: Dict, sd, torch_prefix: str, flax_path: Tuple[str, ...],
                    transpose_conv: bool = False):
    w = (_conv_t if transpose_conv else _conv)(sd, f"{torch_prefix}.weight")
    _set(params, flax_path + ("kernel",), w)
    bkey = f"{torch_prefix}.bias"
    if bkey in sd:
        _set(params, flax_path + ("bias",), _np(sd[bkey]))


def _double_conv(params, stats, sd, tp: str, fp: Tuple[str, ...]):
    """torch Sequential [conv,bn,relu,conv,bn,relu] -> our DoubleConv."""
    _conv_with_bias(params, sd, f"{tp}.0", fp + ("conv1",))
    _bn(params, stats, sd, f"{tp}.1", fp + ("bn1",))
    _conv_with_bias(params, sd, f"{tp}.3", fp + ("conv2",))
    _bn(params, stats, sd, f"{tp}.4", fp + ("bn2",))


def _attention_gate(params, stats, sd, tp: str, fp: Tuple[str, ...]):
    _conv_with_bias(params, sd, f"{tp}.W_g.0", fp + ("W_g_conv",))
    _bn(params, stats, sd, f"{tp}.W_g.1", fp + ("W_g_bn",))
    _conv_with_bias(params, sd, f"{tp}.W_x.0", fp + ("W_x_conv",))
    _bn(params, stats, sd, f"{tp}.W_x.1", fp + ("W_x_bn",))
    _conv_with_bias(params, sd, f"{tp}.psi.0", fp + ("psi_conv",))
    _bn(params, stats, sd, f"{tp}.psi.1", fp + ("psi_bn",))


def convert_unet_state_dict(sd: Mapping[str, Any], bilinear: bool = False) -> Dict:
    """Reference plain-UNet state_dict -> {'params': ..., 'batch_stats': ...}."""
    params: Dict = {}
    stats: Dict = {}
    _double_conv(params, stats, sd, "inc.double_conv", ("inc",))
    for i in range(1, 5):
        _double_conv(params, stats, sd, f"down{i}.maxpool_conv.1.double_conv",
                     (f"down{i}", "conv"))
    for i in range(1, 5):
        tp = f"up{i}"
        if not bilinear:
            _conv_with_bias(params, sd, f"{tp}.up", (tp, "up"), transpose_conv=True)
        _attention_gate(params, stats, sd, f"{tp}.attention", (tp, "attention"))
        _double_conv(params, stats, sd, f"{tp}.conv.double_conv", (tp, "conv"))
    _conv_with_bias(params, sd, "outc.conv", ("outc", "conv"))
    return {"params": params, "batch_stats": stats}


def _resnet_encoder(params, stats, sd, tp: str, fp: Tuple[str, ...],
                    stage_sizes=(3, 4, 6, 3)):
    """timm/torchvision resnet34 keys -> ResNet34Encoder."""
    _conv_with_bias(params, sd, f"{tp}conv1", fp + ("conv1",))
    _bn(params, stats, sd, f"{tp}bn1", fp + ("bn1",))
    for si, n_blocks in enumerate(stage_sizes):
        for bi in range(n_blocks):
            bt = f"{tp}layer{si + 1}.{bi}"
            bf = fp + (f"layer{si + 1}_{bi}",)
            _conv_with_bias(params, sd, f"{bt}.conv1", bf + ("conv1",))
            _bn(params, stats, sd, f"{bt}.bn1", bf + ("bn1",))
            _conv_with_bias(params, sd, f"{bt}.conv2", bf + ("conv2",))
            _bn(params, stats, sd, f"{bt}.bn2", bf + ("bn2",))
            if f"{bt}.downsample.0.weight" in sd:
                _conv_with_bias(params, sd, f"{bt}.downsample.0",
                                bf + ("downsample_conv",))
                _bn(params, stats, sd, f"{bt}.downsample.1",
                    bf + ("downsample_bn",))


def convert_unet_resnet_state_dict(sd: Mapping[str, Any]) -> Dict:
    """Reference UNetResNet state_dict -> flax variables for
    vaeunet_tpu.models.UNetResNet."""
    params: Dict = {}
    stats: Dict = {}
    _resnet_encoder(params, stats, sd, "encoder.", ("encoder",))
    _conv_with_bias(params, sd, "mu_head.0", ("mu_conv",))
    _conv_with_bias(params, sd, "logvar_head.0", ("logvar_conv",))
    _conv_with_bias(params, sd, "z_initial.0", ("z_initial_conv",))
    _bn(params, stats, sd, "z_initial.1", ("z_initial_bn",))
    for i in range(4):
        tp = f"decoder_blocks.{i}"
        fp = (f"decoder_{i}",)
        if f"{tp}.z_proj.0.weight" in sd:
            _conv_with_bias(params, sd, f"{tp}.z_proj.0", fp + ("z_proj_conv",))
            _bn(params, stats, sd, f"{tp}.z_proj.1", fp + ("z_proj_bn",))
        if f"{tp}.attention.W_g.0.weight" in sd:
            _attention_gate(params, stats, sd, f"{tp}.attention", fp + ("attention",))
        for ci in (1, 2):
            _conv_with_bias(params, sd, f"{tp}.conv{ci}.0", fp + (f"conv{ci}",))
            _bn(params, stats, sd, f"{tp}.conv{ci}.1", fp + (f"bn{ci}",))
    _conv_with_bias(params, sd, "final_conv", ("final_conv",))
    return {"params": params, "batch_stats": stats}


def convert_resnet34_backbone(sd: Mapping[str, Any]) -> Dict:
    """torchvision/timm resnet34 (classification) state_dict -> flax variables
    for a standalone ResNet34Encoder (pretrained-backbone import)."""
    params: Dict = {}
    stats: Dict = {}
    _resnet_encoder(params, stats, sd, "", ())
    return {"params": params, "batch_stats": stats}


def load_reference_checkpoint(path: str):
    """Load a reference ``.pth`` training checkpoint (train.py:542-565) and
    return (flax_variables, params_dict_metadata)."""
    import torch  # lazy; torch-cpu is only needed for unpickling

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    if "model_state_dict" in ckpt:
        sd = ckpt["model_state_dict"]
        meta = ckpt.get("params", {})
    else:
        sd, meta = ckpt, {}
    sd = {k: v for k, v in sd.items() if k != "mask_values"}
    if any(k.startswith("encoder.") for k in sd):
        return convert_unet_resnet_state_dict(sd), meta
    return convert_unet_state_dict(
        sd, bilinear=not any(".up.weight" in k for k in sd)), meta
