"""Global switch for the fused conv3x3+BN-statistics training path.

When enabled, 3x3 stride-1 bias-free convolutions that feed a training-mode
BatchNorm run through the Pallas ``conv3x3_bn_stats`` kernel, which emits the
per-channel sum/sumsq moments from the conv epilogue while the output tile is
still in VMEM — saving the separate full-tensor HBM sweep XLA otherwise emits
for the BN statistics (profiled at ~30% of step time, RESULTS.md).

Benchmark verdict (RESULTS.md round 2): the kernel wins its micro-benchmark
at the 64-channel decoder shape (1.57x) but LOSES end-to-end (169 vs 208
img/s at 512^2 b16) — the halo pre-pad is an extra full HBM copy of the
input and the opaque pallas_call blocks XLA's surrounding fusions.  Policy
is "keep only wins" (SURVEY.md section 7-6), so the default is OFF
everywhere; the kernel stays available for experimentation via
``set_fused_conv_bn(True)`` or ``VAEUNET_FUSED_CONV_BN=1``.
"""

from __future__ import annotations

import os
from typing import Optional

_override: Optional[bool] = None


def set_fused_conv_bn(enabled: Optional[bool]) -> None:
    """Force the fused path on/off; ``None`` restores the default policy."""
    global _override
    _override = enabled


def fused_conv_bn_enabled() -> bool:
    if _override is not None:
        return _override
    env = os.environ.get("VAEUNET_FUSED_CONV_BN")
    if env is not None:
        return env not in ("0", "false", "False")
    return False
