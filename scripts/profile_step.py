#!/usr/bin/env python
"""Compile the headline train step (bench.py config) and attribute HBM bytes.

Prints:
- compiler cost analysis (flops / bytes accessed),
- the top relayout/copy ops in the optimized HLO by byte size,
- per-fusion byte totals grouped by the op_name metadata (model component),
and dumps the full optimized HLO to /tmp/step_hlo.txt for manual digging.

Run on the real TPU (no env overrides) AFTER confirming no other process is
attached (see .claude/skills/verify/SKILL.md wedge discipline).
"""

import re
import sys
from collections import defaultdict
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import jax
import jax.numpy as jnp

from vaeunet_tpu.training.config import TrainConfig
from vaeunet_tpu.training.state import create_train_state
from vaeunet_tpu.training.step import make_train_step

HW = 512
BATCH = 16

DT_BYTES = {"f32": 4, "bf16": 2, "f16": 2, "s32": 4, "u32": 4, "u8": 1,
            "s8": 1, "pred": 1, "u16": 2, "s16": 2, "f64": 8, "s64": 8,
            "u64": 8}


def tensor_bytes(dt: str, dims: str) -> int:
    n = 1
    for d in dims.split(","):
        if d:
            n *= int(d)
    return n * DT_BYTES.get(dt, 4)


def main():
    config = TrainConfig(model_type="resnet", batch_size=BATCH,
                         gradient_accumulation_steps=1, amp=True,
                         patch_size=HW, learning_rate=1e-4, seed=0)
    state = create_train_state(config, jax.random.PRNGKey(0), (HW, HW))
    step = make_train_step(config, jit=False)
    images = jnp.zeros((BATCH, HW, HW, 3), jnp.float32)
    masks = jnp.zeros((BATCH, HW, HW, 1), jnp.float32)
    lowered = jax.jit(step).lower(state, images, masks, jnp.float32(0.001))
    compiled = lowered.compile()

    ca = compiled.cost_analysis()
    if isinstance(ca, list):
        ca = ca[0]
    print(f"cost: {ca.get('flops', 0)/1e12:.2f} TFLOP, "
          f"{ca.get('bytes accessed', 0)/1e9:.2f} GB accessed")

    hlo = compiled.as_text()
    Path("/tmp/step_hlo.txt").write_text(hlo)
    print(f"HLO dumped: /tmp/step_hlo.txt ({len(hlo)/1e6:.1f} MB)")

    # ---- standalone copy/transpose ops (relayouts XLA could not elide) ----
    pat = re.compile(
        r"%?([\w.\-]+) = (\w+)\[([\d,]*)\]\{([^}]*)\}\s+(copy|transpose|"
        r"all-reduce|reshape)\(")
    ops = []
    for m in pat.finditer(hlo):
        name, dt, dims, layout, kind = m.groups()
        if kind == "reshape":
            continue  # bitcast-free reshapes are usually free
        ops.append((tensor_bytes(dt, dims), kind, dt, dims, layout, name))
    ops.sort(reverse=True)
    total = sum(o[0] for o in ops)
    print(f"\nstandalone copy/transpose ops: {len(ops)}, "
          f"{total/1e9:.3f} GB written")
    for b, kind, dt, dims, layout, name in ops[:25]:
        print(f"  {b/1e6:9.1f} MB  {kind:9s} {dt}[{dims}]{{{layout}}}  {name}")

    # ---- copies nested inside fusions, attributed by metadata op_name ----
    fus_pat = re.compile(
        r"(\w+)\[([\d,]*)\]\{[^}]*\} copy\([^)]*\), metadata={op_name=\"([^\"]*)\"")
    by_name = defaultdict(int)
    for m in fus_pat.finditer(hlo):
        dt, dims, op_name = m.groups()
        by_name[op_name] += tensor_bytes(dt, dims)
    if by_name:
        print("\nfused copies by op_name:")
        for name, b in sorted(by_name.items(), key=lambda kv: -kv[1])[:20]:
            print(f"  {b/1e6:9.1f} MB  {name[:110]}")


if __name__ == "__main__":
    main()
