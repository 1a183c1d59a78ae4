#!/usr/bin/env python
"""Micro-benchmarks: Pallas kernels vs their XLA lowerings on real TPU.

SURVEY.md section 7-6 mandates benchmarking each fused kernel against the
XLA baseline and keeping only wins.  Emits one JSON line per comparison.
Host-fetch synced (tunneled backend; see .claude/skills/verify/SKILL.md).
"""

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import jax
import jax.numpy as jnp
import numpy as np


def timed(fn, *args, iters=30):
    out = fn(*args)
    float(jnp.asarray(jax.tree.leaves(out)[0]).ravel()[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    float(jnp.asarray(jax.tree.leaves(out)[0]).ravel()[0])
    return (time.perf_counter() - t0) / iters


def bench_bn_relu():
    from vaeunet_tpu.ops.pallas.bn_relu import fused_bn_relu

    shape = (16, 128, 128, 128)
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(*shape).astype(np.float32))
    c = shape[-1]
    scale = jnp.asarray(rng.rand(c).astype(np.float32) + 0.5)
    bias = jnp.asarray(rng.randn(c).astype(np.float32))
    mean = jnp.asarray(rng.randn(c).astype(np.float32))
    var = jnp.asarray(rng.rand(c).astype(np.float32) + 0.5)

    xla = jax.jit(lambda x: jnp.maximum(
        (x - mean) * jax.lax.rsqrt(var + 1e-5) * scale + bias, 0.0))
    t_xla = timed(xla, x)
    t_pl = timed(lambda x: fused_bn_relu(x, scale, bias, mean, var), x)
    print(json.dumps({"kernel": "bn_relu", "shape": list(shape),
                      "pallas_ms": round(t_pl * 1e3, 3),
                      "xla_ms": round(t_xla * 1e3, 3),
                      "speedup": round(t_xla / t_pl, 2)}))


def bench_reparam():
    from vaeunet_tpu.ops.pallas.reparam import reparameterize_pallas

    b, d = 4096, 128
    mu = jax.random.normal(jax.random.PRNGKey(0), (b, d))
    logvar = jax.random.normal(jax.random.PRNGKey(1), (b, d)) * 0.1

    def xla_version(mu, logvar, key):
        eps = jax.random.normal(key, mu.shape)
        return mu + eps * jnp.exp(0.5 * logvar)

    xla = jax.jit(xla_version)
    t_xla = timed(xla, mu, logvar, jax.random.PRNGKey(2))
    t_pl = timed(lambda m, l: reparameterize_pallas(m, l, 7), mu, logvar)
    print(json.dumps({"kernel": "reparameterize", "shape": [b, d],
                      "pallas_ms": round(t_pl * 1e3, 3),
                      "xla_ms": round(t_xla * 1e3, 3),
                      "speedup": round(t_xla / t_pl, 2)}))


if __name__ == "__main__":
    bench_bn_relu()
    bench_reparam()
