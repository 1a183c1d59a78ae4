"""Profiling / memory observability.

Rebuild of the reference's memory instrumentation plus a real profiler the
reference lacks (SURVEY.md section 5, tracing row):

- track_memory       <- visualize_vae.py:22-46 (decorator logging host RSS
                        and device-memory deltas around a call)
- log_memory_usage   <- analyze_model.py:38-45
- trace(...)         -> jax.profiler trace contextmanager (TensorBoard/
                        Perfetto dumps)
- time_fn            -> wall-time with a host value fetch as the completion
                        barrier (the tunneled TPU backend's
                        block_until_ready returns early)
"""

from __future__ import annotations

import contextlib
import functools
import logging
import time
from typing import Callable, Optional

import jax
import numpy as np

log = logging.getLogger(__name__)


def _host_rss_mb() -> float:
    try:
        import psutil
        return psutil.Process().memory_info().rss / 1e6
    except ImportError:
        try:
            with open("/proc/self/status") as f:
                for line in f:
                    if line.startswith("VmRSS"):
                        return float(line.split()[1]) / 1e3
        except OSError:
            pass
        return float("nan")


def device_memory_mb(device=None) -> Optional[float]:
    """Live device memory (bytes_in_use) in MB, when the backend reports it."""
    try:
        dev = device or jax.local_devices()[0]
        stats = dev.memory_stats()
        if stats and "bytes_in_use" in stats:
            return stats["bytes_in_use"] / 1e6
    except Exception:
        pass
    return None


def log_memory_usage(prefix: str = ""):
    """(analyze_model.py:38-45)"""
    dev = device_memory_mb()
    dev_s = f", device {dev:.0f}MB" if dev is not None else ""
    log.info("%s host RSS %.0fMB%s", prefix, _host_rss_mb(), dev_s)


def track_memory(fn: Callable) -> Callable:
    """Decorator logging host/device memory deltas around `fn`.
    (visualize_vae.py:22-46)"""

    @functools.wraps(fn)
    def wrapper(*args, **kwargs):
        before_h, before_d = _host_rss_mb(), device_memory_mb()
        t0 = time.perf_counter()
        result = fn(*args, **kwargs)
        dt = time.perf_counter() - t0
        after_h, after_d = _host_rss_mb(), device_memory_mb()
        dev_s = ""
        if before_d is not None and after_d is not None:
            dev_s = f", device {before_d:.0f}->{after_d:.0f}MB"
        log.info("[%s] %.2fs, host RSS %.0f->%.0fMB%s",
                 fn.__name__, dt, before_h, after_h, dev_s)
        return result

    return wrapper


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/jax_trace"):
    """jax.profiler trace context: view with TensorBoard or Perfetto."""
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()
        log.info("profiler trace written to %s", log_dir)


def time_fn(fn: Callable, *args, iters: int = 10, warmup: int = 2,
            fetch=lambda out: np.asarray(jax.tree.leaves(out)[0]).ravel()[0],
            **kwargs) -> float:
    """Mean seconds per call, synced by fetching a value to the host."""
    for _ in range(warmup):
        out = fn(*args, **kwargs)
    fetch(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args, **kwargs)
    fetch(out)
    return (time.perf_counter() - t0) / iters
