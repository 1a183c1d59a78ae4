"""Test configuration: force the CPU backend with 8 virtual devices.

Must run before any jax import in the test session.  The axon TPU plugin
ignores the JAX_PLATFORMS env var, so we also set the config flag explicitly.
"""

import os
import sys
from pathlib import Path

# Hard-set (not setdefault): the session environment may export
# JAX_PLATFORMS=axon globally, and anything downstream that re-reads the
# env var must see "cpu" — tests silently running on the tunneled TPU both
# fail parity (MXU bf16 matmul error ~3e-3) and hazard the axon tunnel.
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import pytest  # noqa: E402

REFERENCE_DIR = Path("/root/reference")


@pytest.fixture(scope="session")
def reference_path():
    """Path to the upstream reference snapshot (torch-only modules of it are
    importable for golden parity checks); skips if unavailable."""
    if not REFERENCE_DIR.exists():
        pytest.skip("reference snapshot not available")
    if str(REFERENCE_DIR) not in sys.path:
        sys.path.insert(0, str(REFERENCE_DIR))
    return REFERENCE_DIR


@pytest.fixture(scope="session")
def rng():
    return jax.random.PRNGKey(0)


def pytest_collection_modifyitems(items):
    """Enforce the tier invariant: nightly implies slow (ADVICE r4).

    The fast tier is selected with -m "not slow"; a nightly-marked test
    without the slow marker would silently join the every-push tier.
    Auto-adding slow keeps the three-tier split correct by construction.
    """
    for item in items:
        if (item.get_closest_marker("nightly")
                and not item.get_closest_marker("slow")):
            item.add_marker(pytest.mark.slow)
