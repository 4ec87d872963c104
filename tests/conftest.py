"""Test configuration: run JAX on a virtual 8-device CPU mesh.

Multi-chip TPU hardware is not available in CI; sharding correctness is
validated on ``xla_force_host_platform_device_count=8`` CPU devices exactly
as the driver's dryrun does. Must run before jax is imported anywhere.
"""

import os

# The environment pins JAX_PLATFORMS=axon (tunneled TPU) via sitecustomize;
# tests must run on a local virtual CPU mesh, so override forcefully —
# env vars alone are not enough (the plugin re-registers itself).
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)  # FLAC/MP3 int64 fixed-point paths

import subprocess
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent


_ORACLE_AVAILABLE = None


@pytest.fixture(scope="session")
def oracle():
    """The reference esp-audio-libs compiled as a host shared library.

    Skips (rather than errors) when the reference source tree isn't present
    — CI runners check out only this repo; the differential suites then run
    wherever the reference is mounted (see README)."""
    if not _ORACLE_AVAILABLE:
        pytest.skip("reference source not available: differential oracle tests skipped")
    from . import oracle as oracle_mod

    return oracle_mod.load()


def pytest_configure(config):
    # Build the oracle once up front so individual tests never race.
    global _ORACLE_AVAILABLE
    import os as _os

    ref = Path(_os.environ.get("REF", "/root/reference"))
    _ORACLE_AVAILABLE = (ref / "src").is_dir()
    if _ORACLE_AVAILABLE:
        subprocess.run([str(REPO / "native" / "oracle" / "build_oracle.sh")], check=True, capture_output=True)
