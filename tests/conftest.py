"""Test harness configuration.

Forces the CPU backend with 8 virtual host devices so multi-chip sharding
paths (mesh + collectives) are exercised without TPU hardware -- the pattern
recommended for JAX distributed testing.  Must run before jax is imported
anywhere in the test process.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_ENABLE_X64"] = "1"

# The container's sitecustomize registers an out-of-process TPU plugin at
# interpreter start and pins JAX_PLATFORMS=axon; env vars alone are read too
# early to win.  config.update after import reliably forces the CPU backend
# (and is a no-op in environments without the plugin).
import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

# Persistent compile cache: this box has ONE cpu core, so XLA compilation
# dominates suite wall time; cache hits cut a heavy test's first step from
# ~63 s to ~9 s.  The cache holds machine code -- keyed per machine via
# /tmp, safe for same-box reruns (the "+prefer-no-scatter feature"
# warnings on load are an XLA bookkeeping artifact, not a real mismatch).
_cache_dir = os.environ.get("CLIMSIM_TEST_COMPILE_CACHE",
                            "/tmp/climsim_jax_test_cache")
os.makedirs(_cache_dir, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", _cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np
import pytest


@pytest.fixture(scope="session")
def grid384():
    from climsim_tpu.grid import load_default_grid

    return load_default_grid()


@pytest.fixture(scope="session")
def tiny_grid():
    from climsim_tpu.grid import synthetic_grid

    return synthetic_grid(ncol=16)


@pytest.fixture()
def rng():
    return np.random.default_rng(0)


def _ensure_native_built():
    """Build the C++ loader + C coupling client if the toolchain is
    available."""
    import subprocess

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    so = os.path.join(root, "climsim_tpu", "data", "libclimload.so")
    client = os.path.join(root, "runtime", "climclient")
    src = os.path.join(root, "runtime")
    if (not (os.path.exists(so) and os.path.exists(client))
            and os.path.isdir(src)):
        try:
            subprocess.run(["make", "-C", src], check=True,
                           capture_output=True, timeout=120)
        except Exception:
            pass  # tests depending on the artifacts will skip


_ensure_native_built()

# CI guard: with CLIMSIM_REQUIRE_REFERENCE set, a missing oracle tree is
# a hard error, never a silent skip of the golden-parity suites
# (.github/workflows/test.yaml fetches leap-stc/ClimSim and sets this).
_ref_root = os.environ.get("CLIMSIM_REFERENCE", "/root/reference")
if (os.environ.get("CLIMSIM_REQUIRE_REFERENCE")
        and not os.path.isfile(os.path.join(
            _ref_root, "climsim_utils", "data_utils.py"))):
    raise RuntimeError(
        "CLIMSIM_REQUIRE_REFERENCE is set but the oracle tree is missing "
        f"at {_ref_root} (set CLIMSIM_REFERENCE to the ClimSim checkout)")
