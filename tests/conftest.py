"""Test harness config: run everything on a virtual 8-device CPU mesh so
sharding tests exercise real collectives without TPU hardware.

Note: this image's sitecustomize imports jax and registers the axon TPU
backend at interpreter start, overriding JAX_PLATFORMS.  We therefore force
the platform through jax.config here (set OFDM_SYNC_TEST_TPU=1 to run the
suite against the real chip instead).
"""

import os

_USE_TPU = os.environ.get("OFDM_SYNC_TEST_TPU", "0") == "1"

if not _USE_TPU:
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        flags = (flags + " --xla_force_host_platform_device_count=8").strip()
    # the quick gate is XLA-CPU-COMPILE-bound (interpret-mode Pallas graphs
    # compile in seconds and execute in ~0.1 s); optimization level 0 cuts
    # the compile ~36% and only slows the trivial execution.  Both sides of
    # every equality assertion run under the same flags.
    if "xla_backend_optimization_level" not in flags:
        flags += " --xla_backend_optimization_level=0"
    os.environ["XLA_FLAGS"] = flags
    # persistent XLA compile cache: the gate is compile-bound, and the CPU
    # executables serialize compactly (~100 KB/program).  The warm cache is
    # COMMITTED (tests/.jax_cache) so the quick gate runs warm out of the
    # box on this image; a key miss (different XLA build/CPU) just
    # recompiles -- correctness never depends on the cache.  Cold gate
    # ~480 s, warm ~measured in PARITY.md.
    # (set below via jax.config -- sitecustomize imports jax before this
    # file runs, so the env vars alone are ignored)

import jax  # noqa: E402

if not _USE_TPU:
    jax.config.update("jax_platforms", "cpu")
    jax.config.update(
        "jax_compilation_cache_dir",
        os.environ.get(
            "JAX_COMPILATION_CACHE_DIR",
            os.path.join(os.path.dirname(__file__), ".jax_cache"),
        ),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.25)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "parity: end-to-end numeric parity tests vs the reference"
    )


@pytest.fixture
def rng():
    return np.random.default_rng(0)


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_per_module():
    """Drop jit/trace caches between test FILES: accumulated compiled
    programs inflate later compiles ~3-5x on this single-core image
    (measured: test_pallas_minn.py quick tests run 84 s alone but ~245 s
    late in the full suite).  Shapes rarely repeat across files, so the
    recompiles this forces are ones the suite paid anyway."""
    yield
    if os.environ.get("OFDM_TEST_NO_CACHE_CLEAR", "0") != "1":
        jax.clear_caches()
