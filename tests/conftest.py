"""Test harness setup.

Tests run on CPU with 8 virtual devices so multi-chip sharding paths can be
validated without TPU hardware, and with x64 enabled so numeric parity
against float64 oracles (scipy / torch CPU, mirroring the reference's
float64-on-CPU default, reference config.py:179-180) is meaningful.

Environment must be set before JAX is imported by any test module.
"""
import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The sandbox's sitecustomize force-registers the axon TPU plugin and sets
# jax_platforms="axon,cpu"; initializing it costs a ~3 min tunnel handshake.
# Tests are CPU-only — override the *config* (the env var alone is ignored).
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
# Single-core sandboxes make XLA compiles the dominant test cost; cache them.
# Separate cache per platform: AOT CPU results from another process (e.g. the
# TPU bench, which detects different host features) must not be loaded here.
jax.config.update(
    "jax_compilation_cache_dir", os.path.expanduser("~/.cache/jax_dctpu_cpu")
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.3)


def pytest_addoption(parser):
    parser.addoption(
        "--slow",
        action="store_true",
        default=False,
        help="run the slow tier too (full coverage; used by CI/nightly)",
    )


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "slow: >60 s guard/scale tests — skipped by default; run the full "
        "tier with `pytest --slow` (or DC_SLOW_TESTS=1)",
    )


def pytest_collection_modifyitems(config, items):
    import pytest

    if config.getoption("--slow") or os.environ.get("DC_SLOW_TESTS"):
        return
    skip = pytest.mark.skip(reason="slow tier: run with --slow")
    for item in items:
        if "slow" in item.keywords:
            item.add_marker(skip)
