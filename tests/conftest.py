"""Test configuration: run everything on a virtual 8-device CPU mesh."""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_test_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# The image's sitecustomize registers the axon TPU plugin and force-sets
# jax_platforms="axon,cpu" from inside register(), overriding the env
# var.  Re-override here: unit tests run on the virtual 8-device CPU
# mesh; only bench.py targets the real chip.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")


# ----------------------------------------------------------------------
# smoke tier: a <2-minute cross-section (this box is 1-core) for fast
# perf-iteration gating: `pytest -m smoke`.  Full suite stays the
# correctness gate.
SMOKE_MODULES = {
    "test_geom", "test_optim", "test_pallas_hamming", "test_mapstore",
    "test_io", "test_native", "test_matching",
}
SMOKE_EXCLUDE = {
    # compile-heavy single test (~24 s) — covered by the full suite
    "test_translation_recovered",
}


def pytest_collection_modifyitems(config, items):
    import pytest
    for item in items:
        if (item.module.__name__.rpartition(".")[2] in SMOKE_MODULES
                and item.name.split("[")[0] not in SMOKE_EXCLUDE):
            item.add_marker(pytest.mark.smoke)
