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
