import os

# Tests run on a virtual 8-device CPU mesh (the JAX-native "fake cluster"),
# so sharding logic is exercised without TPU hardware.
#
# NOTE: this environment pre-imports jax via sitecustomize and pins the
# remote-TPU ("axon") platform through JAX_PLATFORMS, so setting the env var
# here is too late — use jax.config, which takes effect at (lazy) backend
# initialization.
# SPFSPLAT_TEST_TPU=1 runs the suite on the real chip instead (enables
# the TPU-only tests, e.g. flash-attention parity); default is the CPU
# mesh.
_USE_TPU = os.environ.get("SPFSPLAT_TEST_TPU") == "1"

if not _USE_TPU:
    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8"
        ).strip()

import jax  # noqa: E402

if not _USE_TPU:
    jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)

# Persistent compilation cache: the rasterizer/train-step XLA CPU compiles
# take minutes; cache them across pytest runs.
_CACHE_DIR = "/tmp/jax_test_compilation_cache"
jax.config.update("jax_compilation_cache_dir", _CACHE_DIR)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

if not _USE_TPU:
    assert jax.default_backend() == "cpu"


def pytest_configure(config):
    # pyproject sets `-n 4` (xdist) for the CPU suite; the real chip is a
    # single exclusive device, so TPU runs must be serial.
    if _USE_TPU and getattr(config.option, "numprocesses", None):
        config.option.numprocesses = 0
        config.option.dist = "no"
