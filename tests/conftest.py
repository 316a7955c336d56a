import os

# Tests run on a virtual 8-device CPU mesh (the JAX-native "fake cluster"),
# so sharding logic is exercised without TPU hardware.
#
# NOTE: this environment pre-imports jax via sitecustomize and pins the
# remote-TPU ("axon") platform through JAX_PLATFORMS, so setting the env var
# here is too late — use jax.config, which takes effect at (lazy) backend
# initialization.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)

assert jax.default_backend() == "cpu"
