import os

# Tests run on a virtual 8-device CPU mesh: sharding logic is exercised
# without TPU hardware, tiny shapes compile faster on CPU, and complex128
# (unsupported on the TPU) is available for reference-parity checks.
# NOTE: the ambient axon TPU plugin overrides the JAX_PLATFORMS env var, so
# the platform must be forced through jax.config as well.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
