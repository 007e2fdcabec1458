import os

# Run the test suite on a fake 8-device CPU mesh so that the multi-chip
# sharding paths can be exercised without TPU hardware.  The axon
# sitecustomize imports jax at interpreter start with JAX_PLATFORMS=axon, so
# the env-var route is closed; the config API still works.
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import smcpp_tpu  # noqa: E402,F401  (enables x64)
