import os

# Tests run on a virtual 8-device CPU mesh; benchmarks run separately on TPU.
# NOTE: jax is already imported by pytest plugins before this conftest runs,
# and the environment pre-sets JAX_PLATFORMS=axon (TPU tunnel), so we must go
# through jax.config rather than os.environ for the platform selection.
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)

assert jax.devices()[0].platform == "cpu"
