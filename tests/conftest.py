import os

# Tests run on a virtual 8-device CPU mesh so sharding paths are exercised
# without TPU hardware.  XLA_FLAGS must be set before backend init.
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

# The axon TPU plugin (if present) force-sets jax_platforms at interpreter
# startup via sitecustomize; override it back to CPU before any backend use.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
