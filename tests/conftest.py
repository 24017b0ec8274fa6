import os

# Tests run on a virtual 8-device CPU mesh; the TPU is exercised by bench.py
# and the driver's dryrun.  NOTE: the environment's sitecustomize imports jax
# at interpreter start (before this file runs), so JAX_PLATFORMS in os.environ
# is read too late -- force the platform through jax.config instead.
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

REFERENCE_TEST_DIR = "/root/reference/test"
