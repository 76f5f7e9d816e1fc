"""Test configuration: force the CPU backend with 8 virtual devices so
sharding tests run without TPU hardware (the session environment pins
JAX_PLATFORMS=axon for the real chip — tests must override it), and keep
float32 matmul precision so golden tests are meaningful."""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_default_matmul_precision", "highest")
