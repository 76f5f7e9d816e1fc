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

# The axon sitecustomize (PYTHONPATH=/root/.axon_site) calls
# jax.config.update("jax_platforms", "axon,cpu") at interpreter start, which
# takes precedence over the JAX_PLATFORMS env var above — so tests would
# silently run through the single-chip TPU tunnel (and deadlock on its
# process lock). Override the *config*, not just the env, before any backend
# is initialized.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")
