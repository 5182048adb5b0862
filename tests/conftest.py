"""Test configuration: force CPU (8 virtual devices for sharding tests) and
float64, mirroring the reference's double-precision regression tolerances
(tests are the correctness anchor; TPU f32 is the perf path)."""

import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=8")

import jax  # noqa: E402

# The axon sitecustomize force-selects the TPU backend via jax.config
# (overriding JAX_PLATFORMS env); undo it for tests.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
