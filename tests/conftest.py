"""Test configuration: force an 8-device virtual CPU mesh.

All tests run on CPU so sharding/pjit paths can be exercised without TPU
hardware (SURVEY.md section 4) and so tiny-shape compiles stay fast.  The
harness pre-sets JAX_PLATFORMS=axon, so we must override via jax.config
(the env var alone is not enough once jaxlib is partially pre-imported).
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
