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

# Persistent compilation cache: the suite is compile-bound (tiny shapes,
# many jitted graphs) — caching compiled executables across runs cuts the
# default pass from ~8 min to well under 3 on a warm cache.
jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(__file__), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
