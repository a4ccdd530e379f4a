"""Test configuration: force the JAX CPU backend with 8 virtual devices so
multi-chip sharding logic is exercised without TPU hardware (SURVEY.md §4).

Note: the environment may pin JAX_PLATFORMS to a hardware plugin, which
overrides the env-var route — `jax.config.update` wins, so we use that.
"""

import os

# Must be in the environment before the backend initializes.
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_threefry_partitionable", True)

# Persistent compilation cache: compiles dominate the suite's wall time on
# the 1-core CI box (e.g. each golden scene's first render). The cache is
# keyed on backend+HLO, so CPU test executables never collide with TPU
# render executables. First run pays full compiles; warm runs load them.
jax.config.update("jax_compilation_cache_dir", os.path.expanduser(
    "~/.cache/digital_earth_tpu/jax_cache"
))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
