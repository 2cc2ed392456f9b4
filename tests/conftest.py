"""Test configuration: 8 virtual CPU devices + float64.

The reference validates nothing (no tests exist, SURVEY.md section 4); this
suite builds the pyramid it lacks. Multi-device logic is exercised on a
virtual 8-device CPU mesh - the TPU analogue of a fake backend - and
numerics run in float64 to compare against the float64 numpy/scipy oracle.

Note: jax may be pre-imported by the harness before env vars can take
effect, so the CPU platform is forced via jax.config, not JAX_PLATFORMS.
"""

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
jax.config.update("jax_enable_x64", True)
