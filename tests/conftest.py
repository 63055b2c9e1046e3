"""Test env: force the CPU backend with 8 virtual devices so sharding/mesh
tests run without TPU hardware (SURVEY.md §4 prescription #4).

Set both the env vars and the programmatic config: a pytest plugin imports
jax._src before this conftest runs, so env-var defaults may already be
captured — config.update works as long as no backend is initialized yet.
"""

import os

os.environ['JAX_PLATFORMS'] = 'cpu'
_flags = os.environ.get('XLA_FLAGS', '')
if 'xla_force_host_platform_device_count' not in _flags:
    os.environ['XLA_FLAGS'] = (
        _flags + ' --xla_force_host_platform_device_count=8').strip()

import jax  # noqa: E402

jax.config.update('jax_platforms', 'cpu')
jax.config.update('jax_num_cpu_devices', 8)
jax.config.update('jax_enable_x64', False)

# Persistent compilation cache: the suite's cost is dominated by hundreds of
# tiny XLA compiles (eager-op dispatch in loops + per-shape jits); caching
# them makes re-runs ~10x faster.
jax.config.update('jax_compilation_cache_dir',
                  os.path.expanduser('~/.cache/evo_tpu_jax_test_cache'))
jax.config.update('jax_persistent_cache_min_compile_time_secs', 0.0)
jax.config.update('jax_persistent_cache_min_entry_size_bytes', -1)

assert jax.default_backend() == 'cpu'
assert jax.device_count() == 8, jax.devices()
