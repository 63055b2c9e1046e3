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
# them makes re-runs ~10x faster. The dir is keyed by the host CPU's feature
# flags: XLA:CPU AOT artifacts bake in the compile machine's ISA features
# but the cache key does NOT include them, so artifacts written on one
# machine SIGSEGV/SIGILL when loaded on a host missing a feature (observed
# across build machines: "+prefer-no-gather is not supported on the host").
import hashlib  # noqa: E402


def _cpu_signature() -> str:
    try:
        with open('/proc/cpuinfo') as f:
            for line in f:
                if line.startswith('flags'):
                    return hashlib.sha256(
                        ' '.join(sorted(line.split()[2:])).encode()
                    ).hexdigest()[:12]
    except OSError:
        pass
    import platform
    return hashlib.sha256(platform.processor().encode()).hexdigest()[:12]


jax.config.update('jax_compilation_cache_dir',
                  os.path.expanduser(
                      f'~/.cache/evo_tpu_jax_test_cache_{_cpu_signature()}'))
jax.config.update('jax_persistent_cache_min_compile_time_secs', 0.0)
jax.config.update('jax_persistent_cache_min_entry_size_bytes', -1)

assert jax.default_backend() == 'cpu'
assert jax.device_count() == 8, jax.devices()
