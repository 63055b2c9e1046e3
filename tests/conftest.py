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

# Persistent compilation cache: OPT-IN via EVO_TPU_TEST_COMPILE_CACHE=1.
# It makes warm re-runs much faster, but XLA:CPU AOT (de)serialization has
# segfaulted twice in CI-style runs — once loading an artifact produced by
# a sibling machine whose cpuinfo flags matched but whose detected CPU
# model tuned different LLVM features (+prefer-no-gather), and once inside
# `put_executable_and_time` while WRITING an artifact ~90% through a cold
# run. A cold single-process run gains nothing from the disk cache anyway
# (the in-memory jit cache already dedups), so the default is off.
import hashlib  # noqa: E402


def _cpu_signature() -> str:
    """Host fingerprint for the XLA:CPU AOT cache key. Must include the
    CPU MODEL, not just the feature flags: XLA derives LLVM tuning
    features like +prefer-no-gather from the detected CPU model, so two
    hosts with identical cpuinfo flag sets can still produce mutually
    SIGSEGV-ing AOT artifacts (observed: a cached suite run died at 82%
    loading an artifact compiled on a sibling machine)."""
    parts = []
    try:
        with open('/proc/cpuinfo') as f:
            for line in f:
                key = line.split(':')[0].strip()
                if key in ('model name', 'cpu family', 'model',
                           'stepping'):
                    parts.append(line.strip())
                if line.startswith('flags'):
                    parts.append(' '.join(sorted(line.split()[2:])))
                    break            # flags end the per-core stanza
    except OSError:
        pass
    if not parts:
        import platform
        parts = [platform.processor()]
    import jax.version
    parts.append(jax.version.__version__)
    return hashlib.sha256('|'.join(parts).encode()).hexdigest()[:12]


if os.environ.get('EVO_TPU_TEST_COMPILE_CACHE') == '1':
    jax.config.update('jax_compilation_cache_dir',
                      os.path.expanduser(
                          f'~/.cache/evo_tpu_jax_test_cache_'
                          f'{_cpu_signature()}'))
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 0.0)
    jax.config.update('jax_persistent_cache_min_entry_size_bytes', -1)

assert jax.default_backend() == 'cpu'
assert jax.device_count() == 8, jax.devices()
