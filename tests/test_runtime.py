"""Tests for the runtime debug/observability controls (SURVEY.md §5)."""

import jax

from evo_tpu import runtime


def test_configure_roundtrip():
    runtime.configure(debug_nans=True)
    assert jax.config.jax_debug_nans
    runtime.configure(debug_nans=False)
    assert not jax.config.jax_debug_nans
    # untouched flags stay untouched
    before = jax.config.jax_disable_jit
    runtime.configure(debug_nans=False)
    assert jax.config.jax_disable_jit == before


def test_device_memory_report_runs():
    out = runtime.device_memory_report()
    assert isinstance(out, str) and out


def test_trace_noop_without_dir():
    with runtime.trace(None):
        pass


def test_trace_captures(tmp_path):
    with runtime.trace(str(tmp_path)):
        jax.block_until_ready(jax.numpy.ones((8,)) * 2)
    assert list(tmp_path.iterdir()), 'profiler should write trace files'


def test_host_log(capsys):
    runtime.log('hello')
    out = capsys.readouterr().out
    assert '[host 0] hello' in out
