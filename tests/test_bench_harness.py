"""Host-side bench harness logic (bench.py).

The preset-'all' driver bench isolates its allocator-hungry rows in
child processes (`_run_isolated` / `--section`); these tests pin the
parent's result-parsing contract (last JSON line wins, stderr tail on
failure, timeout marked not raised) without needing a TPU.
"""

import json
import subprocess

import pytest

pytestmark = pytest.mark.smoke

import bench


class _Proc:
    """Fake subprocess.Popen handle (bench uses Popen so the parent's
    SIGTERM handler can terminate a live child)."""

    def __init__(self, stdout='', stderr='', returncode=0,
                 timeout=False):
        self._out, self._err = stdout, stderr
        self.returncode = returncode
        self._timeout = timeout

    def communicate(self, timeout=None):
        if self._timeout:
            raise subprocess.TimeoutExpired(cmd='bench', timeout=timeout)
        return self._out, self._err

    def poll(self):
        return self.returncode

    def kill(self):
        self._timeout = False


def test_run_isolated_parses_last_json_line(monkeypatch):
    row = {'value': 123.4, 'unit': 'tokens/s', 'vs_baseline': 1.5}
    out = ('WARNING: platform axon is experimental\n'
           'not json\n' + json.dumps({'old': 1}) + '\n'
           + json.dumps(row) + '\n')
    monkeypatch.setattr(subprocess, 'Popen',
                        lambda *a, **k: _Proc(stdout=out))
    assert bench._run_isolated('p131', 60) == row


def test_run_isolated_reports_stderr_tail_on_failure(monkeypatch):
    err = 'Traceback ...\njax.errors.JaxRuntimeError: RESOURCE_EXHAUSTED\n'
    monkeypatch.setattr(
        subprocess, 'Popen',
        lambda *a, **k: _Proc(stdout='no json here', stderr=err,
                              returncode=1))
    res = bench._run_isolated('int4', 60)
    assert isinstance(res, str)
    assert res.startswith('error: ')
    assert 'RESOURCE_EXHAUSTED' in res


def test_run_isolated_marks_timeout(monkeypatch):
    monkeypatch.setattr(subprocess, 'Popen',
                        lambda *a, **k: _Proc(timeout=True))
    res = bench._run_isolated('full131k', 120)
    assert isinstance(res, str)
    assert 'timeout' in res


def test_run_isolated_no_output(monkeypatch):
    monkeypatch.setattr(subprocess, 'Popen',
                        lambda *a, **k: _Proc(returncode=7))
    res = bench._run_isolated('p131', 60)
    assert res == 'error: rc=7, no output'


def test_run_isolated_clears_child_handle(monkeypatch):
    monkeypatch.setattr(subprocess, 'Popen',
                        lambda *a, **k: _Proc(stdout='{"value": 1}'))
    bench._run_isolated('p131', 60)
    assert bench._CHILD.get('proc') is None


def test_run_section_rejects_unknown_name():
    with pytest.raises(SystemExit):
        bench._run_section('nope')


def test_round_number_env_override(monkeypatch):
    monkeypatch.setenv('BENCH_ROUND', '7')
    assert bench._round_number() == 7


def test_ngram_oracle_acceptance_brackets():
    import numpy as np
    rng = np.random.default_rng(0)
    unit = rng.integers(0, 4, 256)
    periodic = np.tile(unit, 8)
    acc, tpc = bench._ngram_oracle_acceptance(periodic, 512, gamma=8)
    assert acc > 0.95 and tpc > 7.0          # perfect self-similarity
    random = rng.integers(0, 4, 2048)
    acc_r, _ = bench._ngram_oracle_acceptance(random, 512, gamma=8)
    assert acc_r < 0.2                        # chance-level


def test_longgen_tiny_regrowth_and_consistency():
    """bench_longgen at tiny scale: chunked greedy generation must cross
    >=2 cache regrowths and its decode logits must match fresh prefills
    exactly (f32) at every spot-check."""
    import jax

    from evo_tpu import model as model_lib
    from evo_tpu.config import tiny_config
    cfg = tiny_config(max_sequence_len=2048)
    params = model_lib.init_params(jax.random.PRNGKey(0), cfg)
    tps, info = bench.bench_longgen(
        total_tokens=256, chunk=64, n_checkpoints=2, prompt_len=16,
        growth_align=1, cfg=cfg, params=params)
    assert tps > 0
    assert info['regrowths'] >= 2, info
    assert info['spot_checks'], info
    assert all(c['argmax_agree'] for c in info['spot_checks']), info
    assert all(c['max_abs_logit_diff'] < 1e-2
               for c in info['spot_checks']), info


def test_longgen_state_checkpoint_resume(tmp_path):
    """Multi-process long-generation legs: a checkpointed run resumed in
    a second call must finish with the SAME exactness guarantees (decode
    logits == fresh prefill at every spot-check) as a single-state run —
    the 65k+ on-chip runs hand the cache between processes this way."""
    import jax

    from evo_tpu import model as model_lib
    from evo_tpu.config import tiny_config
    cfg = tiny_config(max_sequence_len=2048)
    params = model_lib.init_params(jax.random.PRNGKey(0), cfg)
    kw = dict(total_tokens=256, chunk=64, n_checkpoints=2, prompt_len=16,
              growth_align=1, cfg=cfg, params=params,
              state_dir=str(tmp_path))
    tps, info = bench.bench_longgen(max_chunks_per_call=2, **kw)
    assert tps is None and info == {'resume_at': 2, 'total_chunks': 4}
    assert (tmp_path / 'longgen_state.pkl').exists()
    # remaining legs: the rest of generation, then ONE oracle per leg
    # (the per-process isolation the on-chip 65k run needs)
    legs = 0
    while tps is None and legs < 10:
        tps, info = bench.bench_longgen(max_chunks_per_call=2, **kw)
        legs += 1
    assert tps is not None and tps > 0 and info['regrowths'] >= 2
    assert legs >= 3, legs         # gen leg + >=2 oracle legs
    assert len(info['spot_checks']) == 2
    assert all(c['argmax_agree'] and c['max_abs_logit_diff'] < 1e-2
               for c in info['spot_checks']), info
    assert not (tmp_path / 'longgen_state.pkl').exists()  # cleaned up
