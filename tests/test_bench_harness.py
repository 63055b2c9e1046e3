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
