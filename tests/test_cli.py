"""Subprocess smoke tests for the CLI surface (scripts/).

These run the real entry points end-to-end on the tiny schema model;
JAX_PLATFORMS=cpu is honored because each CLI applies it via
jax.config before any backend initializes (an env var alone loses to
out-of-tree TPU plugins)."""

import csv
import json
import os
import subprocess
import sys

import pytest

pytestmark = pytest.mark.smoke

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(args, timeout=420):
    env = dict(os.environ)
    env['JAX_PLATFORMS'] = 'cpu'
    return subprocess.run([sys.executable, '-m'] + args,
                          capture_output=True, text=True, cwd=REPO,
                          env=env, timeout=timeout)


def test_score_cli_tiny(tmp_path):
    out_tsv = str(tmp_path / 'scores.tsv')
    r = _run(['scripts.score', '--tiny',
              '--input-fasta', 'examples/example_seqs.fasta',
              '--output-tsv', out_tsv])
    assert r.returncode == 0, r.stderr[-3000:]
    with open(out_tsv) as f:
        rows = list(csv.reader(f, delimiter='\t'))
    assert len(rows) == 4                     # header + 3 example seqs
    header = rows[0]
    assert 'seqs' in header and 'scores' in header
    scores = [float(row[header.index('scores')]) for row in rows[1:]]
    assert all(s < 0 for s in scores)


def test_generate_cli_tiny_greedy_and_speculative():
    r = _run(['scripts.generate', '--tiny', '--prompt', 'ACGTACGT',
              '--n-samples', '2', '--n-tokens', '6',
              '--temperature', '0', '--top-k', '1', '--verbose', '1'])
    assert r.returncode == 0, r.stderr[-3000:]
    def outputs(text):
        return [line.split('Output: "')[1].split('"')[0]
                for line in text.splitlines() if 'Output: "' in line]

    outs = outputs(r.stdout)
    assert len(outs) == 2
    assert outs[0] == outs[1]                 # greedy: samples identical

    r2 = _run(['scripts.generate', '--tiny', '--prompt', 'ACGTACGT',
               '--n-samples', '1', '--n-tokens', '6',
               '--temperature', '0', '--speculative', '4'])
    assert r2.returncode == 0, r2.stderr[-3000:]
    spec = outputs(r2.stdout)
    # speculative greedy emits the same tokens as plain greedy
    assert spec == [outs[0]], (spec, outs)


def test_serve_cli_jsonl_tiny(tmp_path):
    reqs = str(tmp_path / 'reqs.jsonl')
    outs = str(tmp_path / 'out.jsonl')
    with open(reqs, 'w') as f:
        f.write(json.dumps({'id': 'a', 'prompt': 'ACGT',
                            'num_tokens': 5}) + '\n')
        f.write(json.dumps({'id': 'b', 'prompt': 'TTGGCC',
                            'temperature': 0.9}) + '\n')
    r = _run(['scripts.serve', '--tiny', '--requests-jsonl', reqs,
              '--output-jsonl', outs, '--max-slots', '2',
              '--max-len', '64', '--steps-per-sync', '4',
              '--n-tokens', '4'])
    assert r.returncode == 0, r.stderr[-3000:]
    lines = [json.loads(x) for x in open(outs)]
    assert [x['id'] for x in lines] == ['a', 'b']
    assert lines[0]['num_tokens'] == 5 and lines[1]['num_tokens'] == 4
