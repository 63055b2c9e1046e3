"""Native FASTA scanner tests: byte-identical output vs the pure-Python
parser across formatting edge cases, plus a throughput sanity check."""

import time

import numpy as np
import pytest

from evo_tpu.io import fastio
from evo_tpu.io.fasta import iter_fasta, read_fasta

pytestmark = pytest.mark.skipif(not fastio.available(),
                                reason='native fastio not built')


def _python_parse(text: str):
    import io
    names, seqs = [], []
    for n, s in iter_fasta(io.StringIO(text)):
        names.append(n)
        seqs.append(s)
    return names, seqs


CASES = [
    '>a\nACGT\n',
    '>a desc here\nACGT\nGGTT\n>b\nTTAA\n',
    '>a\r\nACGT\r\nGG\r\n',                       # CRLF
    'junk before\n>a\nACGT\n',                    # leading junk
    '>empty\n>b\nAC\n',                           # empty record
    '>a\n  ACGT  \n',                             # per-line edge blanks
    '>a\nAC GT\n',                                # interior space (EOS)
    '>a\nACGT',                                   # no trailing newline
    '',                                           # empty file
]


@pytest.mark.parametrize('text', CASES)
def test_matches_python_parser(text):
    want = _python_parse(text)
    got = fastio.parse_fasta_bytes(text.encode())
    assert got == want


def test_read_fasta_uses_fast_path(tmp_path):
    path = tmp_path / 'x.fasta'
    path.write_text('>s1 d\nACGT\nACGT\n>s2\nTT\n')
    names, seqs = read_fasta(str(path))
    assert names == ['s1 d', 's2']
    assert seqs == ['ACGTACGT', 'TT']


def test_large_file_round_trip_and_speed(tmp_path):
    rng = np.random.default_rng(0)
    records = []
    for i in range(200):
        seq = ''.join(rng.choice(list('ACGT'), size=5000))
        wrapped = '\n'.join(seq[j:j + 70] for j in range(0, len(seq), 70))
        records.append(f'>genome_{i} sample\n{wrapped}\n')
    text = ''.join(records)
    path = tmp_path / 'big.fasta'
    path.write_text(text)

    t0 = time.perf_counter()
    names, seqs = fastio.read_fasta_fast(str(path))
    native_dt = time.perf_counter() - t0
    assert len(names) == 200
    assert all(len(s) == 5000 for s in seqs)
    assert (names, seqs) == _python_parse(text)
    # ~1 MB should parse natively in well under a second
    assert native_dt < 1.0


def test_gzip_fasta(tmp_path):
    import gzip
    from evo_tpu.io.fasta import read_fasta
    from evo_tpu.io import fastio
    content = '>seq1 desc\nACGT\nACGT\n>seq2\nTTTT\n'
    gz = tmp_path / 'x.fa.gz'
    with gzip.open(gz, 'wt') as f:
        f.write(content)
    names, seqs = read_fasta(str(gz))
    assert names == ['seq1 desc', 'seq2']
    assert seqs == ['ACGTACGT', 'TTTT']
    if fastio.available():
        assert fastio.read_fasta_fast(str(gz)) == (names, seqs)


def test_midline_gt_is_sequence_content(tmp_path):
    """A '>' not at line start is sequence content, not a new record —
    native scanner must match the Python parser (which reads lines)."""
    from evo_tpu.io import fastio
    content = '>s1\nAC >GT\n>s2\nTT\n'
    p = tmp_path / 'gt.fasta'
    p.write_text(content)
    import io as _io
    from evo_tpu.io.fasta import iter_fasta
    recs = list(iter_fasta(_io.StringIO(content)))   # python oracle
    assert [n for n, _ in recs] == ['s1', 's2']
    if fastio.available():
        got = fastio.read_fasta_fast(str(p))
        assert got == ([n for n, _ in recs], [s for _, s in recs])
