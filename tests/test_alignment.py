"""Vectorized Needleman-Wunsch + SAM reader tests: alignment optimality vs
a brute-force scalar DP, identity semantics, and CIGAR aligned-pairs."""

import numpy as np
import pytest

from phage_gen.analysis import alignment as al


def _scalar_nw_score(a, b, match=1, mismatch=-1, gap=-2):
    n, m = len(a), len(b)
    dp = [[0] * (m + 1) for _ in range(n + 1)]
    for i in range(n + 1):
        dp[i][0] = i * gap
    for j in range(m + 1):
        dp[0][j] = j * gap
    for i in range(1, n + 1):
        for j in range(1, m + 1):
            s = match if a[i - 1] == b[j - 1] else mismatch
            dp[i][j] = max(dp[i - 1][j - 1] + s, dp[i - 1][j] + gap,
                           dp[i][j - 1] + gap)
    return dp[n][m]


def _alignment_score(aa, bb, match=1, mismatch=-1, gap=-2):
    score = 0
    for x, y in zip(aa, bb):
        if x == '-' or y == '-':
            score += gap
        elif x == y:
            score += match
        else:
            score += mismatch
    return score


@pytest.mark.parametrize('seed', range(5))
def test_global_align_is_optimal(seed):
    rng = np.random.default_rng(seed)
    a = ''.join(rng.choice(list('ACGT'), size=rng.integers(5, 40)))
    b = ''.join(rng.choice(list('ACGT'), size=rng.integers(5, 40)))
    aa, bb, score = al.global_align(a, b)
    # alignment reconstructs the inputs
    assert aa.replace('-', '') == a
    assert bb.replace('-', '') == b
    # reported score matches the alignment and equals the DP optimum
    assert _alignment_score(aa, bb) == score
    assert score == _scalar_nw_score(a, b)


def test_percent_identity():
    assert al.percent_identity('ACGT', 'ACGT') == 100.0
    assert al.percent_identity('ACGT', 'ACGA') == 75.0
    assert al.percent_identity('AAAA', 'TTTT') < 100.0


def test_identity_long_sequences_fast():
    rng = np.random.default_rng(1)
    a = ''.join(rng.choice(list('ACGT'), size=3000))
    # b = a with some mutations
    b = list(a)
    for i in rng.choice(3000, size=60, replace=False):
        b[i] = 'ACGT'[(('ACGT'.index(b[i])) + 1) % 4]
    ident = al.percent_identity(a, ''.join(b))
    assert 97.0 < ident < 99.0


# ---------------------------------------------------------------------------
# SAM reader
# ---------------------------------------------------------------------------

def _write_sam(path):
    lines = [
        '@SQ\tSN:ref1\tLN:20',
        # 3S4M1I2M2D3M: starts at ref pos 5 (1-based)
        'r1\t0\tref1\t5\t60\t3S4M1I2M2D3M\t*\t0\t0\tACGTACGTACGTA\t*'
        '\tNM:i:3',
        'r2\t4\t*\t0\t0\t*\t*\t0\t0\tACGT\t*',          # unmapped
        'r3\t256\tref1\t1\t0\t4M\t*\t0\t0\tACGT\t*',    # secondary
    ]
    path.write_text('\n'.join(lines) + '\n')


def test_sam_reader(tmp_path):
    sam = tmp_path / 'x.sam'
    _write_sam(sam)
    reads = list(al.iter_sam(str(sam)))
    assert len(reads) == 3
    r1, r2, r3 = reads
    assert not r1.is_unmapped and r2.is_unmapped and r3.is_secondary
    assert r1.reference_start == 4
    assert r1.get_tag('NM') == 3
    assert r1.query_alignment_length == 4 + 1 + 2 + 3  # M+I+M+M
    pairs = r1.get_aligned_pairs()
    # first aligned base: query 3 (after soft clip) -> ref 4
    assert pairs[0] == (3, 4)
    ref_to_query = {r: q for q, r in pairs if r is not None and
                    q is not None}
    # deletion consumes ref 10,11 with no query
    assert 10 not in ref_to_query and 11 not in ref_to_query
    assert ref_to_query[12] is not None


def test_not_terminal_identity_counts_internal_gaps():
    """An internal insertion must lower not_terminal identity but not
    'aligned' identity (biotite default-mode parity)."""
    from phage_gen.analysis.alignment import percent_identity
    ref = 'ACGTTGCAATCGGATCCTAG'   # non-repetitive: unique optimum
    ins = ref[:10] + 'TTTTT' + ref[10:]
    aligned = percent_identity(ref, ins, match=5, mismatch=-4, gap=-10,
                               terminal_free=True, mode='aligned')
    not_term = percent_identity(ref, ins, match=5, mismatch=-4, gap=-10,
                                terminal_free=True, mode='not_terminal')
    assert aligned == 100.0
    assert 75.0 <= not_term <= 85.0     # 20 matches over a 25-col span


def test_terminal_free_overhang_identity():
    """A terminal overhang must NOT lower not_terminal identity."""
    from phage_gen.analysis.alignment import percent_identity
    ref = 'ACGTACGTACGTACGT'
    ext = ref + 'TTTTTTTT'
    got = percent_identity(ref, ext, match=5, mismatch=-4, gap=-10,
                           terminal_free=True, mode='not_terminal')
    assert got == 100.0


def test_terminal_free_symmetric_overhangs():
    """Leading overhangs on EITHER side must be free under terminal_free
    (the first DP column was previously still penalized)."""
    from phage_gen.analysis.alignment import percent_identity
    core = 'ACGTTGCAATCGGATCCTAG'
    a = 'TTTTT' + core
    kw = dict(match=5, mismatch=-4, gap=-10, terminal_free=True,
              mode='not_terminal')
    assert percent_identity(a, core, **kw) == 100.0
    assert percent_identity(core, a, **kw) == 100.0
