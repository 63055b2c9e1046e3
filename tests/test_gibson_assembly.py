"""Gibson assembly design tests: NN melting temperature sanity, overlap
QC, and end-to-end circular fragment design on a synthetic genome."""

import numpy as np
import pandas as pd
import pytest

from phage_gen.analysis import genome_gibson_assembly as gib


def test_melting_temperature_sane():
    # 20-mer 50% GC should melt somewhere in the 40-75 C band
    tm = gib.melting_temperature('ACGTACGTACGTACGTACGT')
    assert 30 < tm < 80
    # higher GC -> higher Tm
    tm_gc = gib.melting_temperature('GCGCGCGCGCGCGCGCGCGC')
    tm_at = gib.melting_temperature('ATATATATATATATATATAT')
    assert tm_gc > tm > tm_at
    with pytest.raises(ValueError):
        gib.melting_temperature('ACGN')


def test_check_overlap_quality_flags_homopolymers():
    q = gib.check_overlap_quality('GAAAAAAC' + 'GCGC' * 5)
    assert q['homopolymer_penalty'] >= 15          # A6+ and A4+ both hit
    assert any('homopolymer' in p for p in q['problems'])
    q2 = gib.check_overlap_quality('GCAT' * 8)
    assert q2['problems'] == []
    assert q2['has_gc_clamp'] is False             # ends in T


def _synthetic_genome(rng, n=5000):
    # balanced GC, no long homopolymers: random draws, reject runs
    out = []
    last, run = '', 0
    while len(out) < n:
        b = rng.choice(list('ACGT'))
        if b == last:
            run += 1
            if run >= 3:
                continue
        else:
            run = 1
        out.append(b)
        last = b
    return ''.join(out)


def test_design_circular_fragments():
    rng = np.random.default_rng(0)
    genome = _synthetic_genome(rng, 5000)
    result = gib.design_circular_gibson_fragments(
        genome, overlap_length=30, target_distance=2500,
        max_fragment_length=5000)
    f1, f2 = result['fragment_1'], result['fragment_2']
    assert len(f1) + len(f2) - 60 == len(genome)
    # each fragment ends with the other's starting overlap
    assert f1[-30:] == f2[:30]
    assert f2[-30:] == f1[:30]
    assert result['overlap_tm_difference'] >= 0


def test_design_for_dataframe(tmp_path):
    rng = np.random.default_rng(1)
    df = pd.DataFrame({'id_prompt': ['g1'],
                       'sequence': [_synthetic_genome(rng, 4800)]})
    inp, out = tmp_path / 'in.csv', tmp_path / 'out.csv'
    df.to_csv(inp, index=False)
    gib.design_gibson_for_dataframe(str(inp), str(out))
    result = pd.read_csv(out)
    assert result['gibson_fragment1_sequence'].notna().all()
    assert (result['gibson_fragment1_len']
            + result['gibson_fragment2_len'] - 60 == 4800).all()


def test_melting_temperature_matches_biopython_tm_nn_defaults():
    """Pinned to the reference's `mt.Tm_NN(seq)` defaults: DNA_NN3 table
    (Allawi & SantaLucia 1997), 25/25 nM strands, 50 mM Na+,
    SantaLucia-1998 salt correction. Value computed from the published
    constants; guards against table drift (the 2004 unified table is
    ~1 C off — enough to change junction ranking)."""
    tm = gib.melting_temperature('AGCGTACCTGGAATCCGATGGCATTAGCCA')
    assert abs(tm - 64.6430) < 5e-4, tm
