"""t3ta structure-comparison CLI tests: descriptor primitives plus an
end-to-end search on a synthetic candidates table."""

import numpy as np
import pandas as pd
import pytest

from semantic_design.bin import t3ta_structure_comparison as sc


def test_base_pair_distance():
    assert sc.base_pair_distance('((..))', '((..))') == 0.0
    assert sc.base_pair_distance('......', '......') == 0.0   # no pairs
    assert sc.base_pair_distance('', '(((...)))') == 1.0
    # disjoint pairings -> distance 1
    assert sc.base_pair_distance('()....', '....()') == 1.0
    # shared base pairs at identical positions -> intermediate distance
    d = sc.base_pair_distance('((((...))))', '.(((...))).')
    assert abs(d - 0.25) < 1e-9       # 3 of 4 pairs shared


def test_motifs_extracted():
    m = sc.extract_structural_motifs('(((...)))')
    assert 'HAIRPIN_3:3' in m
    assert 'DEPTH_3' in m
    assert 'UNPAIRED_3' in m
    assert sc.extract_structural_motifs('') == set()


def test_feature_vector_shape_and_content():
    f = sc.extract_structure_features('(((...)))', -5.0, '[(0, 8, 1, 7)]')
    assert f.shape == (10,)
    assert f[0] == 9          # length
    assert f[1] == 3          # pairs
    assert f[7] == -5.0       # mfe
    assert f[9] == 1          # hairpins
    assert np.all(sc.extract_structure_features(None, None, None) == 0)


def _row(root, structure, mfe, rna='ACGU'):
    return {
        'Root ID': root, 'Sequence_ID': f'{root}_1_10',
        'Consensus Structure': structure, 'Consensus MFE': mfe,
        'Consensus Hairpins': '[(0, 8, 1, 7)]',
        'Full Structure': structure, 'Full MFE': mfe,
        'Full Hairpins': '[(0, 8, 1, 7)]',
        'Consensus RNA': rna, 'Sequence': rna, 'Full RNA': rna,
        'Full TRF Region': rna.replace('U', 'T'),
    }


def test_search_end_to_end(tmp_path):
    hairpin = '(((((....)))))'
    other = '..............'
    query = pd.DataFrame([_row('q1', hairpin, -8.0)])
    target = pd.DataFrame([
        _row('t_match', hairpin, -8.5),
        _row('t_mismatch', other, -0.5),
    ])
    qcsv, tcsv, ocsv = (tmp_path / 'q.csv', tmp_path / 't.csv',
                        tmp_path / 'o.csv')
    query.to_csv(qcsv, index=False)
    target.to_csv(tcsv, index=False)
    df = sc.optimized_structural_search(
        qcsv, tcsv, ocsv, structure_type='both', min_similarity=0.7,
        n_cpus=1)
    assert not df.empty
    assert set(df['Target_ID']) == {'t_match'}
    assert (df['Similarity_Score'] >= 0.7).all()
    # both structure types hit for the identical structure
    assert set(df['Structure_Type']) == {'consensus', 'full'}
    out = pd.read_csv(ocsv)
    assert len(out) == len(df)


def test_search_skips_self_matches(tmp_path):
    hairpin = '(((((....)))))'
    rows = pd.DataFrame([_row('same', hairpin, -8.0)])
    qcsv, tcsv, ocsv = (tmp_path / 'q.csv', tmp_path / 't.csv',
                        tmp_path / 'o.csv')
    rows.to_csv(qcsv, index=False)
    rows.to_csv(tcsv, index=False)
    df = sc.optimized_structural_search(qcsv, tcsv, ocsv, n_cpus=1)
    assert df.empty
