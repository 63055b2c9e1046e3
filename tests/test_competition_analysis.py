"""Competition-analysis tests: variable-position discovery, SNV read
assignment (direct + MSA) on synthetic SAMs, chimera detection, and the
stage-2/3 pipelines end-to-end without external binaries."""

import os

import numpy as np
import pandas as pd
import pytest

from evo_tpu.io.fasta import write_fasta
from phage_gen.analysis import competition_analysis as ca


def _make_refs():
    # two 120-bp references differing at 60 positions: enough variable
    # sites that each of the 5 chimera-detection windows holds >= 5
    rng = np.random.default_rng(0)
    a = list(''.join(rng.choice(list('ACGT'), size=120)))
    b = list(a)
    var = list(range(0, 120, 2))                 # 60 variable positions
    for pos in var:
        b[pos] = 'ACGT'[('ACGT'.index(b[pos]) + 1) % 4]
    return {'phageA': ''.join(a), 'phageB': ''.join(b)}, var


def _sam_line(name, ref, seq, nm=0):
    return (f'{name}\t0\t{ref}\t1\t60\t{len(seq)}M\t*\t0\t0\t{seq}\t*'
            f'\tNM:i:{nm}')


def test_find_variable_positions():
    refs, var = _make_refs()
    assert ca.find_variable_positions(refs) == var


def test_assign_and_count_direct(tmp_path):
    refs, var = _make_refs()
    expected = ca.build_expected_bases(refs, var)
    sam = tmp_path / 's.sam'
    lines = ['@SQ\tSN:phageA\tLN:120', '@SQ\tSN:phageB\tLN:120']
    # perfect A read, perfect B read (mapped to A: tests reassignment),
    # and a chimera: 80 bp of A then 40 bp of B — asymmetric so the
    # overall margin favors A (chimera checks require margin >= 1) while
    # the last windows vote B
    chimera = refs['phageA'][:80] + refs['phageB'][80:]
    lines.append(_sam_line('readA', 'phageA', refs['phageA']))
    lines.append(_sam_line('readB_onA', 'phageA', refs['phageB'], nm=2))
    lines.append(_sam_line('chimera', 'phageA', chimera, nm=1))
    sam.write_text('\n'.join(lines) + '\n')

    counts, stats, cw = ca.snv_based_counts_direct(
        str(sam), refs, var, expected, min_pid=0.5, min_align_frac=0.5)
    assert stats['total_primary'] == 3
    assert counts.get('phageA') == 1
    assert counts.get('phageB') == 1
    assert stats['reassigned'] == 1              # readB mapped to A
    assert stats['chimera'] == 1
    assert sum(cw['window_counts']) >= 1


def test_msa_mode_handles_ragged_refs():
    refs = {
        'long': 'ACGTACGTCCAAGGTTACGTACGT',
        'short': 'ACGTACGTAAGGTTACGAACGT',     # 2-bp deletion + T->A SNV
    }
    msa_cols, ref_to_msa = ca.build_msa_via_pairwise(refs)
    assert len(msa_cols) == len(refs['long'])
    var_cols = ca.find_variable_msa_columns(msa_cols, list(refs))
    assert var_cols                               # the SNV shows up
    expected = ca.build_expected_bases_msa(msa_cols, var_cols, list(refs))
    for col in var_cols:
        assert set(expected[col]) == {'long', 'short'}


def test_stage3_fold_changes(tmp_path):
    # synthetic merged counts: phageA grows 2x in proportion each timepoint
    rows = []
    for tp in range(3):
        for rep in (1, 2):
            pa = 0.2 * (2 ** tp)
            rows.append({'Sequence': 'phageA', 'Read Count': int(pa * 100),
                         'Proportion': pa, 'Sample': f'T{tp}_rep{rep}'})
            rows.append({'Sequence': 'phageB',
                         'Read Count': int((1 - pa) * 100),
                         'Proportion': 1 - pa,
                         'Sample': f'T{tp}_rep{rep}'})
    df = pd.DataFrame(rows)
    hours = {0: 0.0, 1: 1.0, 2: 2.0}
    cum = ca.calculate_cumulative_fc_per_replicate(df, hours)
    a2 = cum[(cum['Sequence'] == 'phageA') & (cum['Timepoint'] == 2)]
    np.testing.assert_allclose(a2['Cumulative_Fold_Change'], 2.0)
    auc = ca.compute_signed_auc(cum)
    a_auc = auc[auc['Sequence'] == 'phageA']['SignedAUC']
    assert (a_auc > 0).all()
    b_auc = auc[auc['Sequence'] == 'phageB']['SignedAUC']
    assert (b_auc < 0).all()
    fc = ca.compute_t0_to_tfinal_fold_changes(df, 2)
    a_fc = fc[fc['Sequence'] == 'phageA']
    np.testing.assert_allclose(a_fc['Prop_log2FC'], 2.0)


def test_stage2_and_3_end_to_end(tmp_path):
    refs, var = _make_refs()
    ref_fasta = tmp_path / 'refs.fasta'
    write_fasta(str(ref_fasta), list(refs), list(refs.values()))
    out = tmp_path / 'out'
    out.mkdir()
    # two timepoints x one replicate; shift from A-dominant to B-dominant
    for tp, (na, nb) in enumerate([(8, 2), (2, 8)]):
        lines = ['@SQ\tSN:phageA\tLN:120', '@SQ\tSN:phageB\tLN:120']
        for i in range(na):
            lines.append(_sam_line(f'a{i}', 'phageA', refs['phageA']))
        for i in range(nb):
            lines.append(_sam_line(f'b{i}', 'phageB', refs['phageB']))
        (out / f'T{tp}_rep1.sam').write_text('\n'.join(lines) + '\n')
    config = {
        'name': 'synthetic', 'output_dir': str(out),
        'reference_fasta': str(ref_fasta), 'scoring_mode': 'direct',
        'min_pid': 0.5, 'min_align_frac': 0.5,
        'samples': [('T0_rep1', 'x'), ('T1_rep1', 'x')],
        'accession_to_name': {}, 'exclude_phages': [],
        'timepoint_to_hours': {0: 0.0, 1: 1.0}, 'max_timepoint': 1,
    }
    ca.run_stage2(config)
    merged = pd.read_csv(out / 'all_timepoints_read_counts_primary.csv')
    assert set(merged['Sample']) == {'T0_rep1', 'T1_rep1'}
    t0 = merged[merged['Sample'] == 'T0_rep1']
    assert t0[t0['Sequence'] == 'phageA']['Proportion'].iloc[0] == 0.8
    ca.run_stage3(config)
    assert (out / 'cumulative_proportion_fold_changes.csv').exists()
    assert (out / 'signed_auc_cumulative_log2FC.csv').exists()
    ca.run_stage4(config)
    assert (out / 'log2fc_lineplot.pdf').exists()
    assert (out / 'read_fate.pdf').exists()
