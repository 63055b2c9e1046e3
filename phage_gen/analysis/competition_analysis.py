"""Phage-competition NGS analysis (4 stages).

Parity with reference `phage_gen/analysis/competition_analysis.py`:

  1. QC + alignment: fastp read filtering -> minimap2 map-ont (primary only)
  2. SNV-based read assignment: score each read at variable positions
     against every reference, with rank-windowed chimera detection;
     "direct" mode (equal-length references) or "msa" mode (variable
     lengths, references aligned to the longest anchor)
  3. Fold changes: cumulative log2 proportion fold change per replicate,
     signed AUC over time, T0->Tfinal count-vs-proportion comparison
  4. Visualization: log2FC line/facet plots, AUC bars, read-fate stacks

Differences from the reference: dataset configs come from a YAML file
(`--config`) instead of hard-coded absolute paths, and the SAM parsing and
pairwise alignment use the dependency-free `phage_gen.analysis.alignment`
module (no pysam/BioPython). Output CSV schemas and filenames are
identical; `--stages`/`--skip-existing` resume semantics are kept.

Usage:
    python -m phage_gen.analysis.competition_analysis \
        --config experiments.yaml [--datasets name1,name2] \
        [--stages 1234] [--skip-existing]
"""

from __future__ import annotations

import argparse
import csv
import json
import os
import subprocess
from collections import defaultdict
from typing import Dict, List, Optional, Set, Tuple

import numpy as np
import yaml

from evo_tpu.io.fasta import iter_fasta
from phage_gen.analysis.alignment import SamRead, global_align, iter_sam

N_WINDOWS = 5
MIN_VAR_PER_WINDOW = 5
MIN_WINDOW_MARGIN = 3
MIN_DISAGREEING_WINDOWS = 1


# ---------------------------------------------------------------------------
# Stage 1: QC + alignment
# ---------------------------------------------------------------------------

def run_fastp(input_file: str, output_file: str, report_file: str,
              min_length: int = 250, quality_threshold: int = 20,
              unqualified_limit: int = 30) -> None:
    print(f'  [fastp] {os.path.basename(input_file)}')
    subprocess.run(
        ['fastp', '-i', input_file, '-o', output_file, '-l',
         str(min_length), '-q', str(quality_threshold), '-u',
         str(unqualified_limit), '--html', report_file], check=True)


def align_reads(filtered_fastq: str, reference_fasta: str,
                output_sam: str, threads: int = 8) -> None:
    print(f'  [minimap2] {os.path.basename(filtered_fastq)}')
    subprocess.run(
        ['minimap2', '-ax', 'map-ont', '--secondary=no', '-t',
         str(threads), reference_fasta, filtered_fastq, '-o', output_sam],
        check=True)


def run_stage1(config: dict, skip_existing: bool = False) -> None:
    print(f"\n  STAGE 1: QC + Alignment — {config['name']}")
    output_dir = config['output_dir']
    os.makedirs(output_dir, exist_ok=True)
    for sample_name, fastq_file in config['samples']:
        input_fastq = os.path.join(config['raw_fastq_dir'], fastq_file)
        filtered = os.path.join(output_dir,
                                f'{sample_name}_filtered.fastq')
        report = os.path.join(output_dir, f'{sample_name}_fastp.html')
        sam = os.path.join(output_dir, f'{sample_name}.sam')
        if skip_existing and os.path.exists(sam):
            print(f'  [skip] {sample_name} — SAM exists')
            continue
        if not os.path.exists(input_fastq):
            print(f'  [warn] {sample_name} — FASTQ missing: {input_fastq}')
            continue
        run_fastp(input_fastq, filtered, report)
        align_reads(filtered, config['reference_fasta'], sam)


# ---------------------------------------------------------------------------
# Stage 2: SNV-based assignment
# ---------------------------------------------------------------------------

def load_references(fasta_path: str) -> Dict[str, str]:
    return {name.split()[0]: seq.upper()
            for name, seq in iter_fasta(fasta_path)}


def find_variable_positions(refs: Dict[str, str]) -> List[int]:
    """Direct mode: columns where references disagree (equal lengths)."""
    names = list(refs)
    lengths = {len(refs[n]) for n in names}
    assert len(lengths) == 1, \
        f'Direct mode requires equal-length references, got {lengths}'
    seq_len = lengths.pop()
    return [pos for pos in range(seq_len)
            if len({refs[n][pos] for n in names}) > 1]


def build_expected_bases(refs, var_positions):
    return {pos: {n: refs[n][pos] for n in refs} for pos in var_positions}


def build_varpos_window_map(var_positions: List[int],
                            n_windows: int) -> Dict[int, int]:
    """Window by variable-position *rank* (equal informative sites per
    window, robust to clustered SNVs)."""
    n = len(var_positions)
    return {pos: min(i * n_windows // n, n_windows - 1)
            for i, pos in enumerate(var_positions)}


def _score_read(ref_to_query: Dict[int, int], query_seq: str,
                positions_of: Dict[int, int], expected, ref_names,
                window_of: Optional[Dict[int, int]], n_windows: int):
    """Shared scoring core for direct/msa modes.

    positions_of: maps a read-reference position to the scoring key
    (the position itself for direct mode; the MSA column for msa mode)."""
    scores = {n: 0 for n in ref_names}
    n_informative = 0
    window_scores = [{n: 0 for n in ref_names} for _ in range(n_windows)]
    window_n_info = [0] * n_windows
    for rpos, key in positions_of.items():
        qpos = ref_to_query.get(rpos)
        if qpos is None:
            continue
        read_base = query_seq[qpos].upper()
        n_informative += 1
        wi = window_of.get(key) if window_of else None
        if wi is not None:
            window_n_info[wi] += 1
        for name in ref_names:
            exp = expected[key][name]
            if exp is not None and exp == read_base:
                scores[name] += 1
                if wi is not None:
                    window_scores[wi][name] += 1
    if n_informative == 0:
        return None, 0, 0, False, []
    ranked = sorted(scores.items(), key=lambda kv: -kv[1])
    best_name, best = ranked[0]
    margin = best - ranked[1][1]
    is_chimera = False
    disagreeing = []
    if window_of is not None and margin >= 1:
        for wi in range(n_windows):
            if window_n_info[wi] < MIN_VAR_PER_WINDOW:
                continue
            w_ranked = sorted(window_scores[wi].items(),
                              key=lambda kv: -kv[1])
            if w_ranked[0][0] != best_name and \
                    w_ranked[0][1] - w_ranked[1][1] >= MIN_WINDOW_MARGIN:
                disagreeing.append(wi)
        is_chimera = len(disagreeing) >= MIN_DISAGREEING_WINDOWS
    return best_name, margin, n_informative, is_chimera, disagreeing


def assign_read_by_snvs(read: SamRead, var_positions, expected, ref_names,
                        varpos_window_map=None, n_windows=N_WINDOWS):
    """Direct-mode scoring of one read."""
    if read.query_sequence is None:
        return None, 0, 0, False, []
    ref_to_query = {r: q for q, r in read.get_aligned_pairs()
                    if r is not None and q is not None}
    positions_of = {pos: pos for pos in var_positions}
    return _score_read(ref_to_query, read.query_sequence, positions_of,
                       expected, ref_names, varpos_window_map, n_windows)


def assign_read_by_snvs_msa(read: SamRead, ref_to_msa_mapping, var_cols,
                            expected, ref_names, varcol_window_map=None,
                            n_windows=N_WINDOWS):
    """MSA-mode scoring: positions translate through the read's mapped
    reference into MSA columns."""
    if read.query_sequence is None:
        return None, 0, 0, False, []
    ref_to_query = {r: q for q, r in read.get_aligned_pairs()
                    if r is not None and q is not None}
    pos_mapping = ref_to_msa_mapping.get(read.reference_name, {})
    var_set = set(var_cols)
    positions_of = {rpos: col for rpos, col in pos_mapping.items()
                    if col in var_set and rpos in ref_to_query}
    return _score_read(ref_to_query, read.query_sequence, positions_of,
                       expected, ref_names, varcol_window_map, n_windows)


def build_msa_via_pairwise(refs: Dict[str, str]):
    """Anchor-based MSA: align every reference globally to the longest
    one; columns indexed by anchor position. Returns (msa_cols,
    ref_to_msa) with the reference's structure."""
    names = list(refs)
    anchor = max(names, key=lambda n: len(refs[n]))
    anchor_seq = refs[anchor]
    print(f'  Anchor reference: {anchor} ({len(anchor_seq)} bp)')

    ref_to_anchor: Dict[str, Dict[int, int]] = {
        anchor: {i: i for i in range(len(anchor_seq))}}
    for name in names:
        if name == anchor:
            continue
        aa, bb, _ = global_align(anchor_seq, refs[name], match=1,
                                 mismatch=-1, gap=-2)
        mapping = {}
        a_pos = b_pos = 0
        for x, y in zip(aa, bb):
            if x != '-' and y != '-':
                mapping[b_pos] = a_pos
            if x != '-':
                a_pos += 1
            if y != '-':
                b_pos += 1
        ref_to_anchor[name] = mapping

    anchor_to_ref = {
        name: {anc: ref for ref, anc in ref_to_anchor[name].items()}
        for name in names}
    msa_cols = []
    ref_to_msa: Dict[str, Dict[int, int]] = {n: {} for n in names}
    for anc_pos in range(len(anchor_seq)):
        col = {}
        for name in names:
            ref_pos = anchor_to_ref[name].get(anc_pos)
            col[name] = (None if ref_pos is None
                         else (ref_pos, refs[name][ref_pos]))
        msa_cols.append(col)
        idx = len(msa_cols) - 1
        for name in names:
            if col[name] is not None:
                ref_to_msa[name][col[name][0]] = idx
    return msa_cols, ref_to_msa


def find_variable_msa_columns(msa_cols, ref_names) -> List[int]:
    var_cols = []
    for idx, col in enumerate(msa_cols):
        bases = {col[n][1] for n in ref_names if col[n] is not None}
        present = sum(col[n] is not None for n in ref_names)
        if present >= 2 and len(bases) > 1:
            var_cols.append(idx)
    return var_cols


def build_expected_bases_msa(msa_cols, var_cols, ref_names):
    return {idx: {n: (msa_cols[idx][n][1]
                      if msa_cols[idx][n] is not None else None)
                  for n in ref_names}
            for idx in var_cols}


def _snv_counts(sam_path: str, refs, assign_fn, min_pid: float,
                min_align_frac: float):
    """Shared per-SAM counting loop with quality filters + chimera stats."""
    ref_lengths = {n: len(s) for n, s in refs.items()}
    counts: Dict[str, int] = defaultdict(int)
    stats = {'total_primary': 0, 'pass_filters': 0, 'assigned': 0,
             'ambiguous': 0, 'no_informative': 0, 'reassigned': 0,
             'chimera': 0}
    chimera_window_counts = [0] * N_WINDOWS
    chimera_n_disagree: Dict[int, int] = defaultdict(int)
    for r in iter_sam(sam_path):
        if r.is_unmapped or r.is_secondary or r.is_supplementary:
            continue
        stats['total_primary'] += 1
        if r.reference_name not in ref_lengths:
            continue
        qlen = r.query_alignment_length or 0
        if qlen < min_align_frac * ref_lengths[r.reference_name]:
            continue
        nm = r.get_tag('NM') if r.has_tag('NM') else 0
        if 1.0 - nm / max(1, qlen) < min_pid:
            continue
        stats['pass_filters'] += 1
        best, margin, _, is_chimera, disagree = assign_fn(r)
        if best is None:
            stats['no_informative'] += 1
            continue
        if margin < 1:
            stats['ambiguous'] += 1
            continue
        if is_chimera:
            stats['chimera'] += 1
            chimera_n_disagree[len(disagree)] += 1
            for wi in disagree:
                chimera_window_counts[wi] += 1
            continue
        stats['assigned'] += 1
        if best != r.reference_name:
            stats['reassigned'] += 1
        counts[best] += 1
    return dict(counts), stats, {
        'window_counts': chimera_window_counts,
        'n_disagree_dist': dict(chimera_n_disagree)}


def snv_based_counts_direct(sam_path, refs, var_positions, expected,
                            min_pid=0.95, min_align_frac=0.90):
    ref_names = list(refs)
    window_map = build_varpos_window_map(var_positions, N_WINDOWS)
    return _snv_counts(
        sam_path, refs,
        lambda r: assign_read_by_snvs(r, var_positions, expected,
                                      ref_names, window_map),
        min_pid, min_align_frac)


def snv_based_counts_msa(sam_path, refs, ref_to_msa, var_cols, expected,
                         varcol_window_map, min_pid=0.90,
                         min_align_frac=0.90):
    ref_names = list(refs)
    return _snv_counts(
        sam_path, refs,
        lambda r: assign_read_by_snvs_msa(r, ref_to_msa, var_cols,
                                          expected, ref_names,
                                          varcol_window_map),
        min_pid, min_align_frac)


def write_counts_csv(counts: Dict[str, int], out_csv: str) -> None:
    total = sum(counts.values())
    with open(out_csv, 'w', newline='') as f:
        w = csv.DictWriter(f, fieldnames=['Sequence', 'Read Count',
                                          'Proportion'])
        w.writeheader()
        for ref, c in sorted(counts.items(), key=lambda kv: -kv[1]):
            w.writerow({'Sequence': ref, 'Read Count': c,
                        'Proportion': c / total if total else 0.0})


def run_stage2(config: dict, skip_existing: bool = False) -> None:
    import pandas as pd

    print(f"\n  STAGE 2: SNV-based Read Assignment — {config['name']}")
    output_dir = config['output_dir']
    os.makedirs(output_dir, exist_ok=True)
    refs = load_references(config['reference_fasta'])
    ref_names = list(refs)
    mode = config['scoring_mode']
    if mode == 'direct':
        var_positions = find_variable_positions(refs)
        expected = build_expected_bases(refs, var_positions)
        print(f'  {len(refs)} references, {len(var_positions)} variable '
              'positions (direct)')
    elif mode == 'msa':
        msa_cols, ref_to_msa = build_msa_via_pairwise(refs)
        var_cols = find_variable_msa_columns(msa_cols, ref_names)
        expected_msa = build_expected_bases_msa(msa_cols, var_cols,
                                                ref_names)
        varcol_window_map = build_varpos_window_map(var_cols, N_WINDOWS)
        print(f'  {len(refs)} references, {len(msa_cols)} MSA columns, '
              f'{len(var_cols)} variable (msa)')
    else:
        raise ValueError(f'Unknown scoring_mode: {mode}')

    sam_dir = config.get('sam_dir', output_dir)
    all_counts, all_sample_stats = [], []
    total_stats: Dict[str, int] = defaultdict(int)
    total_cw = [0] * N_WINDOWS
    total_nd: Dict[int, int] = defaultdict(int)

    for sample, _ in config['samples']:
        sam_path = os.path.join(sam_dir, f'{sample}.sam')
        if not os.path.exists(sam_path):
            sam_path = os.path.join(output_dir, f'{sample}.sam')
        if not os.path.exists(sam_path):
            fq = os.path.join(sam_dir, f'{sample}_filtered.fastq')
            if not os.path.exists(fq):
                fq = os.path.join(output_dir, f'{sample}_filtered.fastq')
            if os.path.exists(fq):
                sam_path = os.path.join(output_dir, f'{sample}.sam')
                align_reads(fq, config['reference_fasta'], sam_path)
            else:
                print(f'  [skip] {sample} — no SAM or filtered FASTQ')
                continue
        counts_csv = os.path.join(output_dir,
                                  f'{sample}_counts_primary.csv')
        stats_json = os.path.join(output_dir, f'{sample}_stats.json')
        if skip_existing and os.path.exists(counts_csv):
            df = pd.read_csv(counts_csv)
            df['Sample'] = sample
            all_counts.append(df)
            # keep the skipped sample's read-fate row: otherwise a partial
            # rerun overwrites read_fate_stats.csv with only new samples
            if os.path.exists(stats_json):
                with open(stats_json) as f:
                    prev = json.load(f)
                all_sample_stats.append({'Sample': sample, **prev})
                for k, v in prev.items():
                    total_stats[k] += v
            else:
                print(f'  [skip] {sample}: no cached stats '
                      f'({stats_json} missing) — read_fate_stats.csv will '
                      'lack this sample')
            continue
        if mode == 'direct':
            counts, sstats, cw = snv_based_counts_direct(
                sam_path, refs, var_positions, expected,
                min_pid=config['min_pid'],
                min_align_frac=config['min_align_frac'])
        else:
            counts, sstats, cw = snv_based_counts_msa(
                sam_path, refs, ref_to_msa, var_cols, expected_msa,
                varcol_window_map, min_pid=config['min_pid'],
                min_align_frac=config['min_align_frac'])
        for wi in range(N_WINDOWS):
            total_cw[wi] += cw['window_counts'][wi]
        for n, c in cw['n_disagree_dist'].items():
            total_nd[n] += c
        write_counts_csv(counts, counts_csv)
        print(f"  {sample}: {sstats['pass_filters']} pass -> "
              f"{sstats['assigned']} assigned, "
              f"{sstats['ambiguous']} ambiguous, "
              f"{sstats['chimera']} chimera")
        all_sample_stats.append({'Sample': sample, **sstats})
        with open(stats_json, 'w') as f:
            json.dump(sstats, f)
        for k, v in sstats.items():
            total_stats[k] += v
        df = pd.read_csv(counts_csv)
        df['Sample'] = sample
        all_counts.append(df)

    if all_counts:
        merged = pd.concat(all_counts, ignore_index=True)
        merged.to_csv(os.path.join(
            output_dir, 'all_timepoints_read_counts_primary.csv'),
            index=False)
    if all_sample_stats:
        pd.DataFrame(all_sample_stats).to_csv(
            os.path.join(output_dir, 'read_fate_stats.csv'), index=False)
    if total_stats.get('chimera', 0) > 0:
        pd.DataFrame([{'window': wi,
                       'chimera_disagree_count': total_cw[wi]}
                      for wi in range(N_WINDOWS)]).to_csv(
            os.path.join(output_dir, 'chimera_window_stats.csv'),
            index=False)
        pd.DataFrame([{'n_disagreeing_windows': n, 'chimera_count': c}
                      for n, c in sorted(total_nd.items())]).to_csv(
            os.path.join(output_dir, 'chimera_ndisagree_stats.csv'),
            index=False)


# ---------------------------------------------------------------------------
# Stage 3: fold changes
# ---------------------------------------------------------------------------

def parse_sample_info(sample_name: str) -> Tuple[int, int]:
    """'T{n}_rep{m}' -> (n, m)."""
    parts = sample_name.split('_')
    return int(parts[0][1:]), int(parts[1][3:])


def calculate_cumulative_fc_per_replicate(df, timepoint_to_hours):
    """Cumulative log2 proportion fold change from the earliest timepoint
    at which each sequence was detected."""
    import pandas as pd

    df = df.copy()
    df['Timepoint'] = df['Sample'].apply(lambda s: parse_sample_info(s)[0])
    df['Replicate'] = df['Sample'].apply(lambda s: parse_sample_info(s)[1])
    df['Hours'] = df['Timepoint'].apply(
        lambda t: timepoint_to_hours.get(t, float(t)))
    rows = []
    for (seq, rep), sub in df.groupby(['Sequence', 'Replicate']):
        sub = sub.sort_values('Timepoint')
        detected = sub[sub['Proportion'] > 0]
        baseline_prop = detected['Proportion'].iloc[0] if len(detected) \
            else 0.0
        baseline_tp = detected['Timepoint'].iloc[0] if len(detected) else 0
        prev = None
        for _, row in sub.iterrows():
            curr = row['Proportion']
            fc = (np.log2(curr / prev)
                  if prev is not None and prev > 0 and curr > 0 else 0.0)
            if row['Timepoint'] <= baseline_tp or baseline_prop <= 0 \
                    or curr <= 0:
                cum = 0.0
            else:
                cum = np.log2(curr / baseline_prop)
            prev = curr
            rows.append({'Sequence': seq, 'Replicate': rep,
                         'Timepoint': row['Timepoint'],
                         'Hours': row['Hours'],
                         'Read_Count': row['Read Count'],
                         'Proportion': curr, 'Fold_Change': fc,
                         'Cumulative_Fold_Change': cum})
    return pd.DataFrame(rows)


def compute_signed_auc(cum_df):
    """Signed area under the cumulative-log2FC-vs-hours curve."""
    import pandas as pd

    rows = []
    for (seq, rep), sub in cum_df.groupby(['Sequence', 'Replicate']):
        sub = sub[['Hours', 'Cumulative_Fold_Change']].dropna() \
            .sort_values('Hours')
        trapezoid = getattr(np, 'trapezoid', None) or np.trapz
        auc = (trapezoid(sub['Cumulative_Fold_Change'].to_numpy(),
                         sub['Hours'].to_numpy())
               if len(sub) >= 2 else np.nan)
        rows.append({'Sequence': seq, 'Replicate': rep, 'SignedAUC': auc})
    return pd.DataFrame(rows)


def compute_t0_to_tfinal_fold_changes(df, max_timepoint):
    import pandas as pd

    df = df.copy()
    df['Timepoint'] = df['Sample'].apply(lambda s: parse_sample_info(s)[0])
    df['Replicate'] = df['Sample'].apply(lambda s: parse_sample_info(s)[1])
    t0 = df[df['Timepoint'] == 0]
    tf = df[df['Timepoint'] == max_timepoint]
    rows = []
    for seq in df['Sequence'].unique():
        for rep in df['Replicate'].unique():
            r0 = t0[(t0['Sequence'] == seq) & (t0['Replicate'] == rep)]
            rf = tf[(tf['Sequence'] == seq) & (tf['Replicate'] == rep)]
            if r0.empty or rf.empty:
                continue
            c0, cf = r0['Read Count'].iloc[0], rf['Read Count'].iloc[0]
            p0, pf = r0['Proportion'].iloc[0], rf['Proportion'].iloc[0]
            rows.append({
                'Sequence': seq, 'Replicate': rep,
                'Count_log2FC': (np.log2(cf / c0)
                                 if c0 > 0 and cf > 0 else np.nan),
                'Prop_log2FC': (np.log2(pf / p0)
                                if p0 > 0 and pf > 0 else np.nan)})
    return pd.DataFrame(rows)


def run_stage3(config: dict) -> None:
    import pandas as pd

    print(f"\n  STAGE 3: Fold Changes — {config['name']}")
    output_dir = config['output_dir']
    merged_csv = os.path.join(output_dir,
                              'all_timepoints_read_counts_primary.csv')
    if not os.path.exists(merged_csv):
        print(f'  [error] run stage 2 first ({merged_csv} missing)')
        return
    df = pd.read_csv(merged_csv)
    name_map = config.get('accession_to_name') or {}
    if name_map:
        df['Sequence'] = df['Sequence'].map(lambda x: name_map.get(x, x))
    exclude = set(config.get('exclude_phages') or [])
    if exclude:
        df = df[~df['Sequence'].isin(exclude)]
    max_tp = config['max_timepoint']
    hours = {int(k): v for k, v in config['timepoint_to_hours'].items()}

    cum_df = calculate_cumulative_fc_per_replicate(df, hours)
    cum_df = cum_df[cum_df['Timepoint'] <= max_tp].copy()
    cum_df.to_csv(os.path.join(
        output_dir, 'cumulative_proportion_fold_changes.csv'), index=False)
    compute_signed_auc(cum_df).to_csv(os.path.join(
        output_dir, 'signed_auc_cumulative_log2FC.csv'), index=False)
    compute_t0_to_tfinal_fold_changes(df, max_tp).to_csv(os.path.join(
        output_dir, 'fold_change_count_vs_proportion.csv'), index=False)
    print('  Stage 3 complete.')


# ---------------------------------------------------------------------------
# Stage 4: plots
# ---------------------------------------------------------------------------

def _plt():
    import matplotlib
    matplotlib.use('Agg')
    import matplotlib.pyplot as plt
    return plt


def plot_log2fc_lineplot(df, output_dir: str) -> None:
    """Mean +/- SD cumulative log2FC per sequence over hours."""
    plt = _plt()
    fig, ax = plt.subplots(figsize=(9, 6))
    for seq, sub in df.groupby('Sequence'):
        agg = sub.groupby('Hours')['Cumulative_Fold_Change'] \
            .agg(['mean', 'std'])
        ax.errorbar(agg.index, agg['mean'], yerr=agg['std'].fillna(0),
                    marker='o', capsize=2, label=str(seq))
    ax.axhline(0, color='grey', lw=0.8)
    ax.set_xlabel('Hours')
    ax.set_ylabel('Cumulative log2 fold change (proportion)')
    ax.legend(fontsize=7, ncol=2)
    fig.tight_layout()
    fig.savefig(os.path.join(output_dir, 'log2fc_lineplot.pdf'))
    plt.close(fig)


def plot_log2fc_facet(df, output_dir: str) -> None:
    """One small panel per sequence, replicates as separate lines."""
    plt = _plt()
    seqs = sorted(df['Sequence'].unique())
    ncols = 4
    nrows = (len(seqs) + ncols - 1) // ncols
    fig, axes = plt.subplots(nrows, ncols,
                             figsize=(3 * ncols, 2.2 * nrows),
                             squeeze=False, sharex=True, sharey=True)
    for i, seq in enumerate(seqs):
        ax = axes[i // ncols][i % ncols]
        for rep, sub in df[df['Sequence'] == seq].groupby('Replicate'):
            sub = sub.sort_values('Hours')
            ax.plot(sub['Hours'], sub['Cumulative_Fold_Change'],
                    marker='.', label=f'rep{rep}')
        ax.axhline(0, color='grey', lw=0.6)
        ax.set_title(str(seq), fontsize=8)
    for j in range(len(seqs), nrows * ncols):
        axes[j // ncols][j % ncols].axis('off')
    fig.tight_layout()
    fig.savefig(os.path.join(output_dir, 'log2fc_facet.pdf'))
    plt.close(fig)


def plot_auc(auc_df, output_dir: str, title: str) -> None:
    """Signed-AUC bars (mean across replicates, per-replicate points)."""
    plt = _plt()
    means = auc_df.groupby('Sequence')['SignedAUC'].mean() \
        .sort_values(ascending=False)
    fig, ax = plt.subplots(figsize=(max(6, 0.5 * len(means)), 5))
    ax.bar(range(len(means)), means.values, color='#88a0c8')
    for i, seq in enumerate(means.index):
        pts = auc_df[auc_df['Sequence'] == seq]['SignedAUC']
        ax.scatter([i] * len(pts), pts, color='black', s=8, zorder=3)
    ax.set_xticks(range(len(means)))
    ax.set_xticklabels(means.index, rotation=60, ha='right', fontsize=7)
    ax.axhline(0, color='grey', lw=0.8)
    ax.set_ylabel('Signed AUC of cumulative log2FC')
    ax.set_title(title)
    fig.tight_layout()
    fig.savefig(os.path.join(output_dir, 'signed_auc_bars.pdf'))
    plt.close(fig)


def plot_read_fate(stats_df, output_dir: str, title: str,
                   max_timepoint: int) -> None:
    """Stacked read-fate proportions (assigned/ambiguous/chimera/...) per
    sample."""
    plt = _plt()
    cats = ['assigned', 'ambiguous', 'chimera', 'no_informative']
    stats_df = stats_df.copy()
    denom = stats_df['pass_filters'].replace(0, np.nan)
    fig, ax = plt.subplots(figsize=(max(7, 0.35 * len(stats_df)), 5))
    bottom = np.zeros(len(stats_df))
    for cat in cats:
        frac = (stats_df[cat] / denom).fillna(0).to_numpy()
        ax.bar(range(len(stats_df)), frac, bottom=bottom, label=cat)
        bottom += frac
    ax.set_xticks(range(len(stats_df)))
    ax.set_xticklabels(stats_df['Sample'], rotation=60, ha='right',
                       fontsize=7)
    ax.set_ylabel('Fraction of filter-passing reads')
    ax.set_title(title)
    ax.legend(fontsize=8)
    fig.tight_layout()
    fig.savefig(os.path.join(output_dir, 'read_fate.pdf'))
    plt.close(fig)


def run_stage4(config: dict) -> None:
    import pandas as pd

    print(f"\n  STAGE 4: Visualization — {config['name']}")
    output_dir = config['output_dir']
    cum_csv = os.path.join(output_dir,
                           'cumulative_proportion_fold_changes.csv')
    if not os.path.exists(cum_csv):
        print('  [error] run stage 3 first')
        return
    cum_df = pd.read_csv(cum_csv)
    plot_log2fc_lineplot(cum_df, output_dir)
    plot_log2fc_facet(cum_df, output_dir)
    auc_csv = os.path.join(output_dir, 'signed_auc_cumulative_log2FC.csv')
    auc_df = (pd.read_csv(auc_csv) if os.path.exists(auc_csv)
              else compute_signed_auc(cum_df))
    plot_auc(auc_df, output_dir, config['name'])
    stats_csv = os.path.join(output_dir, 'read_fate_stats.csv')
    if os.path.exists(stats_csv):
        plot_read_fate(pd.read_csv(stats_csv), output_dir,
                       config['name'], config['max_timepoint'])
    print(f'  Plots in {output_dir}')


# ---------------------------------------------------------------------------
# CLI
# ---------------------------------------------------------------------------

def load_dataset_configs(config_path: str) -> List[dict]:
    """YAML -> list of dataset config dicts (top-level key `datasets`)."""
    with open(config_path) as f:
        raw = yaml.safe_load(f)
    datasets = raw['datasets'] if isinstance(raw, dict) and \
        'datasets' in raw else raw
    out = []
    for d in datasets:
        d = dict(d)
        d['samples'] = [tuple(s) for s in d['samples']]
        out.append(d)
    return out


def main():
    parser = argparse.ArgumentParser(
        description='Phage competition sequencing analysis')
    parser.add_argument('--config', required=True,
                        help='YAML with a `datasets:` list (fields: name, '
                             'raw_fastq_dir, reference_fasta, samples, '
                             'scoring_mode, min_pid, min_align_frac, '
                             'accession_to_name, exclude_phages, '
                             'timepoint_to_hours, max_timepoint, '
                             'output_dir)')
    parser.add_argument('--datasets', default=None,
                        help='comma-separated dataset names (default all)')
    parser.add_argument('--stages', default='1234')
    parser.add_argument('--skip-existing', action='store_true')
    args = parser.parse_args()

    configs = load_dataset_configs(args.config)
    if args.datasets:
        wanted = set(args.datasets.split(','))
        configs = [c for c in configs if c['name'] in wanted]
    stages = set(args.stages)
    for config in configs:
        print(f"\n### {config['name']} (stages {args.stages}) ###")
        if '1' in stages:
            run_stage1(config, skip_existing=args.skip_existing)
        if '2' in stages:
            run_stage2(config, skip_existing=args.skip_existing)
        if '3' in stages:
            run_stage3(config)
        if '4' in stages:
            run_stage4(config)
    print('\nDone.')


if __name__ == '__main__':
    main()
