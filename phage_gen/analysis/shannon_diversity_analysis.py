"""Shannon diversity of clustered genome sets.

Python reimplementation of the reference bash pipeline
`phage_gen/analysis/shannon_diversity_analysis.sh`: for every FASTA
(arbitrary control sets plus evo qc4 output dirs), cluster at 99% identity
with mmseqs, compute the Shannon entropy (natural log and bits) of the
cluster-size distribution, and append one row per FASTA to a summary CSV
with the same columns:

    source_type,model,temp,bp,dir,filename,n_sequences,n_clusters,
    shannon_ln,shannon_bits,reason

Cached clusterings (existing clusters.tsv) are reused, mirroring the
reference's resume behavior.

Usage:
    python -m phage_gen.analysis.shannon_diversity_analysis \
        --controls-dir controls/ --analysis-dir runs/ \
        --cluster-root work/ --summary-csv work/summary.csv [--threads 16]
"""

from __future__ import annotations

import argparse
import csv
import math
import os
import re
import subprocess
from collections import Counter
from pathlib import Path
from typing import Dict, Iterable, List, Optional, Tuple

SUMMARY_COLUMNS = ['source_type', 'model', 'temp', 'bp', 'dir', 'filename',
                   'n_sequences', 'n_clusters', 'shannon_ln',
                   'shannon_bits', 'reason']


def validate_fasta(path: Path) -> bool:
    if not path.is_file() or path.stat().st_size == 0:
        return False
    with open(path) as f:
        return any(line.startswith('>') for line in f)


def count_fasta_records(path: Path) -> int:
    with open(path) as f:
        return sum(1 for line in f if line.startswith('>'))


def shannon_from_cluster_tsv(tsv_path: Path) -> Tuple[int, float, float]:
    """(n_clusters, H_nat, H_bits) of cluster sizes from an mmseqs
    createtsv membership table (representative, member per line).

    Like the reference awk, the column with fewer distinct values is taken
    as the representative column."""
    col1: Counter = Counter()
    col2: Counter = Counter()
    total = 0
    with open(tsv_path) as f:
        for line in f:
            parts = line.rstrip('\n').split('\t')
            if len(parts) < 2:
                continue
            col1[parts[0]] += 1
            col2[parts[1]] += 1
            total += 1
    if total == 0:
        return 0, 0.0, 0.0
    reps = col1 if len(col1) <= len(col2) else col2
    h = -sum((c / total) * math.log(c / total) for c in reps.values())
    return len(reps), h, h / math.log(2)


def run_mmseqs_cluster(fasta: Path, outbase: Path, threads: int,
                       min_seq_id: float = 0.99) -> Optional[Path]:
    """Cluster the FASTA; returns the clusters.tsv path (reusing caches)."""
    db = outbase / 'mmseqs_db'
    res = outbase / 'mmseqs_results'
    tmp = outbase / 'tmp'
    log = outbase / 'mmseqs.log'
    for d in (db, res, tmp):
        d.mkdir(parents=True, exist_ok=True)
    tsv = res / 'clusters.tsv'
    if tsv.is_file() and tsv.stat().st_size > 0:
        return tsv
    env = dict(os.environ)
    env.pop('MMSEQS_CALL_DEPTH', None)
    with open(log, 'a') as lf:
        run = lambda cmd: subprocess.run(cmd, stdout=lf, stderr=lf,
                                         env=env, check=True)
        try:
            if not (db / 'sequences').exists():
                run(['mmseqs', 'createdb', str(fasta),
                     str(db / 'sequences')])
            run(['mmseqs', 'cluster', str(db / 'sequences'),
                 str(res / 'clusters'), str(tmp),
                 '--min-seq-id', str(min_seq_id),
                 '--threads', str(threads)])
            run(['mmseqs', 'createtsv', str(db / 'sequences'),
                 str(db / 'sequences'), str(res / 'clusters'), str(tsv)])
        except (subprocess.CalledProcessError, FileNotFoundError) as e:
            print(f'mmseqs failed for {fasta}: {e}')
            return None
    return tsv if tsv.is_file() else None


def _parse_run_name(run_name: str) -> Tuple[str, str, str]:
    """evoX_tempYY_ZZbp -> (model, tempYY, ZZ)."""
    model = run_name.split('_')[0]
    temp_m = re.search(r'temp\d+', run_name)
    bp_m = re.search(r'(\d+)bp', run_name)
    return (model, temp_m.group(0) if temp_m else 'NA',
            bp_m.group(1) if bp_m else 'NA')


def analyze(controls_dir: Optional[Path], analysis_dir: Optional[Path],
            cluster_root: Path, summary_csv: Path,
            threads: int = 16) -> List[dict]:
    cluster_root.mkdir(parents=True, exist_ok=True)
    rows: List[dict] = []

    def record(source_type, model, temp, bp, dir_name, base, nseq, ncl,
               hnat, hbit, reason):
        rows.append(dict(zip(SUMMARY_COLUMNS,
                             [source_type, model, temp, bp, dir_name, base,
                              nseq, ncl, round(hnat, 10), round(hbit, 10),
                              reason])))

    def process(fasta: Path, outtag: str, source_type: str, model: str,
                temp: str, bp: str, dir_name: str):
        base = fasta.name
        if not validate_fasta(fasta):
            record(source_type, model, temp, bp, dir_name, base, 0, 0, 0,
                   0, 'invalid_fasta')
            return
        nseq = count_fasta_records(fasta)
        outbase = cluster_root / outtag
        cached = (outbase / 'mmseqs_results' / 'clusters.tsv')
        reason = 'cached' if cached.is_file() and cached.stat().st_size \
            else 'ok'
        tsv = run_mmseqs_cluster(fasta, outbase, threads)
        if tsv is None:
            record(source_type, model, temp, bp, dir_name, base, nseq, 0,
                   0, 0, 'mmseqs_failed')
            return
        ncl, hnat, hbit = shannon_from_cluster_tsv(tsv)
        record(source_type, model, temp, bp, dir_name, base, nseq, ncl,
               hnat, hbit, reason)

    if controls_dir and controls_dir.is_dir():
        for fasta in sorted(controls_dir.iterdir()):
            if fasta.suffix not in ('.fa', '.fna', '.fasta'):
                continue
            # include the suffix in the tag: x.fa and x.fasta must not
            # share (and silently reuse) one clustering cache dir
            tag = f"controls_{fasta.name.replace('.', '_')}"
            process(fasta, tag, 'controls',
                    'controls', 'NA', 'NA', controls_dir.name)

    if analysis_dir and analysis_dir.is_dir():
        for subdir in sorted(analysis_dir.glob('evo*_temp*_*bp')):
            if not subdir.is_dir():
                continue
            model, temp, bp = _parse_run_name(subdir.name)
            fasta = subdir / 'qc4_homology_filter_seqs.fasta'
            process(fasta, f'{model}_{temp}_{bp}bp_qc4', 'evo_qc4', model,
                    temp, bp, subdir.name)

    with open(summary_csv, 'w', newline='') as f:
        writer = csv.DictWriter(f, fieldnames=SUMMARY_COLUMNS)
        writer.writeheader()
        writer.writerows(rows)
    print(f'Summary written to {summary_csv} ({len(rows)} rows)')
    return rows


def main():
    parser = argparse.ArgumentParser(
        description='Shannon diversity of mmseqs-clustered genome sets')
    parser.add_argument('--controls-dir', type=Path, default=None)
    parser.add_argument('--analysis-dir', type=Path, default=None)
    parser.add_argument('--cluster-root', type=Path, required=True)
    parser.add_argument('--summary-csv', type=Path, required=True)
    parser.add_argument('--threads', type=int, default=16)
    args = parser.parse_args()
    analyze(args.controls_dir, args.analysis_dir, args.cluster_root,
            args.summary_csv, threads=args.threads)


if __name__ == '__main__':
    main()
