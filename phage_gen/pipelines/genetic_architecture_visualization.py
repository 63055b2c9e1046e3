"""Genome-map visualization via lovis4u (per-genome PDFs, optionally
against a reference genome).

Parity with reference
`phage_gen/pipelines/genetic_architecture_visualization.py`: each genome's
GFF is copied into its own temp dir (plus the reference GFF when
comparing), lovis4u renders it, and results land per-genome under the
output dir; genomes run in a process pool.

Usage:
    python -m phage_gen.pipelines.genetic_architecture_visualization \
        --gff-dir qc6_gff_files --output-dir vis_out \
        [--reference-gff ref.gff] [--workers 8]
"""

from __future__ import annotations

import argparse
import os
import shutil
import subprocess
import tempfile
import time
from concurrent.futures import ProcessPoolExecutor, as_completed
from pathlib import Path
from typing import Optional, Tuple


def run_lovis4u(input_gff_dir: str, output_dir: str) -> Tuple[int, str]:
    """lovis4u with the reference's flags: highlight + category colours +
    A4 portrait + locus-id prefixes (duplicate-ORF-name safety)."""
    result = subprocess.run(
        ['lovis4u', '-gff', input_gff_dir, '-hl', '--set-category-colour',
         '-c', 'A4p2', '-o', output_dir, '-alip'],
        capture_output=True, text=True)
    if result.returncode != 0:
        print(f'Error running lovis4u: {result.stderr}')
    return result.returncode, output_dir


def process_single_genome(gff_file: str, query_gff_dir: str,
                          visualize_against_reference_genome: bool,
                          reference_genome_gff: Optional[str],
                          output_results_dir: str):
    """Render one genome (optionally paired with the reference) in an
    isolated temp dir; returns (name, return_code, seconds)."""
    start = time.time()
    genome_name = gff_file.replace('.gff', '')
    # fresh tempfile dir + finally-cleanup: a dir inside the input GFF
    # tree that survives an exception would be silently REUSED (with
    # stale contents) on the next run
    temp_dir = Path(tempfile.mkdtemp(prefix=f'lovis4u_{genome_name}_'))
    try:
        shutil.copy(os.path.join(query_gff_dir, gff_file), temp_dir)
        if visualize_against_reference_genome and reference_genome_gff:
            shutil.copy(reference_genome_gff, temp_dir)
        code, _ = run_lovis4u(
            str(temp_dir),
            os.path.join(output_results_dir, genome_name))
        dt = time.time() - start
        print(f'Completed {genome_name} in {dt:.2f}s (rc={code})')
        return genome_name, code, dt
    except Exception as e:                                # noqa: BLE001
        print(f'Error processing {gff_file}: {e}')
        return gff_file, 1, time.time() - start
    finally:
        shutil.rmtree(temp_dir, ignore_errors=True)


def run_lovis4u_pairwise(query_gff_dir: str,
                         visualize_against_reference_genome: bool,
                         reference_genome_gff: Optional[str],
                         output_results_dir: str,
                         max_workers: Optional[int] = None) -> None:
    """Render every .gff in the directory, parallel across processes."""
    os.makedirs(output_results_dir, exist_ok=True)
    gff_files = sorted(f for f in os.listdir(query_gff_dir)
                       if f.endswith('.gff'))
    print(f'Visualizing {len(gff_files)} genomes...')
    failures = 0
    with ProcessPoolExecutor(max_workers=max_workers) as ex:
        futures = [
            ex.submit(process_single_genome, f, query_gff_dir,
                      visualize_against_reference_genome,
                      reference_genome_gff, output_results_dir)
            for f in gff_files]
        for fut in as_completed(futures):
            _, code, _ = fut.result()
            failures += int(code != 0)
    succeeded = len(gff_files) - failures
    print(f'Done: {succeeded}/{len(gff_files)} succeeded')
    return succeeded > 0 or not gff_files


def main():
    parser = argparse.ArgumentParser(
        description='lovis4u genome-map visualization')
    parser.add_argument('--gff-dir', required=True)
    parser.add_argument('--output-dir', required=True)
    parser.add_argument('--reference-gff', default=None)
    parser.add_argument('--workers', type=int, default=None)
    args = parser.parse_args()
    ok = run_lovis4u_pairwise(args.gff_dir,
                              args.reference_gff is not None,
                              args.reference_gff, args.output_dir,
                              max_workers=args.workers)
    if not ok:
        raise SystemExit(
            'lovis4u visualization failed for every genome (is lovis4u '
            'installed and on PATH?)')


if __name__ == '__main__':
    main()
