"""Standalone bacteriophage CDS prediction + genome annotation CLI.

Parity with reference `phage_gen/analysis/genome_annotator.py` (same CLI
flags, output tree, and stage structure): optionally pseudo-circularize
genomes, call ORFs (orfipy / prodigal / pyrodigal-gv), search the proteins
against an MMseqs2 database, join functional annotations, and emit per-
genome GFF (and optionally GenBank) files plus lovis4u visualizations.

Reuses the shared primitives from the filtering pipeline (SURVEY.md §2.E):
pseudo-circularization, orfipy/prodigal wrappers, mmseqs search, GFF/GBK
writers, annotation joins.

Usage:
    python -m phage_gen.analysis.genome_annotator \
        -i genomes.fasta -d /path/to/mmseqs_db -o results/ \
        [--orf-caller orfipy] [--annotation-file annot.tsv] \
        [--visualize --reference-genome ref.gff] [--create-gbk]
"""

from __future__ import annotations

import argparse
import os
import shutil
import subprocess
from pathlib import Path
from typing import Dict, Optional

from evo_tpu.io.fasta import iter_fasta, write_fasta
from phage_gen.pipelines.genome_design_filtering_pipeline import (
    mmseqs_search_proteins,
    append_upstream_of_last_frame_stop,
    assign_numeric_genome_ids,
    batch_convert_gff_to_gbk,
    create_gff_file,
    extract_orf_positions_from_protein_database_hits,
    mmseqs_results_to_df,
    parse_mmseqs_results,
    run_orfipy,
    run_prodigal,
)
from phage_gen.pipelines.genetic_architecture_visualization import (
    run_lovis4u_pairwise,
)


def run_pyrodigal_gv(input_sequences: str, output_orf_file: str,
                     output_protein_file: str) -> None:
    """ORF calling with pyrodigal-gv (giant-virus-aware prodigal port)."""
    import pyrodigal_gv

    finder = pyrodigal_gv.ViralGeneFinder(meta=True)
    orf_names, orf_seqs, prot_names, prot_seqs = [], [], [], []
    for name, seq in iter_fasta(input_sequences):
        rid = name.split()[0]
        for i, gene in enumerate(finder.find_genes(seq.encode()), 1):
            header = (f'{rid}_{i} # {gene.begin} # {gene.end} # '
                      f'{gene.strand} # pyrodigal-gv')
            orf_names.append(header)
            orf_seqs.append(str(gene.sequence()))
            prot_names.append(header)
            prot_seqs.append(str(gene.translate()))
    write_fasta(output_orf_file, orf_names, orf_seqs, width=70)
    write_fasta(output_protein_file, prot_names, prot_seqs, width=70)


def run_mmseqs_search_proteins(query_fasta: str, mmseqs_db: str,
                               results_dir: str, output_csv: str,
                               descriptive_prefix: str, threads: int = 8,
                               sensitivity: float = 4.0,
                               e_value: float = 1e-3,
                               only_top_hits: bool = True):
    """mmseqs easy-search with an explicit E-value cutoff; delegates to
    the filtering pipeline's shared command builder so the two stay in
    sync."""
    if not os.path.isfile(query_fasta):
        raise FileNotFoundError(f'FASTA file not found: {query_fasta}')
    out = mmseqs_search_proteins(query_fasta, mmseqs_db, results_dir,
                                 threads=threads, sensitivity=sensitivity,
                                 e_value=e_value)
    return mmseqs_results_to_df(parse_mmseqs_results(out), query_fasta,
                                output_csv, descriptive_prefix,
                                only_top_hits)


def annotate_protein_hits(mmseqs_hits_file: str,
                          database_annotation_file: str):
    """Join annot/category by hit_label (PHROG-number fallback included)."""
    import pandas as pd
    hits = pd.read_csv(mmseqs_hits_file)
    annot = pd.read_csv(database_annotation_file, sep='\t')
    hits['protein_database_mmseqs_target'] = \
        hits['protein_database_mmseqs_target'].astype(str)
    if 'hit_label' in annot.columns:
        annot = annot.rename(columns={'hit_label':
                                      'protein_database_mmseqs_target'})
        annot['protein_database_mmseqs_target'] = \
            annot['protein_database_mmseqs_target'].astype(str)
        return hits.merge(
            annot[['protein_database_mmseqs_target', 'annot', 'category']],
            on='protein_database_mmseqs_target', how='left')
    if 'phrog' not in annot.columns:
        raise ValueError(
            "annotation file must have either a 'hit_label' column or a "
            "PHROGs-style 'phrog' column (with 'annot'/'category'); got "
            f'columns {list(annot.columns)[:8]}')
    # PHROGs-style table (phrog number key)
    annot['phrog_number'] = annot['phrog'].astype(str).str.extract(
        r'(\d+)')
    hits['phrog_number'] = hits['protein_database_mmseqs_target'] \
        .str.extract(r'phrog_(\d+)')
    merged = hits.merge(annot[['phrog_number', 'annot', 'category']],
                        on='phrog_number', how='left')
    return merged.drop(columns=['phrog_number'])


def batch_create_gff_files(genomes_fasta_file: str,
                           pseudocircular_genomes_fasta_file: str,
                           pseudocircular_orfs_fasta_file: str,
                           protein_database_hits_df,
                           output_dir: str) -> Dict[str, str]:
    """GFFs for every genome in the input FASTA; returns the id map."""
    os.makedirs(output_dir, exist_ok=True)
    all_ids = {name.split()[0]
               for name, _ in iter_fasta(genomes_fasta_file)}
    genome_id_map = assign_numeric_genome_ids(genomes_fasta_file, all_ids)
    orf_data = extract_orf_positions_from_protein_database_hits(
        genomes_fasta_file, pseudocircular_orfs_fasta_file,
        protein_database_hits_df, genome_id_map)
    for name, seq in iter_fasta(pseudocircular_genomes_fasta_file):
        rid = name.split()[0]
        if rid in genome_id_map:
            create_gff_file(orf_data, rid, genome_id_map[rid], seq,
                            output_dir)
    return genome_id_map


def main():
    parser = argparse.ArgumentParser(
        description='Bacteriophage CDS prediction and genome annotation. '
                    'Overwrites existing outputs.')
    parser.add_argument('-i', '--input', required=True,
                        help='Input genome FASTA file')
    parser.add_argument('-d', '--database', required=True,
                        help='Path to MMseqs2 protein database')
    parser.add_argument('-o', '--output', required=True,
                        help='Output directory')
    parser.add_argument('--orf-caller', default='orfipy',
                        choices=['prodigal', 'orfipy', 'pyrodigal-gv'])
    parser.add_argument('--skip-circularization', action='store_true')
    parser.add_argument('--start-codons', default='ATG')
    parser.add_argument('--stop-codons', default='TAA,TAG,TGA')
    parser.add_argument('--strand', choices=['f', 'r', 'b'], default='b')
    parser.add_argument('--min-orf-length', type=int, default=90)
    parser.add_argument('--max-orf-length', type=int, default=1800)
    parser.add_argument('-s', '--sensitivity', type=float, default=4.0)
    parser.add_argument('-t', '--threads', type=int, default=8)
    parser.add_argument('-e', '--e-value', type=float, default=1e-3)
    parser.add_argument('--annotation-file', default=None)
    parser.add_argument('--visualize', action='store_true')
    parser.add_argument('--reference-genome', default=None)
    parser.add_argument('--viz-workers', type=int, default=4)
    parser.add_argument('--create-gbk', action='store_true')
    args = parser.parse_args()

    import pandas as pd

    input_fasta = Path(args.input).resolve()
    if not input_fasta.exists():
        raise FileNotFoundError(f'Input FASTA not found: {args.input}')
    database = Path(args.database).resolve()

    output_dir = Path(args.output)
    output_dir.mkdir(parents=True, exist_ok=True)
    pseudocircular_dir = output_dir / 'pseudocircular_genomes'
    orfs_dir = output_dir / 'orfs'
    mmseqs_dir = output_dir / 'mmseqs_results'
    gff_dir = output_dir / 'gff_files'
    for d in (pseudocircular_dir, orfs_dir, mmseqs_dir, gff_dir):
        if d.exists():
            shutil.rmtree(d)
        d.mkdir(parents=True)

    # 1. pseudo-circularization
    if not args.skip_circularization:
        print('[1/6] Pseudo-circularizing genomes...')
        circ = pseudocircular_dir / 'pseudocircular_genomes.fasta'
        append_upstream_of_last_frame_stop(str(input_fasta), str(circ))
        input_for_orfs = gff_genomes = str(circ)
    else:
        print('[1/6] Skipping pseudo-circularization')
        input_for_orfs = gff_genomes = str(input_fasta)

    # 2. ORF calling
    print(f'[2/6] Predicting ORFs with {args.orf_caller}...')
    if args.orf_caller == 'prodigal':
        run_prodigal(input_for_orfs, str(orfs_dir / 'orfs.fasta'),
                     str(orfs_dir / 'proteins.fasta'))
        protein_fasta = str(orfs_dir / 'proteins.fasta')
    elif args.orf_caller == 'pyrodigal-gv':
        run_pyrodigal_gv(input_for_orfs, str(orfs_dir / 'orfs.fasta'),
                         str(orfs_dir / 'proteins.fasta'))
        protein_fasta = str(orfs_dir / 'proteins.fasta')
    else:
        run_orfipy(input_for_orfs, args.threads, args.start_codons,
                   args.stop_codons, args.strand, args.min_orf_length,
                   args.max_orf_length, str(orfs_dir), 'orfs_nt.fasta',
                   'orfs_aa_tmp.fasta', 'orfs_aa.fasta')
        protein_fasta = str(orfs_dir / 'orfs_aa.fasta')

    # 3. mmseqs search
    print('[3/6] MMseqs2 search...')
    mmseqs_csv = mmseqs_dir / 'mmseqs_hits.csv'
    hits_df = run_mmseqs_search_proteins(
        query_fasta=protein_fasta, mmseqs_db=str(database),
        results_dir=str(mmseqs_dir), output_csv=str(mmseqs_csv),
        descriptive_prefix='protein_database', threads=args.threads,
        sensitivity=args.sensitivity, e_value=args.e_value)
    print(f'  {len(hits_df)} protein hits')

    # 4. annotations
    if args.annotation_file:
        print('[4/6] Adding functional annotations...')
        hits_df = annotate_protein_hits(str(mmseqs_csv),
                                        args.annotation_file)
    else:
        print('[4/6] No annotation file; labeling hits Unknown')
        for col in ('annot', 'category'):
            if col not in hits_df.columns:
                hits_df[col] = 'Unknown'
    hits_df.to_csv(mmseqs_csv, index=False)

    # 5. GFF/GBK
    print('[5/6] Writing GFF files...')
    genome_id_map = batch_create_gff_files(
        genomes_fasta_file=str(input_fasta),
        pseudocircular_genomes_fasta_file=gff_genomes,
        pseudocircular_orfs_fasta_file=str(
            orfs_dir / ('orfs_nt.fasta' if args.orf_caller == 'orfipy'
                        else 'orfs.fasta')),
        protein_database_hits_df=hits_df,
        output_dir=str(gff_dir))
    pd.DataFrame(list(genome_id_map.items()),
                 columns=['genome_name', 'genome_id']).to_csv(
        output_dir / 'genome_id_mapping.csv', index=False)
    if args.create_gbk:
        gbk_dir = output_dir / 'gbk_files'
        if gbk_dir.exists():
            shutil.rmtree(gbk_dir)
        gbk_dir.mkdir(parents=True)
        batch_convert_gff_to_gbk(str(gff_dir), str(gbk_dir))

    # 6. visualization
    if args.visualize:
        print('[6/6] lovis4u visualizations...')
        viz_dir = output_dir / 'visualizations'
        if viz_dir.exists():
            shutil.rmtree(viz_dir)
        viz_dir.mkdir(parents=True)
        run_lovis4u_pairwise(str(gff_dir),
                             args.reference_genome is not None,
                             args.reference_genome, str(viz_dir),
                             max_workers=args.viz_workers)
    else:
        print('[6/6] Skipping visualization')
    print(f'Done. Results in {output_dir}')


if __name__ == '__main__':
    main()
