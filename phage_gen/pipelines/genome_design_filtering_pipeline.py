"""Phage genome-design filtering pipeline (qc1-qc6).

Functional parity with reference
`phage_gen/pipelines/genome_design_filtering_pipeline.py` — identical YAML
config schema (`genome_design_filtering_pipeline_config_template.yaml`),
stage structure, artifact/checkpoint filenames (qc1..qc6 counts/seqs
CSV+FASTA), and filter semantics — reimplemented with a small `Stage`
checkpointing helper instead of the reference's repeated inline blocks, and
without BioPython/biotite (plain FASTA IO; global alignment via a numpy
Needleman-Wunsch).

Stages:
  qc1 cleanup: EOS trimming, UMI ids, prompt strip/prepend
  qc2 nucleotide filters: charset, length, GC, homopolymers, dinucleotide
      frequencies, tetranucleotide usage deviation
  qc3 prodigal ORF filters: counts, lengths, coding density, AA homopolymers
  qc4 homology: pseudo-circularize, orfipy, mmseqs vs protein DB (>=N hits),
      training-data identity, CheckV, global reference identity,
      genetic-architecture score, tropism-protein identity
  qc5 diversification: mmseqs clustering, reference-identity removal,
      architecture-score removal
  qc6 annotation+synteny: GFF/GBK generation, PHROGs annotation, lovis4u,
      average protein identity, required genes, syntenic gene counts

Usage: python -m phage_gen.pipelines.genome_design_filtering_pipeline \
           --config <yaml>
Every stage checkpoints counts + sequences, so runs are restartable by
construction (reference behavior).
"""

from __future__ import annotations

import argparse
import itertools
import os
import re
import shutil
import subprocess
from collections import defaultdict
from pathlib import Path
from typing import Dict, List, Optional, Sequence, Set, Tuple

import numpy as np
import yaml

from evo_tpu.io.fasta import iter_fasta, write_fasta
from phage_gen.pipelines import genetic_architecture as ga


# ---------------------------------------------------------------------------
# IO helpers
# ---------------------------------------------------------------------------

def load_fasta_to_df(sequences_path: str):
    """FASTA -> DataFrame[id_prompt, sequence] (whitespace concatenated)."""
    import pandas as pd
    names, seqs = [], []
    for name, seq in iter_fasta(sequences_path):
        names.append(name.split()[0] if name else name)
        seqs.append(seq.replace(' ', ''))
    return pd.DataFrame({'id_prompt': names, 'sequence': seqs})


def load_fasta_to_df_eos_aware(sequences_path: str):
    """FASTA -> DataFrame, sequences cut at the first space (byte-0 EOS
    tokens detokenize to spaces — reference `load_fasta_to_df_eos_aware`)."""
    import pandas as pd
    ids, seqs = [], []
    with open(sequences_path) as f:
        name, chunks = None, []
        for line in f:
            line = line.rstrip('\n')
            if line.startswith('>'):
                if name is not None:
                    ids.append(name)
                    seqs.append(''.join(chunks).split(' ')[0])
                name = line[1:]
                chunks = []
            else:
                chunks.append(line)
        if name is not None:
            ids.append(name)
            seqs.append(''.join(chunks).split(' ')[0])
    return pd.DataFrame({'id_prompt': ids, 'sequence': seqs})


def load_csv_to_df(input_sequences: str):
    import pandas as pd
    return pd.read_csv(input_sequences)


def load_csv_to_df_eos_aware(input_sequences: str):
    import pandas as pd
    df = pd.read_csv(input_sequences)
    if 'sequence' in df.columns:
        df['sequence'] = df['sequence'].apply(lambda s: s.split(' ')[0])
    return df


def save_df_as_fasta(sequences_df, output_fasta: str) -> None:
    """DataFrame -> FASTA; extra columns serialize into the description."""
    desc_cols = [c for c in sequences_df.columns
                 if c not in ('id_prompt', 'sequence')]
    names, seqs = [], []
    for _, row in sequences_df.iterrows():
        desc = ' '.join(f'{c}:{row[c]}' for c in desc_cols)
        names.append(f"{row['id_prompt']} {desc}".strip())
        seqs.append(str(row['sequence']))
    write_fasta(output_fasta, names, seqs, width=70)


def replace_spaces_in_fasta_headers(input_fasta: str,
                                    output_fasta: str) -> None:
    with open(input_fasta) as fin, open(output_fasta, 'w') as fout:
        for line in fin:
            if line.startswith('>'):
                line = line.replace(' ', '_')
            fout.write(line)


def append_unique_identifier(df, column_name: str,
                             overwrite_sequence_ids: bool):
    """umi{i} ids (overwrite) or {id}_umi{i} suffixes."""
    import pandas as pd
    df = df.copy().reset_index(drop=True)
    for i in range(len(df)):
        if pd.notna(df.at[i, column_name]):
            df.at[i, column_name] = (
                f'umi{i + 1}' if overwrite_sequence_ids
                else f'{df.at[i, column_name]}_umi{i + 1}')
    return df


def remove_prefix_from_sequences(seq_df, column_name: str,
                                 string_to_remove: str):
    seq_df = seq_df.copy()
    seq_df[column_name] = seq_df[column_name].apply(
        lambda s: s[len(string_to_remove):]
        if s.startswith(string_to_remove) else s)
    return seq_df


def ensure_directory_exists(directory_path) -> None:
    Path(directory_path).mkdir(parents=True, exist_ok=True)
    print(f'Results will be saved to: {directory_path}')


def _fuzzy_remap_ids(df, id_col: str, sequences_df):
    """Replace truncated/partial ids with the full id_prompt they are a
    substring of (reference's `.str.contains` remap loop)."""
    full_ids = sequences_df['id_prompt'].astype(str).tolist()
    def remap(short):
        short = str(short)
        for full in full_ids:
            if short in full:
                return full
        return short
    df = df.copy()
    df[id_col] = df[id_col].apply(remap)
    return df


# ---------------------------------------------------------------------------
# qc2 — nucleotide filters
# ---------------------------------------------------------------------------

def valid_nt_chars(sequences_df):
    return sequences_df[sequences_df['sequence'].apply(
        lambda s: re.search(r'[^ACGTacgt]', s) is None)]


def valid_genome_len(sequences_df, length_range):
    lo, hi = min(length_range), max(length_range)
    df = sequences_df.copy()
    df['genome_length'] = df['sequence'].str.len()
    return df[(df['genome_length'] >= lo) & (df['genome_length'] <= hi)]


def calculate_gc_content(sequence: str) -> float:
    s = sequence.upper()
    return (s.count('G') + s.count('C')) / len(s) * 100


def valid_gc_content(sequences_df, gc_range):
    lo, hi = min(gc_range), max(gc_range)
    df = sequences_df.copy()
    df['gc_content'] = df['sequence'].apply(calculate_gc_content)
    return df[(df['gc_content'] >= lo) & (df['gc_content'] <= hi)]


def calculate_nt_homopolymer_len(sequence: str) -> int:
    longest = 0
    for m in re.finditer(r'(A+|C+|G+|T+)', sequence.upper()):
        longest = max(longest, len(m.group(0)))
    return longest


def valid_nt_homopolymer_len(sequences_df, homopolymer_range):
    lo, hi = min(homopolymer_range), max(homopolymer_range)
    df = sequences_df.copy()
    df['max_nt_homopolymer_length'] = df['sequence'].apply(
        calculate_nt_homopolymer_len)
    return df[(df['max_nt_homopolymer_length'] >= lo)
              & (df['max_nt_homopolymer_length'] <= hi)]


def calculate_dinucleotide_freqs(sequence: str) -> Dict[str, float]:
    """Non-overlapping-count frequencies of all 16 dinucleotides (str.count
    semantics, matching the reference)."""
    seq = sequence.upper()
    dinucs = [''.join(p) for p in itertools.product('ACGT', repeat=2)]
    counts = [seq.count(d) for d in dinucs]
    total = sum(counts) or 1
    return {d: c / total for d, c in zip(dinucs, counts)}


def valid_dinucleotide_content(sequences_df, dinucleotide_freq_range):
    lo, hi = min(dinucleotide_freq_range), max(dinucleotide_freq_range)
    return sequences_df[sequences_df['sequence'].apply(
        lambda s: all(lo <= f <= hi
                      for f in calculate_dinucleotide_freqs(s).values()))]


def calculate_tud(sequence: str, tetranucleotide: str) -> float:
    """Tetranucleotide usage departure, zero-order Markov expectation
    (reference formula, including its fixed G*A*T*C product)."""
    if len(tetranucleotide) != 4:
        raise ValueError('Tetranucleotide must be a 4-base DNA sequence.')
    seq = sequence.upper()
    n = len(seq)
    a, c = seq.count('A') / n, seq.count('C') / n
    g, t = seq.count('G') / n, seq.count('T') / n
    expected = g * a * t * c * n
    count = seq.count(tetranucleotide.upper())
    return count / expected if expected else 0.0


def valid_tud(sequences_df, tetranucleotide: str, tud_range):
    lo, hi = min(tud_range), max(tud_range)
    df = sequences_df.copy()
    df['tud'] = df['sequence'].apply(
        lambda s: calculate_tud(s, tetranucleotide))
    return df[(df['tud'] >= lo) & (df['tud'] <= hi)]


# ---------------------------------------------------------------------------
# qc3 — prodigal ORF filters
# ---------------------------------------------------------------------------

def run_prodigal(input_sequences: str, output_orf_file: str,
                 output_protein_file: str, sequences_df=None,
                 prodigal_path: Optional[str] = None) -> None:
    exe = prodigal_path or shutil.which('prodigal') or 'prodigal'
    subprocess.run(
        [exe, '-i', input_sequences, '-d', output_orf_file,
         '-a', output_protein_file, '-p', 'meta'],
        stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL, check=False)


def _orf_base_id(record_id: str) -> str:
    return '_'.join(record_id.split('_')[:-1]) if '_' in record_id \
        else record_id


def calculate_orf_counts(prodigal_orfs: str):
    import pandas as pd
    counts: Dict[str, int] = defaultdict(int)
    for name, _ in iter_fasta(prodigal_orfs):
        rid = name.split()[0]
        if '_' in rid:
            base = _orf_base_id(rid)
            counts[base] = max(counts[base], int(rid.split('_')[-1]))
    return pd.DataFrame(list(counts.items()),
                        columns=['id_prompt', 'orf_count'])


def valid_orf_count(prodigal_orfs: str, orf_count_range, sequences_df):
    import pandas as pd
    counts = _fuzzy_remap_ids(calculate_orf_counts(prodigal_orfs),
                              'id_prompt', sequences_df)
    merged = pd.merge(sequences_df, counts, on='id_prompt', how='left')
    lo, hi = min(orf_count_range), max(orf_count_range)
    return merged[(merged['orf_count'] >= lo) & (merged['orf_count'] <= hi)]


def calculate_orf_lengths(prodigal_orfs: str):
    """Per-genome ORF length lists from prodigal headers ('# start # end')."""
    import pandas as pd
    lengths: Dict[str, List[int]] = defaultdict(list)
    for name, _ in iter_fasta(prodigal_orfs):
        rid = name.split()[0]
        parts = name.split('#')
        if len(parts) >= 3:
            start, end = int(parts[1].strip()), int(parts[2].strip())
            lengths[_orf_base_id(rid)].append(end - start + 1)
    return pd.DataFrame([(k, v) for k, v in lengths.items()],
                        columns=['id_prompt', 'orf_lengths'])


def valid_orf_lengths(prodigal_orfs: str, orf_length_range, sequences_df):
    import pandas as pd
    lengths = _fuzzy_remap_ids(calculate_orf_lengths(prodigal_orfs),
                               'id_prompt', sequences_df)
    merged = pd.merge(sequences_df, lengths, on='id_prompt', how='left')
    lo, hi = min(orf_length_range), max(orf_length_range)
    def all_in_range(ls):
        return isinstance(ls, list) and all(lo <= x <= hi for x in ls)
    return merged[merged['orf_lengths'].apply(all_in_range)]


def valid_coding_density(sequences_df, coding_density_range):
    df = sequences_df.copy()
    df['total_orfs_length'] = df['orf_lengths'].apply(sum)
    if (df['total_orfs_length'] == 0).any():
        raise ValueError('Total length of ORFs cannot be zero.')
    if (df['genome_length'] == 0).any():
        raise ValueError('Genome length cannot be zero.')
    df['coding_density'] = df['total_orfs_length'] / df['genome_length'] \
        * 100
    lo, hi = min(coding_density_range), max(coding_density_range)
    return df[(df['coding_density'] >= lo) & (df['coding_density'] <= hi)]


def calculate_aa_homopolymer_len(sequence: str) -> int:
    longest = 0
    for m in re.finditer(r'([A-Z])\1*', sequence.upper()):
        longest = max(longest, len(m.group(0)))
    return longest


def valid_aa_homopolymer_len(prodigal_proteins: str,
                             homopolymer_length_range, sequences_df):
    import pandas as pd
    per_genome: Dict[str, int] = defaultdict(int)
    for name, seq in iter_fasta(prodigal_proteins):
        base = _orf_base_id(name.split()[0])
        per_genome[base] = max(per_genome[base],
                               calculate_aa_homopolymer_len(seq))
    table = _fuzzy_remap_ids(
        pd.DataFrame(list(per_genome.items()),
                     columns=['id_prompt', 'max_aa_homopolymer_len']),
        'id_prompt', sequences_df)
    merged = pd.merge(sequences_df, table, on='id_prompt', how='left')
    lo, hi = min(homopolymer_length_range), max(homopolymer_length_range)
    return merged[(merged['max_aa_homopolymer_len'] >= lo)
                  & (merged['max_aa_homopolymer_len'] <= hi)]


# ---------------------------------------------------------------------------
# qc4 — homology filters
# ---------------------------------------------------------------------------

_STOP_CODONS = ('TAA', 'TAG', 'TGA')


def append_upstream_of_last_frame_stop(input_fasta: str,
                                       output_fasta: str) -> None:
    """Pseudo-circularize: append the prefix up to the furthest
    first-in-frame stop codon across the 3 frames."""
    def last_frame_stop(seq: str) -> int:
        stops = []
        for frame in range(3):
            for i in range(frame, len(seq) - 3, 3):
                if seq[i:i + 3] in _STOP_CODONS:
                    stops.append(i + 3)
                    break
        return max(stops) if stops else len(seq)

    names, seqs = [], []
    for name, seq in iter_fasta(input_fasta):
        names.append(name)
        seqs.append(seq + seq[:last_frame_stop(seq)])
    write_fasta(output_fasta, names, seqs, width=70)


def clean_orfipy_fasta_file(input_fasta: str, output_fasta: str) -> None:
    with open(input_fasta) as fin, open(output_fasta, 'w') as fout:
        for line in fin:
            fout.write(line if line.startswith('>')
                       else line.replace('*', ''))


def run_orfipy(input_fasta: str, threads: int, start_codons: str,
               stop_codons: str, strand: str, min_len: int, max_len: int,
               output_dir: str, output_nt: str, output_aa_tmp: str,
               output_aa: str) -> None:
    subprocess.run(
        ['orfipy', '--procs', str(threads), input_fasta,
         '--start', start_codons, '--stop', stop_codons,
         '--strand', strand, '--include-stop', '--min', str(min_len),
         '--max', str(max_len), '--outdir', output_dir,
         '--dna', output_nt, '--pep', output_aa_tmp], check=True)
    clean_orfipy_fasta_file(f'{output_dir}/{output_aa_tmp}',
                            f'{output_dir}/{output_aa}')
    os.remove(f'{output_dir}/{output_aa_tmp}')


def run_checkv(input_file: str, output_dir: str, num_threads: int = 16,
               checkv_db: Optional[str] = None) -> None:
    env = dict(os.environ)
    if checkv_db:
        env['CHECKVDB'] = checkv_db
    subprocess.run(['checkv', 'end_to_end', input_file, output_dir,
                    '-t', str(num_threads)], env=env, check=True)


def valid_checkv_quality(input_file: str, checkv_quality_range,
                         sequences_df):
    import pandas as pd
    quality = pd.read_csv(input_file, delimiter='\t')
    results = quality[quality['checkv_quality']
                      .isin(checkv_quality_range)][
        ['contig_id', 'checkv_quality']]
    results = _fuzzy_remap_ids(results, 'contig_id', sequences_df)
    results = results.rename(columns={'contig_id': 'id_prompt'})
    return pd.merge(sequences_df, results, on='id_prompt', how='left')


def run_mmseqs_search_genomes(query_genomes, target_genomes, query_db_dir,
                              target_db_dir, tmp_dir, results_dir,
                              results_filename, search_type: int = 3,
                              threads: int = 8, sensitivity: float = 7.5):
    """Nucleotide mmseqs search (createdb/createindex/search/convertalis)."""
    for d in (query_db_dir, target_db_dir, tmp_dir, results_dir):
        if os.path.exists(d):
            shutil.rmtree(d)
    for d in (tmp_dir, results_dir):
        os.makedirs(d, exist_ok=True)
    run = lambda cmd: subprocess.run(cmd, check=True)
    run(['mmseqs', 'createdb', query_genomes, query_db_dir])
    run(['mmseqs', 'createdb', target_genomes, target_db_dir])
    run(['mmseqs', 'createindex', target_db_dir, tmp_dir,
         '--search-type', str(search_type), '--threads', str(threads)])
    run(['mmseqs', 'search', query_db_dir, target_db_dir, results_dir,
         tmp_dir, '--search-type', str(search_type),
         '--threads', str(threads), '-s', str(sensitivity)])
    run(['mmseqs', 'convertalis', query_db_dir, target_db_dir, results_dir,
         f'{results_dir}/{results_filename}',
         '--format-output', 'query,target,pident,evalue'])


def convert_m8_to_df(m8_file_path: str, descriptive_prefix: str):
    """.m8 (query,target,pident,evalue) -> top-hit-per-query DataFrame."""
    import pandas as pd
    cols = ['id_prompt', f'{descriptive_prefix}_mmseqs_target',
            f'{descriptive_prefix}_mmseqs_percent_identity',
            f'{descriptive_prefix}_mmseqs_e_value']
    if os.path.getsize(m8_file_path) == 0:
        # zero hits (e.g. genuinely novel designs): keep-all semantics of
        # valid_mmseqs_pident (no-hit -> identity 0) requires an empty df,
        # not an EmptyDataError crash
        return pd.DataFrame(columns=cols)
    df = pd.read_csv(m8_file_path, sep='\t', header=None, names=cols)
    return df.loc[df.groupby('id_prompt')[
        f'{descriptive_prefix}_mmseqs_percent_identity'].idxmax()]


def valid_mmseqs_pident(mmseqs_df, descriptive_prefix: str, pident_range,
                        sequences_df):
    """Filter genomes by top-hit percent identity; genomes with no hit get
    identity 0 (kept when the range starts at 0 — reference behavior)."""
    import pandas as pd
    pid_col = f'{descriptive_prefix}_mmseqs_percent_identity'
    lo, hi = min(pident_range), max(pident_range)
    mmseqs_df = mmseqs_df.copy()
    if 'sequence' in mmseqs_df.columns:
        mmseqs_df = mmseqs_df.drop(columns=['sequence'])
    if len(mmseqs_df) and 'ORF' in str(mmseqs_df['id_prompt'].iloc[0]):
        mmseqs_df['id_prompt'] = (mmseqs_df['id_prompt'].str.split('_')
                                  .str[:-1].str.join('_'))
        mmseqs_df = mmseqs_df.loc[mmseqs_df.groupby('id_prompt')[pid_col]
                                  .idxmax()].reset_index(drop=True)
    mmseqs_df = _fuzzy_remap_ids(mmseqs_df, 'id_prompt', sequences_df)
    merged = pd.merge(sequences_df, mmseqs_df, on='id_prompt', how='left')
    merged[pid_col] = merged[pid_col].fillna(0)
    return merged[(merged[pid_col] >= lo) & (merged[pid_col] <= hi)]


def _needleman_wunsch_identity(a: str, b: str) -> float:
    """Global-alignment percent identity matching the reference's biotite
    call (`align_optimal(std_nucleotide_matrix, terminal_penalty=False)` +
    `get_pairwise_sequence_identity` default mode, reference :776-797):
    NUC-matrix scores (match 5 / mismatch -4 / gap -10), free terminal
    gaps, identity over the non-terminal alignment span (internal gap
    columns count against identity)."""
    from phage_gen.analysis.alignment import percent_identity
    return percent_identity(a, b, match=5, mismatch=-4, gap=-10,
                            terminal_free=True, mode='not_terminal')


def calculate_pident_to_ref(query_sequence: str,
                            reference_sequence: str) -> float:
    """Percent identity to the (FASTA-path) reference via global alignment."""
    query = query_sequence.replace('*', '').upper().strip()
    _, seqs = _read_single_fasta(reference_sequence)
    ref = seqs.upper().strip()
    valid = set('ACGT')
    if any(ch not in valid for ch in query) or \
            any(ch not in valid for ch in ref):
        raise ValueError('Invalid character in query or reference sequence')
    return _needleman_wunsch_identity(query, ref)


def _read_single_fasta(path: str) -> Tuple[str, str]:
    for name, seq in iter_fasta(path):
        return name, seq
    raise ValueError(f'empty FASTA: {path}')


def valid_reference_genome_pident(sequences_df, reference_sequence: str,
                                  pident_range):
    lo, hi = pident_range
    df = sequences_df.copy()
    df['reference_genome_percent_identity'] = df['sequence'].apply(
        lambda s: calculate_pident_to_ref(s, reference_sequence))
    return df[(df['reference_genome_percent_identity'] >= lo)
              & (df['reference_genome_percent_identity'] <= hi)]


def calculate_genetic_architecture_scores(sequences_df, scorer,
                                          n_jobs: int = 0):
    """Score every sequence; merge the per-module score table."""
    import pandas as pd
    table = scorer.score_table(sequences_df['sequence'].tolist(),
                               sequences_df['id_prompt'].tolist(),
                               n_jobs=n_jobs)
    return pd.merge(sequences_df, table, on='id_prompt', how='left')


def valid_genetic_architecture_score(sequences_df, scorer,
                                     genetic_architecture_score_range,
                                     keep_or_remove_range: str = 'keep',
                                     mode: str = 'compound',
                                     n_jobs: int = 0):
    lo, hi = genetic_architecture_score_range
    col = ('genetic_architecture_score' if mode == 'compound'
           else 'genome_score')
    if keep_or_remove_range == 'keep':
        df = calculate_genetic_architecture_scores(sequences_df, scorer,
                                                   n_jobs)
        return df[(df[col] >= lo) & (df[col] <= hi)]
    return sequences_df[(sequences_df[col] < lo)
                        | (sequences_df[col] > hi)]


def mmseqs_search_proteins(query_fasta: str, mmseqs_db: str,
                           results_dir: str, threads: int = 8,
                           split: int = 0, sensitivity: float = 4.0,
                           e_value: float | None = None) -> str:
    os.makedirs(results_dir, exist_ok=True)
    out = os.path.join(results_dir, 'mmseqs_result.m8')
    log = os.path.join(results_dir, 'mmseqs_search.log')
    cmd = ['mmseqs', 'easy-search', query_fasta, mmseqs_db, out,
           results_dir, '--threads', str(threads), '--split', str(split),
           '-s', str(sensitivity), '--remove-tmp-files', '1',
           '--format-output', 'query,target,evalue,pident']
    if e_value is not None:
        cmd += ['-e', str(e_value)]
    with open(log, 'w') as lf:
        subprocess.run(cmd, check=True, stdout=lf, stderr=lf)
    return out


def parse_mmseqs_results(mmseqs_out: str):
    hits = []
    with open(mmseqs_out) as f:
        for line in f:
            q, t, e, p = line.strip().split('\t')
            hits.append((q, t, float(e), float(p)))
    return hits


def mmseqs_results_to_df(hits, query_fasta: str, output_csv: str,
                         descriptive_prefix: str,
                         only_top_hits: bool = True):
    import pandas as pd
    sequences = {name.split()[0]: seq
                 for name, seq in iter_fasta(query_fasta)}
    rows = [[q, sequences[q], t, e, p] for q, t, e, p in hits
            if q in sequences]
    df = pd.DataFrame(rows, columns=[
        'id_prompt', 'sequence', f'{descriptive_prefix}_mmseqs_target',
        f'{descriptive_prefix}_mmseqs_e_value',
        f'{descriptive_prefix}_mmseqs_percent_identity'])
    if only_top_hits and len(df):
        df = df.loc[df.groupby('id_prompt')[
            f'{descriptive_prefix}_mmseqs_e_value'].idxmin()]
    df.to_csv(output_csv, index=False)
    return df


def run_mmseqs_search_proteins(query_fasta, mmseqs_db, results_dir,
                               output_csv, descriptive_prefix,
                               threads: int = 8, split: int = 0,
                               sensitivity: float = 4.0,
                               only_top_hits: bool = True):
    if not os.path.isfile(query_fasta):
        raise FileNotFoundError(f'FASTA file not found: {query_fasta}')
    out = mmseqs_search_proteins(query_fasta, mmseqs_db, results_dir,
                                 threads, split, sensitivity)
    return mmseqs_results_to_df(parse_mmseqs_results(out), query_fasta,
                                output_csv, descriptive_prefix,
                                only_top_hits)


def valid_protein_database_hit_count(protein_database_hits_df, sequences_df,
                                     id_column: str = 'query',
                                     min_hits: int = 7):
    """Keep genomes with >= min_hits protein-database hits."""
    hits = protein_database_hits_df.copy()
    hits['genome_id'] = (hits[id_column].str.split('_').str[:-1]
                         .str.join('_'))
    counts = hits['genome_id'].value_counts()
    keep = counts[counts >= min_hits].index
    out = sequences_df[sequences_df['id_prompt'].isin(keep)].copy()
    out['protein_database_hit_count'] = out['id_prompt'].map(counts)
    return out


# ---------------------------------------------------------------------------
# qc5 — diversification
# ---------------------------------------------------------------------------

def run_mmseqs_clustering(input_fasta: str, output_dir: str,
                          min_seq_id: float = 0.99) -> None:
    db_dir = os.path.join(output_dir, 'mmseqs_db')
    results_dir = os.path.join(output_dir, 'mmseqs_results')
    tmp_dir = os.path.join(output_dir, 'tmp')
    for d in (db_dir, results_dir, tmp_dir):
        os.makedirs(d, exist_ok=True)
    run = lambda cmd: subprocess.run(cmd, check=True)
    run(['mmseqs', 'createdb', input_fasta, f'{db_dir}/sequences'])
    run(['mmseqs', 'cluster', f'{db_dir}/sequences',
         f'{results_dir}/clusters', tmp_dir,
         '--min-seq-id', str(min_seq_id)])
    run(['mmseqs', 'createsubdb', f'{results_dir}/clusters',
         f'{db_dir}/sequences', f'{results_dir}/representative_sequences'])
    run(['mmseqs', 'createtsv', f'{db_dir}/sequences',
         f'{db_dir}/sequences', f'{results_dir}/clusters',
         f'{results_dir}/clusters.tsv'])


def extract_mmseqs_cluster_representatives(clusters_tsv: str,
                                           input_fasta: str,
                                           output_fasta: str, input_df):
    import pandas as pd
    clusters = pd.read_csv(clusters_tsv, sep='\t', header=None)
    reps = set(clusters[0])
    kept = [(n, s) for n, s in iter_fasta(input_fasta)
            if n.split()[0] in reps]
    write_fasta(output_fasta, [n for n, _ in kept], [s for _, s in kept],
                width=70)
    rep_ids = {n.split()[0] for n, _ in kept}
    return input_df[input_df['id_prompt'].isin(rep_ids)].copy()


# ---------------------------------------------------------------------------
# qc6 — annotation, GFF/GBK, synteny
# ---------------------------------------------------------------------------

def assign_numeric_genome_ids(fasta_file: str, query_genomes: Set[str]
                              ) -> Dict[str, str]:
    genome_id_map: Dict[str, str] = {}
    next_id = 0
    for name, _ in iter_fasta(fasta_file):
        rid = name.split()[0]
        if rid in query_genomes and rid not in genome_id_map:
            genome_id_map[rid] = f'genome_{next_id}'
            next_id += 1
    return genome_id_map


def annotate_phrogs_hits(phrogs_mmseqs_hits_file: str,
                         phrogs_database_annotation_file: str):
    """Join PHROG annot/category onto mmseqs hits by phrog number."""
    import pandas as pd
    hits = pd.read_csv(phrogs_mmseqs_hits_file)
    annot = pd.read_csv(phrogs_database_annotation_file, sep='\t')
    hits['protein_database_mmseqs_target'] = \
        hits['protein_database_mmseqs_target'].astype(str)
    annot['phrog'] = annot['phrog'].astype(str)
    hits['phrog_number'] = hits['protein_database_mmseqs_target'] \
        .str.extract(r'phrog_(\d+)')
    annot['phrog_number'] = annot['phrog'].str.extract(r'(\d+)')
    hits = hits.merge(annot[['phrog_number', 'annot', 'category']],
                      on='phrog_number', how='left')
    return hits.drop(columns=['phrog_number'])


def extract_orf_positions_from_protein_database_hits(
        genomes_fasta_file: str, orfs_fasta_file: str,
        protein_database_hits_df, genome_id_map: Dict[str, str]) -> dict:
    """Per-genome GFF feature dicts from orfipy ORFs + annotated hits."""
    hits = protein_database_hits_df.set_index('id_prompt')[
        ['sequence', 'protein_database_mmseqs_target',
         'protein_database_mmseqs_percent_identity', 'annot',
         'category']].to_dict('index')
    genome_lengths = {name.split()[0]: len(seq)
                      for name, seq in iter_fasta(genomes_fasta_file)}
    orf_data: Dict[str, List[dict]] = {}
    for name, _ in iter_fasta(orfs_fasta_file):
        rid = name.split()[0]
        # orfipy record: '{genome}_ORF.N [start-end](+)'
        # prodigal / pyrodigal-gv record: '{genome}_N # start # end # strand'
        pos_match = re.search(r'\[(\d+)-(\d+)\]', name)
        prodigal_match = None if pos_match else re.search(
            r'\s#\s(\d+)\s#\s(\d+)\s#\s(-?1)\s#', name)
        if '_ORF' in rid:
            genome_name = rid.split('_ORF')[0]
        else:
            genome_name = rid.rsplit('_', 1)[0]
        if genome_name not in genome_id_map or rid not in hits:
            continue
        genome_id = genome_id_map[genome_name]
        rec = hits[rid]
        m = re.search(r'ORF\.\d+', rid)
        orf_id = m.group(0) if m else (
            f"ORF.{rid.rsplit('_', 1)[-1]}" if prodigal_match else '')
        if pos_match:
            start, end = pos_match.groups()
            sm = re.search(r'\[\d+-\d+\]\((\+|\-)\)', name)
            strand = sm.group(1) if sm else '+'
        elif prodigal_match:
            start, end, s = prodigal_match.groups()
            strand = '+' if s == '1' else '-'
        else:
            continue
        orf_data.setdefault(genome_id, []).append({
            'seq_id': genome_id, 'feature_type': 'CDS',
            'start': start, 'end': end, 'score': '.',
            'strand': strand,
            'phase': '0',
            'attributes': (
                f"ID={orf_id};"
                f"function={rec['category']};product={rec['annot']};"
                f"seq={rec['sequence']};percent_identity="
                f"{rec['protein_database_mmseqs_percent_identity']}"),
        })
    for genome_name, length in genome_lengths.items():
        if genome_name in genome_id_map:
            gid = genome_id_map[genome_name]
            orf_data.setdefault(gid, []).append({
                'seq_id': gid, 'feature_type': 'region', 'start': 1,
                'end': length, 'score': '.', 'strand': '+', 'phase': '.',
                'attributes': f'ID={gid};length={length}',
            })
    return orf_data


def create_gff_file(orf_data: dict, genome_name: str, genome_id: str,
                    genome_seq: str, output_dir) -> None:
    path = os.path.join(output_dir, f'{genome_id}.gff')
    with open(path, 'w') as gff:
        gff.write('##gff-version 3\n')
        gff.write(f'##sequence-region {genome_id} 1 {len(genome_seq)}\n')
        gff.write(f'##description {genome_name}\n')
        for orf in orf_data.get(genome_id, []):
            gff.write(f"{orf['seq_id']}\tPredicted genome annotation\t"
                      f"{orf['feature_type']}\t{orf['start']}\t"
                      f"{orf['end']}\t{orf['score']}\t{orf['strand']}\t"
                      f"{orf['phase']}\t{orf['attributes']}\n")
        gff.write('##FASTA\n')
        gff.write(f'>{genome_id}\n{genome_seq}\n')


def batch_create_gff_files(genomes_fasta_file, circular_genomes_fasta_file,
                           genomes_csv_file, circular_orfs_fasta_file,
                           protein_database_hits_df, output_dir,
                           genome_id_map_output_dir) -> None:
    import pandas as pd
    os.makedirs(output_dir, exist_ok=True)
    os.makedirs(genome_id_map_output_dir, exist_ok=True)
    matching = set(genomes_csv_file['id_prompt'])
    genome_id_map = assign_numeric_genome_ids(genomes_fasta_file, matching)
    orf_data = extract_orf_positions_from_protein_database_hits(
        genomes_fasta_file, circular_orfs_fasta_file,
        protein_database_hits_df, genome_id_map)
    for name, seq in iter_fasta(circular_genomes_fasta_file):
        rid = name.split()[0]
        if rid in genome_id_map:
            create_gff_file(orf_data, rid, genome_id_map[rid], seq,
                            output_dir)
    pd.DataFrame(list(genome_id_map.items()),
                 columns=['genome_name', 'genome_id']).to_csv(
        f'{genome_id_map_output_dir}/genome_id_map.csv', index=False)


def add_genome_id_mapping(genome_id_map_csv: str, input_csv: str,
                          output_csv: str) -> None:
    import pandas as pd
    id_map = pd.read_csv(genome_id_map_csv)
    df = pd.read_csv(input_csv)
    merged = pd.merge(df, id_map, left_on='id_prompt',
                      right_on='genome_name', how='left')
    merged = merged.drop(columns=['genome_name'])
    order = ['id_prompt', 'genome_id'] + [
        c for c in merged.columns if c not in ('id_prompt', 'genome_id')]
    merged[order].to_csv(output_csv, index=False)


def parse_gff_attributes(attributes_str: str) -> dict:
    out = {}
    for attr in attributes_str.split(';'):
        kv = attr.strip().split('=', 1)
        if len(kv) == 2:
            out[kv[0]] = kv[1]
    return out


def _iter_gff_features(gff_file: str):
    """Yield (columns, attributes) for feature lines; stops at ##FASTA."""
    with open(gff_file) as f:
        for line in f:
            if line.startswith('##FASTA'):
                break
            if line.startswith('#') or not line.strip():
                continue
            cols = line.rstrip('\n').split('\t')
            if len(cols) >= 9:
                yield cols, parse_gff_attributes(cols[8])


def _gff_description(gff_file: str) -> Optional[str]:
    with open(gff_file) as f:
        for line in f:
            if line.startswith('##description'):
                return line.replace('##description', '').strip()
            if line.startswith('##FASTA'):
                break
    return None


def _gff_fasta(gff_file: str) -> Tuple[str, str]:
    with open(gff_file) as f:
        for line in f:
            if line.startswith('##FASTA'):
                return next(iter_fasta(f))
    raise ValueError(f'no ##FASTA section in {gff_file}')


def convert_gff_to_gbk(gff_file: str, output_gbk: str) -> None:
    """Minimal GenBank writer for our GFF+FASTA files (LOCUS/FEATURES/
    ORIGIN with CDS qualifiers incl. product and translation)."""
    seq_id = None
    features = []
    with open(gff_file) as f:
        for line in f:
            if line.startswith('##sequence-region'):
                seq_id = line.split()[1]
            if line.startswith('##FASTA'):
                break
    for cols, attrs in _iter_gff_features(gff_file):
        features.append((cols[2], int(cols[3]), int(cols[4]), cols[6],
                         attrs))
    fasta_name, sequence = _gff_fasta(gff_file)

    def q(name, value):
        return f'                     /{name}="{value}"\n'

    with open(output_gbk, 'w') as gbk:
        gbk.write(f'LOCUS       {seq_id:<20} {len(sequence)} bp    DNA'
                  f'     linear   UNK\n')
        gbk.write(f'DEFINITION  {fasta_name}\n')
        gbk.write(f'ACCESSION   {seq_id}\nFEATURES             '
                  'Location/Qualifiers\n')
        for ftype, start, end, strand, attrs in features:
            loc = (f'{start}..{end}' if strand != '-'
                   else f'complement({start}..{end})')
            gbk.write(f'     {ftype:<16}{loc}\n')
            for key in ('ID', 'function', 'product', 'percent_identity'):
                if attrs.get(key):
                    gbk.write(q(key, attrs[key]))
            if attrs.get('seq'):
                gbk.write(q('translation', attrs['seq']))
        gbk.write('ORIGIN\n')
        for i in range(0, len(sequence), 60):
            chunk = sequence[i:i + 60].lower()
            blocks = ' '.join(chunk[j:j + 10]
                              for j in range(0, len(chunk), 10))
            gbk.write(f'{i + 1:>9} {blocks}\n')
        gbk.write('//\n')


def batch_convert_gff_to_gbk(input_dir: str, output_dir: str) -> None:
    os.makedirs(output_dir, exist_ok=True)
    for gff_file in sorted(os.listdir(input_dir)):
        if gff_file.endswith('.gff'):
            convert_gff_to_gbk(
                os.path.join(input_dir, gff_file),
                os.path.join(output_dir,
                             gff_file.replace('.gff', '.gbk')))


def calculate_average_protein_percent_identity(gff_directory: str,
                                               results_csv: str,
                                               output_csv: str) -> None:
    import pandas as pd
    rows = []
    for gff_file in sorted(os.listdir(gff_directory)):
        if not gff_file.endswith('.gff'):
            continue
        path = os.path.join(gff_directory, gff_file)
        total = n = 0
        for cols, attrs in _iter_gff_features(path):
            if cols[2] == 'CDS' and 'percent_identity' in attrs:
                total += float(attrs['percent_identity'])
                n += 1
        rows.append({
            'id_prompt': _gff_description(path)
            or gff_file.replace('.gff', ''),
            'average_protein_percent_identity': total / n if n else 0,
        })
    merged = pd.merge(pd.read_csv(results_csv), pd.DataFrame(rows),
                      on='id_prompt', how='left')
    merged.to_csv(output_csv, index=False)


def valid_average_protein_percent_identity(gff_directory: str,
                                           gbk_directory: str,
                                           results_csv: str,
                                           output_csv: str,
                                           identity_range) -> None:
    """Filter by average CDS percent identity; drop failing GFF/GBK files."""
    import pandas as pd
    lo, hi = identity_range
    rows, to_delete = [], []
    for gff_file in sorted(os.listdir(gff_directory)):
        if not gff_file.endswith('.gff'):
            continue
        path = os.path.join(gff_directory, gff_file)
        total = n = 0
        for cols, attrs in _iter_gff_features(path):
            if cols[2] == 'CDS' and 'percent_identity' in attrs:
                total += float(attrs['percent_identity'])
                n += 1
        avg = total / n if n else 0
        rows.append({'id_prompt': _gff_description(path)
                     or gff_file.replace('.gff', ''),
                     'average_protein_percent_identity': avg})
        if not (lo <= avg <= hi):
            to_delete.append(path)
            gbk = os.path.join(gbk_directory,
                               gff_file.replace('.gff', '.gbk'))
            if os.path.exists(gbk):
                to_delete.append(gbk)
    merged = pd.merge(pd.read_csv(results_csv), pd.DataFrame(rows),
                      on='id_prompt', how='left')
    merged = merged[(merged['average_protein_percent_identity'] >= lo)
                    & (merged['average_protein_percent_identity'] <= hi)]
    merged.to_csv(output_csv, index=False)
    for path in to_delete:
        os.remove(path)


def count_total_num_genes(gff_directory: str, results_csv: str) -> None:
    import pandas as pd
    rows = []
    for gff_file in sorted(os.listdir(gff_directory)):
        if not gff_file.endswith('.gff'):
            continue
        path = os.path.join(gff_directory, gff_file)
        n = sum(1 for cols, _ in _iter_gff_features(path)
                if cols[2] == 'CDS')
        rows.append({'id_prompt': _gff_description(path)
                     or gff_file.replace('.gff', ''),
                     'total_num_genes': n})
    merged = pd.merge(pd.read_csv(results_csv), pd.DataFrame(rows),
                      on='id_prompt', how='left')
    merged.to_csv(results_csv, index=False)


def count_syntenic_genes_all(root_dir: str, gff_dir: str, input_csv: str,
                             output_csv: str) -> None:
    """Per-genome syntenic gene counts from the lovis4u mmseqs clustering
    output, plus non-syntenic gene/annotation columns (reference
    `genome_design_filtering_pipeline.py:1864-1987`): a syntenic pair is a
    cluster row joining genes from two DIFFERENT genomes."""
    import pandas as pd

    def prefix_of(ident: str) -> str:
        m = re.match(r'^(.*?)ORF', str(ident))
        return m.group(1) if m else str(ident)

    def gene_of(ident: str) -> str:
        m = re.search(r'ORF\.\d+', str(ident))
        return m.group(0) if m else str(ident)

    syn_counts: Dict[str, int] = {}
    non_genes: Dict[str, str] = {}
    non_ann: Dict[str, str] = {}
    if not os.path.exists(root_dir):
        print(f'count_syntenic_genes_all: {root_dir} does not exist')
        return
    for sub in sorted(os.listdir(root_dir)):
        subp = os.path.join(root_dir, sub)
        if not (os.path.isdir(subp) and sub.startswith('genome_')):
            continue
        mm = os.path.join(subp, 'mmseqs', 'mmseqs_clustering.tsv')
        gff = os.path.join(gff_dir, f'{sub}.gff')
        if not (os.path.exists(mm) and os.path.exists(gff)):
            print(f'count_syntenic_genes_all: missing files for {sub}')
            continue
        df = pd.read_csv(mm, sep='\t', header=None, names=['col1', 'col2'])
        mism = df[df['col1'] != df['col2']].copy()
        pairs = mism[mism['col1'].map(prefix_of)
                     != mism['col2'].map(prefix_of)]
        syn_counts[sub] = len(pairs)
        genes = set(pairs.loc[pairs['col1'].str.startswith('genome_'),
                              'col1'].map(gene_of)) | \
            set(pairs.loc[pairs['col2'].str.startswith('genome_'),
                          'col2'].map(gene_of))
        all_genes: Dict[str, str] = {}
        for cols, attrs in _iter_gff_features(gff):
            gid = attrs.get('ID')
            prod = attrs.get('product') or 'Unknown gene'
            if not prod or prod.lower() == 'nan':
                prod = 'Unknown gene'
            if gid and gid.startswith('ORF'):
                all_genes[gid] = prod
        non = sorted(set(all_genes) - genes)
        non_genes[sub] = ','.join(non)
        non_ann[sub] = ','.join(all_genes[g] for g in non)
    out = pd.read_csv(input_csv)
    out['num_syntenic_genes'] = out['genome_id'].map(syn_counts) \
        .fillna(0).astype(int)
    out['non_syntenic_genes'] = out['genome_id'].map(non_genes).fillna('')
    out['non_syntenic_annotations'] = out['genome_id'].map(non_ann) \
        .fillna('')
    out.to_csv(output_csv, index=False)


def valid_syntenic_gene_count(input_csv: str, output_csv: str,
                              syntenic_gene_count_range,
                              total_gene_count_range,
                              syntenic_total_gene_count_remove,
                              gff_dir: str, gbk_dir: str, pdf_dir: str,
                              metadata_dir: str) -> None:
    """Keep genomes whose (num_syntenic_genes, total_num_genes) pair lies
    in the configured ranges minus the explicit remove-set; delete the
    GFF/GBK/PDF/metadata artifacts of removed genomes (reference
    :1990-2020)."""
    import pandas as pd
    df = pd.read_csv(input_csv)
    syn = range(syntenic_gene_count_range[0],
                syntenic_gene_count_range[1] + 1)
    tot = range(total_gene_count_range[0], total_gene_count_range[1] + 1)
    valid = set(itertools.product(syn, tot))
    valid -= {tuple(p) for p in (syntenic_total_gene_count_remove or [])}
    keep = df[df[['num_syntenic_genes', 'total_num_genes']]
              .apply(tuple, axis=1).isin(valid)]
    removed = set(df['genome_id']) - set(keep['genome_id'])
    keep.to_csv(output_csv, index=False)
    for gid in removed:
        for ext, d in (('gff', gff_dir), ('gbk', gbk_dir),
                       ('pdf', pdf_dir), ('', metadata_dir)):
            p = os.path.join(d, f'{gid}.{ext}' if ext else str(gid))
            if os.path.isdir(p):
                shutil.rmtree(p)
            elif os.path.exists(p):
                os.remove(p)


def valid_gene_annotations(input_gff_dir: str, input_gbk_dir: str,
                           required_products, sequences_df):
    """Keep genomes whose GFFs contain every required 'product=' value;
    failing genomes lose their GFF/GBK files."""
    required = [str(p) for p in required_products]
    keep_ids = set()
    for gff_file in sorted(os.listdir(input_gff_dir)):
        if not gff_file.endswith('.gff'):
            continue
        path = os.path.join(input_gff_dir, gff_file)
        products = [attrs.get('product', '')
                    for cols, attrs in _iter_gff_features(path)
                    if cols[2] == 'CDS']
        # reference semantics: every required product must be PRESENT
        # (all(p in products)) — duplicates in the required list do not
        # demand multiple distinct CDSs
        ok = all(req in products for req in required)
        desc = _gff_description(path) or gff_file.replace('.gff', '')
        if ok:
            keep_ids.add(desc)
        else:
            os.remove(path)
            gbk = os.path.join(input_gbk_dir,
                               gff_file.replace('.gff', '.gbk'))
            if os.path.exists(gbk):
                os.remove(gbk)
    return sequences_df[sequences_df['id_prompt'].isin(keep_ids)].copy()


def run_lovis4u_in_conda_env(env_name: str, command: str) -> None:
    """Run a command inside a conda env (lovis4u lives in its own env)."""
    full = (f'eval "$(conda shell.bash hook)" && conda activate '
            f'{env_name} && {command}')
    subprocess.run(full, shell=True, executable='/bin/bash', check=True)


def move_genetic_architecture_pdfs(results_dir: str,
                                   pdf_output_dir: str) -> None:
    os.makedirs(pdf_output_dir, exist_ok=True)
    for folder in os.listdir(results_dir):
        folder_path = os.path.join(results_dir, folder)
        if os.path.isdir(folder_path) and folder.startswith('genome_'):
            pdf = os.path.join(folder_path, 'lovis4u.pdf')
            if os.path.isfile(pdf):
                shutil.move(pdf, os.path.join(
                    pdf_output_dir, f"genome_{folder.split('_')[-1]}.pdf"))


# ---------------------------------------------------------------------------
# Stage checkpoint helper + orchestration
# ---------------------------------------------------------------------------

class Stage:
    """Tracks filter counts and checkpoints counts/seqs after every step
    (reference behavior: 'intermediate files are saved at every filtering
    step' — restartable by construction)."""

    def __init__(self, config: dict, counts_key: str, seqs_key: str,
                 counts_df=None):
        import pandas as pd
        self.dir = config['results_save_dir']
        self.counts_path = f"{self.dir}/{config[counts_key]}"
        self.seqs_path = f"{self.dir}/{config[seqs_key]}"
        self.counts = (counts_df if counts_df is not None
                       else pd.DataFrame([{}]))

    def record(self, name: str, df):
        self.counts[name] = len(df)
        self.counts.to_csv(self.counts_path, index=False)
        df.to_csv(self.seqs_path, index=False)
        print(f'{name}: {len(df)} sequences')
        return df

    def finalize(self, df):
        """Write counts + seqs unconditionally at stage end: the next
        stage loads these CSVs, so they must exist even when every
        sub-filter of this stage was disabled (reference writes its
        checkpoints at the end of every stage)."""
        self.counts.to_csv(self.counts_path, index=False)
        df.to_csv(self.seqs_path, index=False)


def _p(config: dict, key: str) -> str:
    return f"{config['results_save_dir']}/{config[key]}"


def main(config_file):
    import pandas as pd

    with open(config_file) as f:
        config = yaml.safe_load(f)

    # ---- qc1: initialization -------------------------------------------
    ensure_directory_exists(config['results_save_dir'])
    src = config['evo_gen_seqs_fasta_file_save_location']
    if not (src.endswith('.fna') or src.endswith('.fasta')):
        raise ValueError('Unsupported file format: provide .fna/.fasta')
    init_fasta = _p(config, 'initialized_seqs_fasta_file_save_location')
    replace_spaces_in_fasta_headers(src, init_fasta)
    if config['keep_only_up_to_first_eos']:
        seq_df = load_fasta_to_df_eos_aware(init_fasta)
    else:
        seq_df = load_fasta_to_df(init_fasta)
    print(f'Loaded {len(seq_df)} sequences')
    seq_df = append_unique_identifier(seq_df, 'id_prompt',
                                      config['overwrite_sequence_ids'])
    seq_df['sequence'] = seq_df['sequence'].str.upper()
    if config['remove_prompt']:
        seq_df = remove_prefix_from_sequences(seq_df, 'sequence',
                                              config['prompt_to_remove'])
    if config['prepend_prompt']:
        seq_df['sequence'] = config['prompt'] + seq_df['sequence'].astype(
            str)
    seq_df.to_csv(_p(config, 'initialized_seqs_csv_file_save_location'),
                  index=False)
    save_df_as_fasta(seq_df, init_fasta)
    print(f'Completed initial clean-up of {len(seq_df)} sequences.')

    # ---- qc2: nucleotide filtering -------------------------------------
    if config['nucleotide_filtering']:
        stage = Stage(config, 'nucleotide_filter_counts_file_save_location',
                      'nucleotide_filter_seqs_csv_file_save_location')
        stage.counts['count_initial_before_nucleotide_metrics'] = \
            len(seq_df)
        filtered = seq_df.copy()
        if config['nucleotide_character_filter']:
            filtered = stage.record('count_nt_filter',
                                    valid_nt_chars(filtered))
        if config['genome_length_filter']:
            filtered = stage.record('count_genome_len_filter',
                                    valid_genome_len(
                                        filtered,
                                        config['genome_length_range']))
        if config['gc_content_filter']:
            filtered = stage.record('count_gc_filter',
                                    valid_gc_content(
                                        filtered,
                                        config['gc_content_range']))
        if config['nucleotide_homopolymer_filter']:
            filtered = stage.record(
                'count_nt_homopolymer_filter',
                valid_nt_homopolymer_len(
                    filtered,
                    config['nucleotide_homopolymer_length_range']))
        if config['dinucleotide_frequency_filter']:
            filtered = stage.record(
                'count_dinucleotide_filter',
                valid_dinucleotide_content(
                    filtered, config['dinucleotide_frequency_range']))
        if config['tud_filter']:
            filtered = stage.record(
                'count_tud_filter',
                valid_tud(filtered, config['tetranucleotide'],
                          config['tud_range']))
        stage.finalize(filtered)
        save_df_as_fasta(filtered, _p(
            config, 'nucleotide_filter_seqs_fasta_file_save_location'))
        print(f'Completed nucleotide filtering: {len(filtered)} sequences.')

    # ---- qc3: prodigal ORF filtering -----------------------------------
    if config['orf_filtering']:
        if config['use_nucleotide_filtered_df']:
            seq_df = pd.read_csv(_p(
                config, 'nucleotide_filter_seqs_csv_file_save_location'))
            counts_df = pd.read_csv(_p(
                config, 'nucleotide_filter_counts_file_save_location'))
        else:
            seq_df = load_fasta_to_df(src)
            counts_df = pd.DataFrame([{}])
        stage = Stage(config, 'orf_filter_counts_file_save_location',
                      'orf_filter_seqs_csv_file_save_location', counts_df)
        stage.counts['count_initial_before_orf_metrics'] = len(seq_df)
        filtered = seq_df
        if config['prodigal_based_filters']:
            orfs = _p(config, 'prodigal_orfs_file_save_location')
            prots = _p(config, 'prodigal_proteins_file_save_location')
            run_prodigal(_p(
                config, 'nucleotide_filter_seqs_fasta_file_save_location'),
                orfs, prots, seq_df,
                prodigal_path=config.get('prodigal_path'))
            if config['orf_count_filter']:
                filtered = stage.record(
                    'count_orf_count_filter',
                    valid_orf_count(orfs, config['orf_count_range'],
                                    seq_df))
            if config['orf_lengths_filter']:
                filtered = stage.record(
                    'count_orf_len_filter',
                    valid_orf_lengths(orfs, config['orf_lengths_range'],
                                      filtered))
            if config['coding_density_filter']:
                filtered = stage.record(
                    'count_coding_density_filter',
                    valid_coding_density(filtered,
                                         config['coding_density_range']))
            if not filtered.empty \
                    and config['aminoacid_homopolymer_length_filter']:
                filtered = stage.record(
                    'count_aa_homopolymer_len_filter',
                    valid_aa_homopolymer_len(
                        prots,
                        config['aminoacid_homopolymer_length_range'],
                        filtered))
        stage.finalize(filtered)
        save_df_as_fasta(filtered, _p(
            config, 'orf_filter_seqs_fasta_file_save_location'))
        print(f'Completed ORF filtering: {len(filtered)} sequences.')

    # ---- qc4: homology filtering ---------------------------------------
    if config['homology_filtering']:
        if config['use_orf_filtered_df'] \
                and not config['use_nucleotide_filtered_df_instead']:
            seq_df = pd.read_csv(_p(
                config, 'orf_filter_seqs_csv_file_save_location'))
            seq_fasta = _p(config,
                           'orf_filter_seqs_fasta_file_save_location')
            counts_df = pd.read_csv(_p(
                config, 'orf_filter_counts_file_save_location'))
        elif config['use_nucleotide_filtered_df_instead']:
            seq_df = pd.read_csv(_p(
                config, 'nucleotide_filter_seqs_csv_file_save_location'))
            seq_fasta = _p(
                config, 'nucleotide_filter_seqs_fasta_file_save_location')
            counts_df = pd.read_csv(_p(
                config, 'nucleotide_filter_counts_file_save_location'))
        else:
            seq_df = load_fasta_to_df(src)
            seq_fasta = src
            counts_df = pd.DataFrame([{}])
        stage = Stage(config, 'homology_filter_counts_file_save_location',
                      'homology_filter_seqs_csv_file_save_location',
                      counts_df)
        stage.counts['count_initial_before_homology_metrics'] = len(seq_df)
        filtered = seq_df
        out_fasta = _p(config,
                       'homology_filter_seqs_fasta_file_save_location')
        circular_fasta = _p(
            config,
            'homology_filter_seqs_circular_fasta_file_save_location')
        append_upstream_of_last_frame_stop(seq_fasta, circular_fasta)
        run_orfipy(circular_fasta, config['orfipy_threads'],
                   config['orfipy_start_codons'],
                   config['orfipy_stop_codons'], config['orfipy_strand'],
                   config['orfipy_min_max_orf_lengths'][0],
                   config['orfipy_min_max_orf_lengths'][1],
                   config['results_save_dir'],
                   config['orfipy_orfs_file_save_location'],
                   config['orfipy_tmp_proteins_file_save_location'],
                   config['orfipy_proteins_file_save_location'])

        if config['protein_database_hit_count_filter']:
            results_dir = _p(
                config,
                'mmseqs_protein_database_results_dir_save_location')
            hits_df = run_mmseqs_search_proteins(
                query_fasta=_p(config,
                               'orfipy_proteins_file_save_location'),
                mmseqs_db=config['mmseqs_db_protein_database'],
                results_dir=results_dir,
                output_csv=f'{results_dir}/mmseqs2_hits.csv',
                descriptive_prefix='protein_database',
                threads=config['mmseqs_threads'],
                sensitivity=config['mmseqs_protein_database_sensitivity'],
                only_top_hits=True)
            filtered = stage.record(
                'count_protein_database_hit_count_filter',
                valid_protein_database_hit_count(
                    hits_df, seq_df, 'id_prompt',
                    config['protein_database_hit_count']))
        # reference saves the homology FASTA unconditionally before every
        # step that reads it (lines 2373/2397) — the next steps must see
        # THIS run's sequence set even when earlier filters are disabled
        save_df_as_fasta(filtered, out_fasta)

        if config['training_data_sequence_identity_filter']:
            base = _p(config,
                      'mmseqs_training_data_results_dir_save_location')
            if os.path.exists(base):
                shutil.rmtree(base)
            run_mmseqs_search_genomes(
                query_genomes=out_fasta,
                target_genomes=config['training_data_genomes_fasta'],
                query_db_dir=f'{base}/query_db_dir',
                target_db_dir=f'{base}/target_db_dir',
                tmp_dir=f'{base}/tmp', results_dir=f'{base}/results_dir',
                results_filename='mmseqs_results.m8',
                threads=config['mmseqs_threads'],
                sensitivity=config['mmseqs_training_data_sensitivity'])
            mm_df = convert_m8_to_df(
                f'{base}/results_dir/mmseqs_results.m8', 'training_data')
            filtered = stage.record(
                'count_training_data_sequence_identity_filter',
                valid_mmseqs_pident(
                    mm_df, 'training_data',
                    config['training_data_sequence_identity_range'],
                    filtered))
        save_df_as_fasta(filtered, out_fasta)

        if config['checkv_filter']:
            checkv_dir = _p(config, 'checkv_results_dir_save_location')
            run_checkv(out_fasta, checkv_dir, config['checkv_threads'],
                       checkv_db=config.get('checkv_db'))
            # reference semantics: valid_checkv_quality LEFT-merges the
            # in-range qualities and keeps every row (no drop) — the
            # quality column is recorded, not filtered on
            filtered = stage.record(
                'count_checkv_quality_filter',
                valid_checkv_quality(
                    f'{checkv_dir}/quality_summary.tsv',
                    config['checkv_quality_range'], filtered))
            save_df_as_fasta(filtered, out_fasta)

        if config['reference_genome_sequence_identity_filter']:
            filtered = stage.record(
                'count_seq_ident_to_reference_genome_filter',
                valid_reference_genome_pident(
                    filtered, config['reference_genome_fasta'],
                    config['reference_genome_sequence_identity_range']))
            save_df_as_fasta(filtered, out_fasta)

        if config['genetic_architecture_filter']:
            scorer = ga.ArchitectureScorer.from_fasta(
                config['genetic_architecture_reference_genome'])
            filtered = stage.record(
                'count_genetic_architecture_score_filter',
                valid_genetic_architecture_score(
                    filtered, scorer,
                    config['genetic_architecture_score_range'],
                    keep_or_remove_range='keep', mode='compound'))
            save_df_as_fasta(filtered, out_fasta)

        if config['tropism_protein_sequence_identity_filter']:
            results_dir = _p(
                config,
                'mmseqs_tropism_protein_results_dir_save_location')
            tropism_df = run_mmseqs_search_proteins(
                query_fasta=_p(config,
                               'orfipy_proteins_file_save_location'),
                mmseqs_db=config['mmseqs_db_tropism_protein'],
                results_dir=results_dir,
                output_csv=f'{results_dir}/mmseqs2_hits.csv',
                descriptive_prefix='tropism_protein',
                threads=config['mmseqs_threads'],
                sensitivity=config['mmseqs_tropism_protein_sensitivity'],
                only_top_hits=False)
            filtered = stage.record(
                'count_tropism_protein_sequence_identity_filter',
                valid_mmseqs_pident(
                    tropism_df, 'tropism_protein',
                    config['tropism_protein_sequence_identity_range'],
                    filtered))
        stage.finalize(filtered)
        save_df_as_fasta(filtered, out_fasta)
        print(f'Completed homology filtering: {len(filtered)} sequences.')

    # ---- qc5: diversification filtering --------------------------------
    if config['diversification_filtering']:
        if config['use_homology_filtered_df']:
            seq_df = pd.read_csv(_p(
                config, 'homology_filter_seqs_csv_file_save_location'))
            seq_fasta = _p(config,
                           'homology_filter_seqs_fasta_file_save_location')
            counts_df = pd.read_csv(_p(
                config, 'homology_filter_counts_file_save_location'))
        elif config['use_orf_filtered_df_instead']:
            seq_df = pd.read_csv(_p(
                config, 'orf_filter_seqs_csv_file_save_location'))
            seq_fasta = _p(config,
                           'orf_filter_seqs_fasta_file_save_location')
            counts_df = pd.read_csv(_p(
                config, 'orf_filter_counts_file_save_location'))
        else:
            seq_df = pd.read_csv(_p(
                config, 'nucleotide_filter_seqs_csv_file_save_location'))
            seq_fasta = _p(
                config, 'nucleotide_filter_seqs_fasta_file_save_location')
            counts_df = pd.read_csv(_p(
                config, 'nucleotide_filter_counts_file_save_location'))
        stage = Stage(config,
                      'diversification_filter_counts_file_save_location',
                      'diversification_filter_seqs_csv_file_save_location',
                      counts_df)
        stage.counts['count_initial_before_diversification'] = len(seq_df)
        filtered = seq_df
        out_fasta = _p(
            config, 'diversification_filter_seqs_fasta_file_save_location')

        if config['mmseqs_clustering_filter']:
            cdir = _p(config,
                      'mmseqs_clustering_results_dir_save_location')
            run_mmseqs_clustering(
                seq_fasta, cdir,
                config['mmseqs_clustering_min_sequence_identity'])
            filtered = stage.record(
                'count_mmseqs_clustering_filter',
                extract_mmseqs_cluster_representatives(
                    f'{cdir}/mmseqs_results/clusters.tsv', seq_fasta,
                    out_fasta, filtered))

        if config['mmseqs_reference_genome_sequence_identity_remove_filter']:
            base = _p(config,
                      'mmseqs_reference_genome_results_dir_save_location')
            if os.path.exists(base):
                shutil.rmtree(base)
            run_mmseqs_search_genomes(
                query_genomes=(out_fasta if os.path.exists(out_fasta)
                               else seq_fasta),
                target_genomes=config['reference_genome_fasta'],
                query_db_dir=f'{base}/query_db_dir',
                target_db_dir=f'{base}/target_db_dir',
                tmp_dir=f'{base}/tmp', results_dir=f'{base}/results_dir',
                results_filename='mmseqs_results.m8',
                threads=config['mmseqs_threads'],
                sensitivity=config['mmseqs_reference_genome_sensitivity'])
            mm_df = convert_m8_to_df(
                f'{base}/results_dir/mmseqs_results.m8',
                'reference_genome')
            filtered = stage.record(
                'count_mmseqs_reference_genome_sequence_identity_remove_filter',
                valid_mmseqs_pident(
                    mm_df, 'reference_genome',
                    config[
                        'mmseqs_reference_genome_sequence_identity_keep_'
                        'range'],
                    filtered))

        if config['genetic_architecture_remove_filter']:
            filtered = stage.record(
                'count_genetic_architecture_score_remove_filter',
                valid_genetic_architecture_score(
                    filtered, None,
                    config['genetic_architecture_score_range_to_remove'],
                    keep_or_remove_range='remove',
                    mode=config['genetic_architecture_score_mode']))
        stage.finalize(filtered)
        save_df_as_fasta(filtered, out_fasta)
        print(f'Completed diversification filtering: '
              f'{len(filtered)} sequences.')

    # ---- qc6: visualization + synteny ----------------------------------
    if config['genetic_architecture_visualization_and_synteny_filtering']:
        seq_csv = _p(config, 'homology_filter_seqs_csv_file_save_location')
        if config.get('diversification_filtering') and os.path.exists(_p(
                config,
                'diversification_filter_seqs_csv_file_save_location')):
            seq_csv = _p(
                config,
                'diversification_filter_seqs_csv_file_save_location')
        seq_df = pd.read_csv(seq_csv)
        hits_csv = (f"{_p(config, 'mmseqs_protein_database_results_dir_'
                                   'save_location')}/mmseqs2_hits.csv")
        annotated = annotate_phrogs_hits(hits_csv,
                                         config['protein_annotation_file'])
        gff_dir = _p(config, 'gff_dir_save_location')
        gbk_dir = _p(config, 'gbk_dir_save_location')
        meta_dir = _p(
            config,
            'genetic_architecture_visualization_dir_save_location')
        batch_create_gff_files(
            genomes_fasta_file=_p(
                config, 'homology_filter_seqs_fasta_file_save_location'),
            circular_genomes_fasta_file=_p(
                config,
                'homology_filter_seqs_circular_fasta_file_save_location'),
            genomes_csv_file=seq_df,
            circular_orfs_fasta_file=_p(
                config, 'orfipy_orfs_file_save_location'),
            protein_database_hits_df=annotated,
            output_dir=gff_dir,
            genome_id_map_output_dir=meta_dir)
        batch_convert_gff_to_gbk(gff_dir, gbk_dir)
        add_genome_id_mapping(f'{meta_dir}/genome_id_map.csv', seq_csv,
                              _p(config,
                                 'synteny_filter_seqs_csv_file_save_'
                                 'location'))
        synteny_csv = _p(config,
                         'synteny_filter_seqs_csv_file_save_location')

        # optional lovis4u visualization (external env)
        vis_script = config.get('genetic_architecture_visualization_script')
        if vis_script and os.path.exists(str(vis_script)):
            cmd = (f'python {vis_script} --gff-dir {gff_dir} '
                   f'--output-dir {meta_dir}')
            if config.get('use_reference_genome'):
                cmd += (' --reference-gff '
                        f"{config['reference_genome_gff_file_save_'
                                  'location']}")
            try:
                run_lovis4u_in_conda_env(config['lovis4u_conda_env'], cmd)
                move_genetic_architecture_pdfs(meta_dir, _p(
                    config,
                    'genetic_architecture_visualization_pdf_dir_save_'
                    'location'))
            except subprocess.CalledProcessError as e:
                print(f'lovis4u visualization failed (non-fatal): {e}')

        # cumulative counts funnel: carry the upstream stage's counts so
        # the synteny checkpoint preserves the whole per-filter history
        # (reference carries filter_counts through every stage)
        counts_src = _p(config,
                        'homology_filter_counts_file_save_location')
        if config.get('diversification_filtering') and os.path.exists(_p(
                config,
                'diversification_filter_counts_file_save_location')):
            counts_src = _p(
                config, 'diversification_filter_counts_file_save_location')
        counts = (pd.read_csv(counts_src)
                  if os.path.exists(counts_src) else pd.DataFrame([{}]))
        counts_path = _p(config, 'synteny_filter_counts_file_save_location')

        if config['average_protein_sequence_identity_filter']:
            valid_average_protein_percent_identity(
                gff_dir, gbk_dir, synteny_csv, synteny_csv,
                config['average_protein_sequence_identity_range'])
            counts['count_average_protein_sequence_identity_filter'] = \
                len(pd.read_csv(synteny_csv))
            counts.to_csv(counts_path, index=False)
        else:
            calculate_average_protein_percent_identity(
                gff_dir, synteny_csv, synteny_csv)
        count_total_num_genes(gff_dir, synteny_csv)

        final_df = pd.read_csv(synteny_csv)
        if config['required_genes_filter']:
            final_df = valid_gene_annotations(
                gff_dir, gbk_dir, config['required_genes_list'], final_df)
            final_df.to_csv(synteny_csv, index=False)
            counts['count_required_genes_filter'] = len(final_df)
            counts.to_csv(counts_path, index=False)

        if config.get('syntenic_gene_count_filter'):
            count_syntenic_genes_all(root_dir=meta_dir, gff_dir=gff_dir,
                                     input_csv=synteny_csv,
                                     output_csv=synteny_csv)
            # num_syntenic_genes needs total_num_genes alongside; already
            # merged above by count_total_num_genes
            valid_syntenic_gene_count(
                input_csv=synteny_csv, output_csv=synteny_csv,
                syntenic_gene_count_range=config[
                    'syntenic_gene_count_range'],
                total_gene_count_range=config['total_gene_count_range'],
                syntenic_total_gene_count_remove=config.get(
                    'syntenic_total_gene_count_remove') or [],
                gff_dir=gff_dir, gbk_dir=gbk_dir,
                pdf_dir=_p(config,
                           'genetic_architecture_visualization_pdf_dir_'
                           'save_location'),
                metadata_dir=meta_dir)
            final_df = pd.read_csv(synteny_csv)
            counts['count_syntenic_gene_count_filter'] = len(final_df)

        counts.to_csv(counts_path, index=False)
        save_df_as_fasta(final_df, _p(
            config, 'synteny_filter_seqs_fasta_file_save_location'))
        print(f'Completed qc6: {len(final_df)} final candidates.')

    print('Pipeline completed.')


if __name__ == '__main__':
    parser = argparse.ArgumentParser(
        description='Phage genome-design filtering pipeline (YAML config).')
    parser.add_argument('--config', required=True)
    main(parser.parse_args().config)
