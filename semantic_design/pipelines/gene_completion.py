"""Gene-completion evaluation pipeline.

Parity with reference `semantic_design/pipelines/gene_completion.py`
(same YAML schema - `sample_configs/gene_completion.yaml` loads unchanged -
same output artifact names and CSV columns), rebuilt on evo_tpu and without
BioPython.

Flow (reference `run_pipeline`, lines 710-789): prompts CSV -> sample_model
-> optional reverse complements -> prompt+generation FASTA -> prodigal ->
prompt-containment ORF filter -> protein QC filter -> optional MAFFT
closest-match alignment + per-gene identity stats + grouped summary.

Usage: python -m semantic_design.pipelines.gene_completion --config <yaml>
"""

from __future__ import annotations

import argparse
import logging
import os
import subprocess
import tempfile
from dataclasses import dataclass, field
from pathlib import Path
from typing import Dict, List, Optional, Tuple

import yaml

from evo_tpu.io.fasta import iter_fasta, read_fasta, write_fasta
from evo_tpu.utils import CODON_TO_AA
from semantic_design.semantic_design import (
    filter_protein_fasta,
    get_rc,
    model_load,
    read_fasta_text,
    read_prompts,
    run_prodigal,
    sample_model,
)

logging.basicConfig(level=logging.INFO,
                    format='%(asctime)s - %(levelname)s - %(message)s')
logger = logging.getLogger(__name__)


@dataclass
class Config:
    """YAML-config dataclass; field set identical to the reference's so
    `sample_configs/gene_completion.yaml` parses unchanged."""

    input_prompts: Path
    reference_seqs: Path
    output_dir: Path
    segmasker_path: Path
    mafft_path: Path

    model_name: str
    n_tokens: int
    temperature: float
    top_k: int
    batched: bool
    batch_size: int
    n_sample_per_prompt: int

    rc_truth: bool
    return_both: bool
    filter_min_length: int
    filter_max_length: int
    filter_partial_bool: bool
    segmasker_threshold: float
    run_msa: bool
    seq_identity_match_threshold: float

    # TPU extensions (optional in YAML)
    checkpoint_path: Optional[str] = None
    random_init: bool = False

    evo_gen_seqs_file_save_location: Path = field(init=False)
    all_seqs_fasta: Path = field(init=False)
    proteins_file: Path = field(init=False)
    orfs_file: Path = field(init=False)
    filtered_proteins_file: Path = field(init=False)
    msa_filtered_proteins_fasta: Path = field(init=False)
    sequence_alignment_csv: Path = field(init=False)
    output_msa_csv: Path = field(init=False)
    output_summary_csv: Path = field(init=False)

    def __post_init__(self) -> None:
        self.input_prompts = Path(self.input_prompts)
        self.reference_seqs = Path(self.reference_seqs)
        self.output_dir = Path(self.output_dir)
        self.output_dir.mkdir(parents=True, exist_ok=True)
        self.segmasker_path = Path(self.segmasker_path)
        self.mafft_path = Path(self.mafft_path)
        out = self.output_dir
        self.evo_gen_seqs_file_save_location = out / 'generated_sequences.csv'
        self.all_seqs_fasta = out / 'all_sequences.fasta'
        self.proteins_file = out / 'proteins.fasta'
        self.orfs_file = out / 'orfs.fasta'
        self.filtered_proteins_file = out / 'filtered_proteins.fasta'
        self.msa_filtered_proteins_fasta = out / 'msa_filtered_proteins.fasta'
        self.sequence_alignment_csv = out / 'sequence_alignment.csv'
        self.output_msa_csv = out / 'msa_results.csv'
        self.output_summary_csv = out / 'summary_statistics.csv'


def load_config(config_path) -> Config:
    with open(config_path) as f:
        data = yaml.safe_load(f)
    if not isinstance(data, dict):
        raise ValueError(f'Configuration must be a mapping: {config_path}')
    return Config(**data)


def translate_dna_sequence(dna_seq: str) -> str:
    """Standard-code translation, trailing partial codon trimmed; stop
    codons render as '*' (BioPython translate behavior)."""
    seq = dna_seq.upper()
    n = len(seq) - len(seq) % 3
    return ''.join(CODON_TO_AA.get(seq[i:i + 3], 'X') for i in range(0, n, 3))


def make_gene_completion_fasta(sequences: List[str], prompts: List[str],
                               ids: List[str], output_file) -> None:
    """FASTA of prompt+generation concatenations, header '>uuid prompt'."""
    if len(sequences) != len(ids):
        raise ValueError(
            f'{len(sequences)} sequences vs {len(ids)} ids: gene completion '
            'concatenates each generation to its forward-strand prompt, so '
            'return_both/rc_truth must be false for this pipeline')
    names = [f'{i} {p}' for i, p in zip(ids, prompts)]
    seqs = [p + s for p, s in zip(prompts, sequences)]
    write_fasta(output_file, names, seqs, width=60)


def filter_orfs_by_prompt(proteins_fasta, orfs_fasta, prompts_csv) -> None:
    """Keep only ORFs whose nucleotide sequence contains their prompt DNA
    (and the matching proteins); both FASTAs are rewritten in place."""
    import pandas as pd

    for path in (proteins_fasta, orfs_fasta, prompts_csv):
        if not Path(path).exists():
            logger.warning('%s missing; skipping prompt-based ORF filter',
                           path)
            return
    df = pd.read_csv(prompts_csv)
    if 'UUID' not in df.columns or 'Prompt' not in df.columns:
        logger.warning('Prompts CSV missing UUID/Prompt columns; skipping')
        return
    prompt_map = {str(r['UUID']).split('_')[0]: str(r['Prompt']).upper()
                  for _, r in df.iterrows()}

    allowed = set()
    kept_orfs: List[Tuple[str, str]] = []
    for name, seq in iter_fasta(str(orfs_fasta)):
        base_id = name.split(' ')[0]
        prompt = prompt_map.get(base_id.split('_')[0])
        if not prompt or prompt not in seq.upper() or base_id in allowed:
            continue
        allowed.add(base_id)
        kept_orfs.append((name, seq))
    if not kept_orfs:
        logger.warning('No ORFs contained their prompts; downstream outputs '
                       'will be empty.')
    write_fasta(str(orfs_fasta), [n for n, _ in kept_orfs],
                [s for _, s in kept_orfs], width=60)
    kept_prot = [(n, s) for n, s in iter_fasta(str(proteins_fasta))
                 if n.split(' ')[0] in allowed]
    write_fasta(str(proteins_fasta), [n for n, _ in kept_prot],
                [s for _, s in kept_prot], width=60)
    logger.info('Retained %d ORFs/proteins containing their prompt',
                len(kept_orfs))


def build_reference_lookup(reference_fasta) -> Dict[str, str]:
    """Case-insensitive map from header tokens (id, full description,
    punctuation-stripped words) to sequences."""
    lookup: Dict[str, str] = {}
    for name, seq in iter_fasta(str(reference_fasta)):
        desc = name.lower()
        candidates = {name.split()[0].lower(), desc}
        candidates.update(tok.strip('[](),')
                          for tok in desc.replace('/', ' ').split())
        for key in candidates:
            if key and key not in lookup:
                lookup[key] = seq
    return lookup


def align_pair(query: Tuple[str, str], ref: Tuple[str, str],
               mafft_path: str) -> Tuple[str, str, float]:
    """Pairwise MAFFT; returns (aligned_query, aligned_ref, identity in
    [0,1] over mutually non-gap columns)."""
    with tempfile.NamedTemporaryFile('w', suffix='.fasta',
                                     delete=False) as tf:
        tf.write(f'>{query[0] or "q"}\n{query[1]}\n>{ref[0] or "r"}\n'
                 f'{ref[1]}\n')
        path = tf.name
    try:
        result = subprocess.run([str(mafft_path), path],
                                capture_output=True, text=True, check=True)
        aligned = read_fasta_text(result.stdout)
        a, b = aligned[0][1], aligned[1][1]
        matches = sum(1 for x, y in zip(a, b)
                      if x != '-' and y != '-' and x == y)
        cols = sum(1 for x, y in zip(a, b) if x != '-' and y != '-')
        return a, b, (matches / cols if cols else 0.0)
    finally:
        try:
            os.remove(path)
        except OSError:
            pass


def calculate_sequence_identity(seq1: str, seq2: str,
                                mafft_path: str = 'mafft'
                                ) -> Optional[float]:
    """Percent identity (0-100) via pairwise MAFFT; None on failure."""
    if not seq1 or not seq2:
        return None
    try:
        _, _, ident = align_pair(('seq1', seq1), ('seq2', seq2),
                                 str(mafft_path))
        return ident * 100
    except subprocess.CalledProcessError as e:
        logger.warning('MAFFT alignment failed: %s', e)
        return None


def calculate_non_prompt_sequence_identity(
        input_aa: str, reference_aa: str, prompt_dna: str,
        mafft_path: str = 'mafft') -> float:
    """Percent identity restricted to alignment columns after both
    sequences have consumed the prompt-translated region."""
    if not input_aa or not reference_aa or not prompt_dna:
        return 0.0
    prompt_aa = translate_dna_sequence(prompt_dna)
    prompt_len = len(prompt_aa)
    if prompt_len == 0:
        return 0.0
    try:
        a, b, _ = align_pair(('input', input_aa),
                             ('reference', reference_aa), str(mafft_path))
    except subprocess.CalledProcessError:
        return 0.0
    used_in = used_ref = matches = positions = 0
    for x, y in zip(a, b):
        if x != '-':
            used_in += 1
        if y != '-':
            used_ref += 1
        if used_in <= prompt_len or used_ref <= prompt_len:
            continue
        if x == '-' or y == '-':
            continue
        positions += 1
        if x == y:
            matches += 1
    return (matches / positions * 100.0) if positions else 0.0


def align_and_save_closest_match(input_fasta, reference_fasta, output_csv,
                                 filtered_fasta, identity_threshold: float,
                                 mafft_path: str = 'mafft') -> None:
    """Best reference match per query; keep queries above the percent-
    identity threshold. CSV columns: query_id, reference_id, identity."""
    import pandas as pd

    references = [(n.split()[0], s)
                  for n, s in iter_fasta(str(reference_fasta))]
    rows, kept = [], []
    for name, seq in iter_fasta(str(input_fasta)):
        best_id, best_ref = 0.0, None
        for ref_name, ref_seq in references:
            _, _, ident = align_pair((name.split()[0], seq),
                                     (ref_name, ref_seq), str(mafft_path))
            if ident * 100 > best_id:
                best_id, best_ref = ident * 100, ref_name
        if best_id >= identity_threshold:
            rows.append({'query_id': name.split()[0],
                         'reference_id': best_ref, 'identity': best_id})
            kept.append((name, seq))
    pd.DataFrame(rows).to_csv(output_csv, index=False)
    write_fasta(str(filtered_fasta), [n for n, _ in kept],
                [s for _, s in kept], width=60)


def create_summary_statistics(results_df, output_path) -> None:
    """Grouped (Prompt, Protein_Label, Length_Percentage) identity summary
    with the reference's column names."""
    import pandas as pd

    if results_df.empty:
        logger.error('No results to process.')
        return
    results_df['Non_Prompt_Sequence_Identity'] = pd.to_numeric(
        results_df['Non_Prompt_Sequence_Identity'], errors='coerce')
    pos_mean = lambda x: x[x > 0].mean()
    pos_std = lambda x: x[x > 0].std()
    pos_count = lambda x: x[x > 0].count()
    summary = results_df.groupby(
        ['Prompt', 'Protein_Label', 'Length_Percentage']).agg(
        avg_full_identity=('Full_Sequence_Identity', pos_mean),
        std_full_identity=('Full_Sequence_Identity', pos_std),
        count_full_identity=('Full_Sequence_Identity', pos_count),
        avg_non_prompt_identity=('Non_Prompt_Sequence_Identity', pos_mean),
        std_non_prompt_identity=('Non_Prompt_Sequence_Identity', pos_std),
        count_non_prompt_identity=('Non_Prompt_Sequence_Identity',
                                   pos_count),
        prompt_length=('Prompt_Length', 'first'),
    ).reset_index().fillna(0)
    for col in ['avg_full_identity', 'std_full_identity',
                'avg_non_prompt_identity', 'std_non_prompt_identity']:
        summary[col] = summary[col].round(2)
    summary.to_csv(output_path, index=False)


def process_gene_completion_sequences(
    input_fasta, uuid_prompts_csv, prompt_info_csv, reference_fasta,
    output_csv, output_summary_csv, mafft_path,
) -> None:
    """Per-sequence identity metrics vs references, keyed by UUID and
    prompt metadata (Shortened_Sequence / Protein_Label /
    Length_Percentage columns of the prompt CSV)."""
    import pandas as pd

    # one entry PER protein record: a generation can yield several
    # filtered proteins (uuid_1, uuid_2, ...) and each gets its own row
    # (a root-keyed dict would keep only the last)
    input_sequences = [
        (name.split(' ')[0].split('_')[0], seq.replace('*', ''))
        for name, seq in iter_fasta(str(input_fasta))]
    reference_lookup = build_reference_lookup(reference_fasta)
    uuid_df = pd.read_csv(uuid_prompts_csv)
    info_df = pd.read_csv(prompt_info_csv)

    rows = []
    for uuid_val, input_seq in input_sequences:
        prompt_row = uuid_df[uuid_df['UUID'] == uuid_val]
        if prompt_row.empty:
            continue
        prompt = prompt_row['Prompt'].iloc[0]
        prompt_aa = translate_dna_sequence(prompt)
        info_row = info_df[info_df['Shortened_Sequence'].astype(str).str.strip() == prompt]
        if info_row.empty or not input_seq.startswith(prompt_aa):
            continue
        label = str(info_row['Protein_Label'].iloc[0])
        reference_seq = reference_lookup.get(label.lower())
        if not reference_seq:
            logger.warning("No reference sequence for label '%s'", label)
            continue
        full_ident = calculate_sequence_identity(
            input_seq, reference_seq, mafft_path) or 0.0
        non_prompt_ident = calculate_non_prompt_sequence_identity(
            input_seq, reference_seq, prompt, mafft_path)
        rows.append({
            'UUID': uuid_val,
            'Input_Sequence': input_seq,
            'Prompt': prompt,
            'Protein_Label': label,
            'Length_Percentage': info_row['Length_Percentage'].iloc[0],
            'Reference_Sequence': reference_seq,
            'Full_Sequence_Identity': full_ident,
            'Non_Prompt_Sequence_Identity': non_prompt_ident,
            'Prompt_Length': len(prompt_aa),
        })
    df = pd.DataFrame(rows)
    df.to_csv(output_csv, index=False)
    create_summary_statistics(df, output_summary_csv)


def run_pipeline(config_path) -> None:
    config = load_config(config_path)

    prompt_seqs = read_prompts(str(config.input_prompts), config.batched,
                               config.batch_size)
    model, tokenizer = model_load(config.model_name,
                                  checkpoint_path=config.checkpoint_path,
                                  random_init=config.random_init)
    prompts, sequences, scores, ids = sample_model(
        prompt_batches=prompt_seqs,
        model=model,
        tokenizer=tokenizer,
        file_save_location=str(config.evo_gen_seqs_file_save_location),
        n_tokens=config.n_tokens,
        temp=config.temperature,
        top_k=config.top_k,
        batched=config.batched,
        n_sample_per_prompt=config.n_sample_per_prompt,
        force_prompt_threshold=2,
    )
    final_sequences = get_rc(sequences, rc_truth=config.rc_truth,
                             return_both=config.return_both)
    make_gene_completion_fasta(final_sequences, prompts, ids,
                               config.all_seqs_fasta)

    run_prodigal(str(config.all_seqs_fasta), str(config.proteins_file),
                 str(config.orfs_file))
    filter_orfs_by_prompt(config.proteins_file, config.orfs_file,
                          config.evo_gen_seqs_file_save_location)
    filter_protein_fasta(
        str(config.proteins_file), str(config.filtered_proteins_file),
        str(config.segmasker_path), config.filter_min_length,
        config.filter_max_length, config.filter_partial_bool,
        config.segmasker_threshold)
    if config.run_msa:
        align_and_save_closest_match(
            config.filtered_proteins_file, config.reference_seqs,
            config.sequence_alignment_csv,
            config.msa_filtered_proteins_fasta,
            config.seq_identity_match_threshold, str(config.mafft_path))
        process_gene_completion_sequences(
            input_fasta=config.msa_filtered_proteins_fasta,
            uuid_prompts_csv=config.evo_gen_seqs_file_save_location,
            prompt_info_csv=config.input_prompts,
            reference_fasta=config.reference_seqs,
            output_csv=config.output_msa_csv,
            output_summary_csv=config.output_summary_csv,
            mafft_path=str(config.mafft_path))
    else:
        logger.info('Skipping MSA/summary (run_msa=False)')


if __name__ == '__main__':
    parser = argparse.ArgumentParser(
        description='Run the gene-completion pipeline from a YAML config.')
    parser.add_argument('--config', required=True)
    run_pipeline(parser.parse_args().config)
