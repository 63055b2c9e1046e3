"""Operon-completion evaluation pipeline.

Parity with reference `semantic_design/pipelines/operon_completion.py`
(same YAML schema, artifact names, and CSV columns), rebuilt on evo_tpu.
The generation/prodigal/filter skeleton is shared with gene_completion; the
analysis differs: each UUID's best-identity generation is scored against
the reference sequence named by the prompt's `Expected_Response`.

Usage: python -m semantic_design.pipelines.operon_completion --config <yaml>
"""

from __future__ import annotations

import argparse
import logging
from dataclasses import dataclass, field
from pathlib import Path
from typing import Dict, List, Optional

import yaml

from evo_tpu.io.fasta import iter_fasta
from semantic_design.pipelines.gene_completion import (
    align_and_save_closest_match,
    calculate_sequence_identity,
)
from semantic_design.semantic_design import (
    filter_protein_fasta,
    get_rc,
    make_fasta,
    model_load,
    read_prompts,
    run_prodigal,
    sample_model,
)

logging.basicConfig(level=logging.INFO,
                    format='%(asctime)s - %(levelname)s - %(message)s')
logger = logging.getLogger(__name__)


@dataclass
class Config:
    """YAML-config dataclass (field set = reference operon Config)."""

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


def create_summary_statistics(results_df, output_path) -> None:
    """Identity summary grouped by (Prompt, Expected_Response)."""
    if results_df.empty:
        logger.error('No results to process.')
        return
    summary = (results_df.groupby(['Prompt', 'Expected_Response'])
               .agg({'Sequence_Identity': ['mean', 'std', 'count']})
               .reset_index())
    summary.columns = ['Prompt', 'Expected_Response', 'avg_identity',
                       'std_identity', 'count']
    summary[['avg_identity', 'std_identity']] = \
        summary[['avg_identity', 'std_identity']].round(2)
    summary.to_csv(output_path, index=False)


def process_operon_sequences(input_fasta, uuid_prompts_csv, prompt_info_csv,
                             reference_fasta, output_msa_csv,
                             output_summary_csv, mafft_path) -> None:
    """Per-UUID best-identity comparison vs the expected reference operon.
    Writes [UUID, Generated_Sequence, Prompt, Expected_Response,
    Reference_Sequence, Sequence_Identity] plus the grouped summary."""
    import pandas as pd

    logger.info('Starting sequence analysis...')
    input_sequences: Dict[str, List[str]] = {}
    for name, seq in iter_fasta(str(input_fasta)):
        uuid_val = name.split(' ')[0].split('_')[0]
        input_sequences.setdefault(uuid_val, []).append(
            seq.replace('*', ''))

    uuid_df = pd.read_csv(uuid_prompts_csv)
    info_df = pd.read_csv(prompt_info_csv)
    references = {name.split()[0]: seq
                  for name, seq in iter_fasta(str(reference_fasta))}

    rows = []
    for uuid_val, sequences in input_sequences.items():
        prompt_match = uuid_df[uuid_df['UUID'] == uuid_val]
        if prompt_match.empty:
            logger.warning('No matching prompt for UUID %s', uuid_val)
            continue
        prompt = prompt_match['Prompt'].iloc[0]
        response_match = info_df[info_df['Prompt'].astype(str).str.strip() == prompt]
        if response_match.empty:
            logger.warning('No expected response for prompt %s', prompt)
            continue
        expected = response_match['Expected_Response'].iloc[0]
        reference_seq = references.get(expected)
        if not reference_seq:
            logger.warning('No reference sequence named %s', expected)
            continue
        best_identity, best_seq = -1.0, None
        for seq in sequences:
            ident = calculate_sequence_identity(seq, reference_seq,
                                                str(mafft_path))
            if ident is not None and ident > best_identity:
                best_identity, best_seq = ident, seq
        if best_seq is None:
            continue
        rows.append({
            'UUID': uuid_val,
            'Generated_Sequence': best_seq,
            'Prompt': prompt,
            'Expected_Response': expected,
            'Reference_Sequence': reference_seq,
            'Sequence_Identity': best_identity,
        })

    # rows are built per UUID (one best sequence each), so no dedup pass
    # is needed
    df = pd.DataFrame(rows)
    df.to_csv(output_msa_csv, index=False)
    create_summary_statistics(df, output_summary_csv)
    logger.info('Results saved to %s', output_msa_csv)


def run_pipeline(config_file) -> None:
    config = load_config(config_file)

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
    make_fasta(final_sequences, prompts, ids, str(config.all_seqs_fasta))
    run_prodigal(str(config.all_seqs_fasta), str(config.proteins_file),
                 str(config.orfs_file))
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
        process_operon_sequences(
            input_fasta=config.msa_filtered_proteins_fasta,
            uuid_prompts_csv=config.evo_gen_seqs_file_save_location,
            prompt_info_csv=config.input_prompts,
            reference_fasta=config.reference_seqs,
            output_msa_csv=config.output_msa_csv,
            output_summary_csv=config.output_summary_csv,
            mafft_path=config.mafft_path)
    else:
        logger.info('Skipping MSA/summary (run_msa=False)')
    logger.info('Pipeline execution completed successfully')


if __name__ == '__main__':
    parser = argparse.ArgumentParser(
        description='Run the operon-completion pipeline from a YAML config.')
    parser.add_argument('--config', required=True)
    run_pipeline(parser.parse_args().config)
