"""Anti-CRISPR (Acr) sampling pipeline.

Parity with reference `semantic_design/pipelines/acr_sample.py` (same YAML
schema and artifact names): sample candidate Acr loci from prompts ->
prodigal -> protein QC filter -> optional ESMFold + confidence filtering.

Usage: python -m semantic_design.pipelines.acr_sample --config <yaml>
"""

from __future__ import annotations

import argparse
from dataclasses import dataclass, field
from pathlib import Path
from typing import Any, Dict, Optional

import yaml

from semantic_design.semantic_design import (
    filter_protein_fasta,
    filter_proteins_by_threshold,
    fold_proteins,
    get_rc,
    make_fasta,
    model_load,
    read_prompts,
    run_prodigal,
    sample_model,
)


@dataclass
class Config:
    """YAML-config dataclass (field set = reference's acr_sample Config)."""

    input_prompts: Path
    output_dir: Path
    segmasker_path: Path

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
    run_esm_fold: bool
    plddt_threshold: float
    ptm_threshold: float

    # TPU extensions
    checkpoint_path: Optional[str] = None
    random_init: bool = False

    evo_gen_seqs_file_save_location: Path = field(init=False)
    all_seqs_fasta: Path = field(init=False)
    proteins_file: Path = field(init=False)
    orfs_file: Path = field(init=False)
    filtered_proteins_file: Path = field(init=False)
    output_folds_file: Path = field(init=False)
    output_filtered_folds: Path = field(init=False)

    @classmethod
    def from_dict(cls, config_dict: Dict[str, Any]) -> 'Config':
        return cls(**config_dict)

    def __post_init__(self) -> None:
        self.input_prompts = Path(self.input_prompts)
        self.output_dir = Path(self.output_dir)
        self.output_dir.mkdir(parents=True, exist_ok=True)
        self.segmasker_path = Path(self.segmasker_path)
        out = self.output_dir
        self.evo_gen_seqs_file_save_location = out / 'generated_sequences.csv'
        self.all_seqs_fasta = out / 'all_sequences.fasta'
        self.proteins_file = out / 'proteins.fasta'
        self.orfs_file = out / 'orfs.fasta'
        self.filtered_proteins_file = out / 'filtered_proteins.fasta'
        self.output_folds_file = out / 'folds.csv'
        self.output_filtered_folds = out / 'filtered_folds.csv'


def load_config(config_file: str) -> Config:
    with open(config_file) as f:
        config_dict = yaml.safe_load(f)
    if not isinstance(config_dict, dict):
        raise ValueError(f'Config must be a YAML mapping: {config_file}')
    return Config.from_dict(config_dict)


def process_sequences(config: Config, model, tokenizer) -> None:
    """Sample with Evo and run the baseline filtering cascade."""
    print('Starting sequence processing...', flush=True)
    prompt_seqs = read_prompts(str(config.input_prompts), config.batched,
                               config.batch_size)
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
    print('Base protein filtering started...', flush=True)
    filter_protein_fasta(
        str(config.proteins_file), str(config.filtered_proteins_file),
        str(config.segmasker_path), config.filter_min_length,
        config.filter_max_length, config.filter_partial_bool,
        config.segmasker_threshold)
    print('Base protein filtering complete', flush=True)


def process_folds(config: Config):
    """ESMFold the filtered proteins; return rows passing pLDDT/pTM."""
    print('Starting protein folding...', flush=True)
    fold_stats = fold_proteins(str(config.filtered_proteins_file),
                               str(config.output_folds_file))
    print('Protein folding complete', flush=True)
    return filter_proteins_by_threshold(
        fold_stats, str(config.output_filtered_folds),
        config.plddt_threshold, config.ptm_threshold)


def main(config_file: str) -> None:
    config = load_config(config_file)
    print('Configuration loaded', flush=True)
    model, tokenizer = model_load(config.model_name,
                                  checkpoint_path=config.checkpoint_path,
                                  random_init=config.random_init)
    process_sequences(config, model, tokenizer)
    if config.run_esm_fold:
        process_folds(config)
    print('Pipeline completed successfully', flush=True)


if __name__ == '__main__':
    parser = argparse.ArgumentParser(
        description='Run the Acr sampling pipeline from a YAML config.')
    parser.add_argument('--config', required=True)
    main(parser.parse_args().config)
