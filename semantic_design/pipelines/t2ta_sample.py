"""Type-II toxin-antitoxin (TA) sampling pipeline.

Parity with reference `semantic_design/pipelines/t2ta_sample.py`: sample TA
loci -> prodigal -> protein QC -> optional ESMFold confidence filter ->
pair proteins sharing a generation (Root_ID) -> cofold-targets FASTA for
the t2ta_cofold pipeline.

Usage: python -m semantic_design.pipelines.t2ta_sample --config <yaml>
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
    """YAML-config dataclass (field set = reference t2ta_sample Config)."""

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

    checkpoint_path: Optional[str] = None
    random_init: bool = False

    evo_gen_seqs_file_save_location: Path = field(init=False)
    all_seqs_fasta: Path = field(init=False)
    proteins_file: Path = field(init=False)
    orfs_file: Path = field(init=False)
    filtered_proteins_file: Path = field(init=False)
    output_folds_file: Path = field(init=False)
    output_filtered_folds: Path = field(init=False)
    shared_protein_pairs_csv: Path = field(init=False)
    cofold_fasta: Path = field(init=False)

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
        self.shared_protein_pairs_csv = out / 'shared_protein_pairs.csv'
        self.cofold_fasta = out / 'cofold_targets.fasta'


def load_config(config_file: str) -> Config:
    with open(config_file) as f:
        config_dict = yaml.safe_load(f)
    if not isinstance(config_dict, dict):
        raise ValueError(f'Config must be a YAML mapping: {config_file}')
    return Config.from_dict(config_dict)


def identify_unique_pairs(df, output_csv: str):
    """All unordered protein pairs sharing a Root_ID (= same generation,
    the UUID prefix of the prodigal ORF id). CSV columns match the
    reference: Root_ID, Evo Sequence ID 1/2, Amino Acid Sequence 1/2."""
    import pandas as pd

    df = df.copy()
    # root = the full record id before the trailing ORF number, so
    # '{uuid}_1' -> '{uuid}' and '{uuid}_rc_1' -> '{uuid}_rc'. A bare
    # prefix regex would merge forward and RC strands of one generation,
    # producing self-pairs of a protein with its identical RC copy.
    df['Root_ID'] = (df['Evo Sequence ID'].astype(str)
                     .str.split().str[0]
                     .str.rsplit('_', n=1).str[0])
    pairs = []
    for root_id, group in df.groupby('Root_ID'):
        if len(group) < 2:
            continue
        seqs = group['Amino Acid Sequence'].tolist()
        ids = group['Evo Sequence ID'].tolist()
        for i in range(len(seqs)):
            for j in range(i + 1, len(seqs)):
                pairs.append({
                    'Root_ID': root_id,
                    'Evo Sequence ID 1': ids[i],
                    'Amino Acid Sequence 1': seqs[i],
                    'Evo Sequence ID 2': ids[j],
                    'Amino Acid Sequence 2': seqs[j],
                })
    cols = ['Root_ID', 'Evo Sequence ID 1', 'Amino Acid Sequence 1',
            'Evo Sequence ID 2', 'Amino Acid Sequence 2']
    # explicit columns: an empty result must still write a HEADER row, or
    # csv_to_cofold_fasta's read_csv dies with EmptyDataError at the very
    # end of the pipeline
    out = pd.DataFrame(pairs, columns=cols).drop_duplicates()
    out.to_csv(output_csv, index=False)
    return out


def csv_to_cofold_fasta(
    input_csv: str,
    cofold_fasta: str,
    root_id_col: str = 'Root_ID',
    sequence1_col: str = 'Amino Acid Sequence 1',
    sequence2_col: str = 'Amino Acid Sequence 2',
    sequence1_id_col: str = 'Evo Sequence ID 1',
    sequence2_id_col: str = 'Evo Sequence ID 2',
) -> None:
    """Pairs CSV -> multimer-FASTA for cofolding. Record format (reference
    contract, consumed by t2ta_cofold):

        >{root_id},{orf#1},{orf#2}
        {seq1}:
        {seq2}
    """
    import pandas as pd

    df = pd.read_csv(input_csv)
    required = [root_id_col, sequence1_col, sequence2_col,
                sequence1_id_col, sequence2_id_col]
    for col in required:
        if col not in df.columns:
            raise KeyError(f"Column '{col}' not found in the CSV file.")
    seen = set()
    with open(cofold_fasta, 'w') as f:
        for _, row in df[required].drop_duplicates().iterrows():
            pair = (row[sequence1_col], row[sequence2_col])
            if pair in seen:
                continue
            seen.add(pair)
            # ORF number = the trailing _N of the record id (works for
            # both '{uuid}_1' and '{uuid}_rc_1'; a fixed split('_')[1]
            # returned 'rc' for RC-strand records)
            orf1 = str(row[sequence1_id_col]).split()[0].rsplit('_', 1)[-1]
            orf2 = str(row[sequence2_id_col]).split()[0].rsplit('_', 1)[-1]
            f.write(f'>{row[root_id_col]},{orf1},{orf2}\n'
                    f'{pair[0]}:\n{pair[1]}\n')
    print(f"Processing complete. Output written to '{cofold_fasta}'.")


def process_sequences(config: Config, model, tokenizer) -> None:
    """Generate TA loci and run baseline QC (shared cascade)."""
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
    filter_protein_fasta(
        str(config.proteins_file), str(config.filtered_proteins_file),
        str(config.segmasker_path), config.filter_min_length,
        config.filter_max_length, config.filter_partial_bool,
        config.segmasker_threshold)


def process_folds(config: Config):
    fold_stats = fold_proteins(str(config.filtered_proteins_file),
                               str(config.output_folds_file))
    return filter_proteins_by_threshold(
        fold_stats, str(config.output_filtered_folds),
        config.plddt_threshold, config.ptm_threshold)


def main(config_file: str) -> None:
    config = load_config(config_file)
    model, tokenizer = model_load(config.model_name,
                                  checkpoint_path=config.checkpoint_path,
                                  random_init=config.random_init)
    process_sequences(config, model, tokenizer)
    if config.run_esm_fold:
        filtered_folds = process_folds(config)
        identify_unique_pairs(filtered_folds,
                              str(config.shared_protein_pairs_csv))
        csv_to_cofold_fasta(str(config.shared_protein_pairs_csv),
                            str(config.cofold_fasta))
    print('Pipeline completed successfully', flush=True)


if __name__ == '__main__':
    parser = argparse.ArgumentParser(
        description='Run the Type-II TA sampling pipeline from YAML config.')
    parser.add_argument('--config', required=True)
    main(parser.parse_args().config)
