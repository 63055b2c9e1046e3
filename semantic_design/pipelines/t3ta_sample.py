"""Type-III toxin-antitoxin (protein toxin + RNA antitoxin) pipeline.

Parity with reference `semantic_design/pipelines/t3ta_sample.py` (same YAML
schema, artifact names, CSV schemas, and external-tool invocations):
sample -> prodigal -> protein QC -> ESMFold triage -> Tandem Repeat Finder
on surviving generations -> ViennaRNA fold + hairpin detection of TRF
regions -> AT-pair join -> structure/sequence/cmscan/hmmscan filters ->
final candidate tables.

Usage: python -m semantic_design.pipelines.t3ta_sample --config <yaml>
"""

from __future__ import annotations

import argparse
import ast
import os
import subprocess
import sys
import tempfile
from dataclasses import dataclass, field
from pathlib import Path
from typing import Any, Dict, List, Optional, Set, Tuple

import yaml

from evo_tpu.io.fasta import write_fasta
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
    """YAML-config dataclass (field set = reference t3ta Config)."""

    input_prompts: Path
    output_dir: Path
    segmasker_path: Path
    trf_path: Path
    rna_structures_reference_csv: Path

    model_name: str
    n_tokens: int
    temperature: float
    top_k: int
    batched: bool
    batch_size: int
    n_sample_per_prompt: int

    rc_truth: bool
    return_both: bool
    filter_min_length: int = 50
    filter_max_length: int = 400
    filter_partial_bool: bool = False
    segmasker_threshold: float = 0.2
    run_esm_fold: bool = True
    plddt_threshold: float = 0.3
    ptm_threshold: float = 0.0

    write_trf_to_csv: bool = True
    rna_structure_filter_reference_csv: Optional[Path] = None
    rna_structure_filter_script: Optional[Path] = None
    rna_structure_filter_structure_type: str = 'both'
    rna_structure_filter_min_similarity: float = 0.7
    rna_structure_filter_pre_filter_threshold: float = 0.7
    rna_structure_filter_batch_size: int = 100
    rna_structure_filter_max_results: Optional[int] = None
    rna_structure_filter_cpus: Optional[int] = None
    rna_sequence_filter_reference_csv: Optional[Path] = None
    rna_sequence_filter_script: Optional[Path] = None
    rna_sequence_filter_min_identity: float = 70.0
    rna_sequence_filter_processes: Optional[int] = None
    hmmscan_binary: str = 'hmmscan'
    hmmscan_pfam_db_path: Optional[Path] = None
    hmmscan_cpu: int = 4
    pfam_allowed_names: Optional[List[str]] = None
    pfam_evalue_threshold: float = 0.05
    rna_require_hairpin: bool = True
    rna_minimum_mfe: float = -3.0
    rna_require_all_bases: bool = True
    cmscan_binary: str = 'cmscan'
    cmscan_model_paths: Optional[List[Path]] = None
    cmscan_evalue_threshold: float = 0.05
    cmscan_allowed_families: Optional[List[str]] = None

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
    output_trf_csv: Path = field(init=False)
    rna_fold_csv: Path = field(init=False)
    ta_pairs_csv: Path = field(init=False)
    rna_candidates_csv: Path = field(init=False)
    rna_structure_matches_csv: Path = field(init=False)
    rna_sequence_matches_csv: Path = field(init=False)
    rna_candidates_fasta: Path = field(init=False)
    hmmscan_domtblout: Path = field(init=False)
    hmmscan_hits_csv: Path = field(init=False)
    cmscan_tblout_dir: Path = field(init=False)
    cmscan_hits_csv: Path = field(init=False)
    final_candidates_csv: Path = field(init=False)

    def __post_init__(self) -> None:
        self.input_prompts = Path(self.input_prompts)
        self.output_dir = Path(self.output_dir)
        self.output_dir.mkdir(parents=True, exist_ok=True)
        self.segmasker_path = Path(self.segmasker_path)
        self.trf_path = Path(self.trf_path)
        self.rna_structures_reference_csv = Path(
            self.rna_structures_reference_csv)
        for name in ('rna_structure_filter_script',
                     'rna_sequence_filter_script',
                     'rna_structure_filter_reference_csv',
                     'rna_sequence_filter_reference_csv',
                     'hmmscan_pfam_db_path'):
            val = getattr(self, name)
            if val:
                setattr(self, name, Path(val))
        if self.cmscan_model_paths:
            self.cmscan_model_paths = [Path(p)
                                       for p in self.cmscan_model_paths]
        if isinstance(self.cmscan_allowed_families, str):
            self.cmscan_allowed_families = [self.cmscan_allowed_families]

        out = self.output_dir
        self.evo_gen_seqs_file_save_location = out / 'generated_sequences.csv'
        self.all_seqs_fasta = out / 'all_sequences.fasta'
        self.proteins_file = out / 'proteins.fasta'
        self.orfs_file = out / 'orfs.fasta'
        self.filtered_proteins_file = out / 'filtered_proteins.fasta'
        self.output_folds_file = out / 'folds.csv'
        self.output_filtered_folds = out / 'filtered_folds.csv'
        self.output_trf_csv = out / 'tandem_repeats.csv'
        self.rna_fold_csv = out / 'rna_fold_predictions.csv'
        self.ta_pairs_csv = out / 'type_iii_pairs.csv'
        self.rna_candidates_csv = out / 'rna_candidates.csv'
        self.rna_structure_matches_csv = out / 'rna_structure_matches.csv'
        self.rna_sequence_matches_csv = out / 'rna_sequence_matches.csv'
        self.rna_candidates_fasta = out / 'rna_candidates.fasta'
        self.hmmscan_domtblout = out / 'hmmscan.domtblout'
        self.hmmscan_hits_csv = out / 'hmmscan_hits.csv'
        self.cmscan_tblout_dir = out / 'cmscan_tblout'
        self.cmscan_tblout_dir.mkdir(parents=True, exist_ok=True)
        self.cmscan_hits_csv = out / 'cmscan_hits.csv'
        self.final_candidates_csv = out / 'filtered_type_iii_candidates.csv'


def load_config(config_path) -> Config:
    with open(config_path) as f:
        data = yaml.safe_load(f)
    if not isinstance(data, dict):
        raise ValueError(f'Configuration must be a mapping: {config_path}')
    return Config(**data)


# ---------------------------------------------------------------------------
# Tandem Repeat Finder
# ---------------------------------------------------------------------------

def load_generated_sequences(csv_path) -> Dict[str, str]:
    """UUID -> DNA map from the sampling CSV."""
    import pandas as pd

    df = pd.read_csv(csv_path)
    if 'UUID' in df.columns and 'Generated Sequence' in df.columns:
        return dict(zip(df['UUID'].astype(str),
                        df['Generated Sequence'].astype(str)))
    return dict(zip(df.iloc[:, 0].astype(str), df.iloc[:, 2].astype(str)))


# TRF recommended parameters (match score 2, mismatch 7, indel 7, pm 80,
# pi 10, minscore 50, maxperiod 500) with -ngs streaming output
_TRF_ARGS = ('2', '7', '7', '80', '10', '50', '500', '-h', '-ngs')
# TRF -ngs data rows have 15 fields: the consensus PATTERN precedes the
# actual repeat sequence
_TRF_COLUMNS = ('Start', 'End', 'Period Size', 'Copy Number',
                'Consensus Size', 'Percent Match', 'Percent Indels',
                'Alignment Score', 'A', 'C', 'G', 'T', 'Entropy',
                'Consensus Pattern', 'Repeat Sequence')
_TRF_TYPES = (int, int, float, float, int, float, float, int, int, int,
              int, int, float, str, str)


def run_tandem_repeat_finder(sequence: str, root_id: str, trf_path):
    """Run TRF on one sequence; parse the -ngs stdout table."""
    import pandas as pd

    with tempfile.NamedTemporaryFile('w', delete=False) as tf:
        tf.write(f'>sequence\n{sequence}\n')
        in_path = tf.name
    try:
        result = subprocess.run([str(trf_path), in_path, *_TRF_ARGS],
                                capture_output=True, text=True)
    finally:
        Path(in_path).unlink(missing_ok=True)
    repeats = []
    for line in result.stdout.splitlines():
        if line.startswith('@'):
            continue
        data = line.strip().split()
        if len(data) < 14:
            continue
        row: Dict[str, Any] = {'Root ID': root_id}
        for col, typ, val in zip(_TRF_COLUMNS, _TRF_TYPES, data):
            row[col] = typ(val)
        # TRF coordinates are 1-based inclusive
        row['Full TRF Region'] = sequence[row['Start'] - 1:row['End']]
        repeats.append(row)
    return pd.DataFrame(repeats)


def get_tandem_repeats(filtered_folds, sequences_csv, config: Config):
    """TRF over every surviving generation's DNA."""
    import pandas as pd

    if filtered_folds.empty:
        return pd.DataFrame()
    seq_map = load_generated_sequences(sequences_csv)
    frames = []
    for _, row in filtered_folds.iterrows():
        root_id = str(row['Evo Sequence ID']).split('_')[0]
        dna = seq_map.get(root_id)
        if not dna:
            continue
        result = run_tandem_repeat_finder(dna, root_id, config.trf_path)
        if not result.empty:
            frames.append(result)
    if not frames:
        return pd.DataFrame()
    trf_df = pd.concat(frames, ignore_index=True)
    if config.write_trf_to_csv:
        trf_df.to_csv(config.output_trf_csv, index=False)
    return trf_df


# ---------------------------------------------------------------------------
# RNA folding (ViennaRNA) + hairpin heuristics
# ---------------------------------------------------------------------------

def predict_rna_structure(rna_sequence: str) -> Tuple[str, float]:
    """ViennaRNA MFE fold -> (dot-bracket, mfe)."""
    import RNA as ViennaRNA
    structure, mfe = ViennaRNA.fold_compound(rna_sequence).mfe()
    return structure, mfe


def predict_hairpins(dot_bracket: str) -> List[Tuple[int, int, int, int]]:
    """Innermost hairpins: '(' ... ')' spans (>4 nt) whose interior is all
    unpaired. Returns (stem_start, stem_end, loop_start, loop_end)."""
    hairpins = []
    stack: List[int] = []
    for idx, ch in enumerate(dot_bracket):
        if ch == '(':
            stack.append(idx)
        elif ch == ')' and stack:
            start = stack.pop()
            if idx - start <= 4:
                continue
            if all(dot_bracket[p] == '.' for p in range(start + 1, idx)):
                hairpins.append((start, idx, start + 1, idx - 1))
    return hairpins


def _transcribe(dna: str) -> str:
    return dna.upper().replace('T', 'U')


def fold_trfs(trf_df, output_csv):
    """Fold each TRF region as RNA; record structure/MFE/hairpins."""
    import pandas as pd

    columns = ['Evo Sequence ID', 'Description', 'DNA Sequence',
               'RNA Sequence', 'Secondary Structure', 'MFE', 'Hairpins']
    if trf_df.empty:
        empty = pd.DataFrame(columns=columns)
        empty.to_csv(output_csv, index=False)
        return empty
    rows = []
    for _, r in trf_df.iterrows():
        dna = str(r['Full TRF Region'])
        # key each fold by its TRF REGION, not just the root generation: a
        # root-only key makes the downstream join a Cartesian product when
        # one generation has several repeats
        seq_id = (f"{r['Root ID']}_{int(r['Start'])}_{int(r['End'])}"
                  if 'Start' in trf_df.columns else str(r['Root ID']))
        rna = _transcribe(dna)
        structure, mfe = predict_rna_structure(rna)
        rows.append({
            'Evo Sequence ID': seq_id,
            'Description': seq_id,
            'DNA Sequence': dna,
            'RNA Sequence': rna,
            'Secondary Structure': structure,
            'MFE': mfe,
            'Hairpins': predict_hairpins(structure),
        })
    df = pd.DataFrame(rows)
    df.to_csv(output_csv, index=False)
    return df


def _hairpin_exists(value: Any) -> bool:
    if isinstance(value, list):
        return bool(value)
    if isinstance(value, str):
        value = value.strip()
        if not value or value == '[]':
            return False
        try:
            return bool(ast.literal_eval(value))
        except (ValueError, SyntaxError):
            return False
    return bool(value)


def _has_all_bases(dna: Any) -> bool:
    seq = str(dna or '').upper()
    return all(b in seq for b in 'ACGT')


def filter_folded_trfs(trf_df, fold_trf_df, config: Config):
    """Hairpin / MFE / base-composition QC on folded TRFs."""
    import pandas as pd

    if fold_trf_df.empty:
        return fold_trf_df, set()
    mask = pd.Series(True, index=fold_trf_df.index)
    if config.rna_require_hairpin:
        mask &= fold_trf_df['Hairpins'].apply(_hairpin_exists)
    if config.rna_minimum_mfe is not None:
        mask &= fold_trf_df['MFE'].apply(
            lambda v: pd.notna(v) and float(v) <= config.rna_minimum_mfe)
    if config.rna_require_all_bases:
        mask &= fold_trf_df['DNA Sequence'].apply(_has_all_bases)
    filtered = fold_trf_df[mask].copy()
    filtered.to_csv(config.rna_fold_csv, index=False)
    return filtered, set(filtered['Evo Sequence ID'].astype(str))


def get_at_pairs(rna_fold_df, filtered_folds, output_csv):
    """Join hairpin-positive RNAs with proteins from the same generation."""
    import pandas as pd

    if rna_fold_df.empty or filtered_folds.empty:
        pd.DataFrame().to_csv(output_csv, index=False)
        return pd.DataFrame()
    rna_fold_df = rna_fold_df.copy()
    rna_fold_df['Has Hairpin'] = rna_fold_df['Hairpins'].apply(
        _hairpin_exists)
    hairpin_df = rna_fold_df[rna_fold_df['Has Hairpin']].copy()
    filtered_folds = filtered_folds.copy()
    filtered_folds['Root ID'] = (filtered_folds['Evo Sequence ID']
                                 .astype(str).str.split('_').str[0])
    merged = hairpin_df.merge(filtered_folds, left_on='Evo Sequence ID',
                              right_on='Root ID', how='inner',
                              suffixes=('', '_Protein'))
    merged.to_csv(output_csv, index=False)
    return merged


# ---------------------------------------------------------------------------
# Candidate table + downstream filters
# ---------------------------------------------------------------------------

_CANDIDATE_RENAME = {
    'Period Size': 'Period_size', 'Copy Number': 'Copy_number',
    'Consensus Size': 'Consensus_size', 'Percent Match': 'Percent_match',
    'Percent Indels': 'Percent_indels', 'Alignment Score':
    'Alignment_score', 'Repeat Sequence': 'Sequence',
}
_CANDIDATE_ORDER = [
    'Root ID', 'Sequence_ID', 'Start', 'End', 'Period_size', 'Copy_number',
    'Consensus_size', 'Percent_match', 'Percent_indels', 'Alignment_score',
    'A', 'C', 'G', 'T', 'Entropy', 'Sequence', 'Full TRF Region',
    'Consensus RNA', 'Consensus Structure', 'Consensus MFE',
    'Consensus Hairpins', 'Full RNA', 'Full Structure', 'Full MFE',
    'Full Hairpins',
]


def prepare_rna_candidate_table(trf_df, fold_trf_df, output_csv):
    """Standardize TRF + fold outputs into the downstream-filter schema."""
    import pandas as pd

    if trf_df.empty or fold_trf_df.empty:
        pd.DataFrame().to_csv(output_csv, index=False)
        return pd.DataFrame()
    std = trf_df.rename(columns={k: v for k, v in _CANDIDATE_RENAME.items()
                                 if k in trf_df.columns}).copy()
    if 'Sequence_ID' not in std.columns:
        std['Sequence_ID'] = std.apply(
            lambda r: f"{r['Root ID']}_{int(r['Start'])}_{int(r['End'])}",
            axis=1)
    merged = std.merge(fold_trf_df, left_on='Sequence_ID',
                       right_on='Evo Sequence ID', how='inner',
                       suffixes=('', '_RNA'))
    if merged.empty:
        merged.to_csv(output_csv, index=False)
        return merged
    merged['Full RNA'] = merged['RNA Sequence']
    merged['Full Structure'] = merged['Secondary Structure']
    merged['Full MFE'] = merged['MFE']
    merged['Full Hairpins'] = merged['Hairpins']
    for consensus, full in [('Consensus RNA', 'Full RNA'),
                            ('Consensus Structure', 'Full Structure'),
                            ('Consensus MFE', 'Full MFE'),
                            ('Consensus Hairpins', 'Full Hairpins')]:
        if consensus not in merged.columns:
            merged[consensus] = merged[full]
    cols = [c for c in _CANDIDATE_ORDER if c in merged.columns]
    merged.loc[:, cols].to_csv(output_csv, index=False)
    return merged


def write_rna_candidates_fasta(candidate_table, fasta_path: Path) -> None:
    if candidate_table.empty:
        Path(fasta_path).unlink(missing_ok=True)
        return
    names, seqs = [], []
    for _, row in candidate_table.iterrows():
        rna = str(row.get('Full RNA', ''))
        if not rna:
            continue
        seq_id = str(row.get('Sequence_ID',
                             row.get('Root ID', 'candidate')))
        names.append(f"{seq_id} {row.get('Root ID', seq_id)}")
        seqs.append(rna)
    if names:
        write_fasta(str(fasta_path), names, seqs, width=60)
    else:
        Path(fasta_path).unlink(missing_ok=True)


def run_rna_structure_filter(candidates_csv, config: Config) -> Set[str]:
    """Delegate to the structure-similarity search CLI
    (semantic_design/bin/t3ta_structure_comparison.py)."""
    import pandas as pd

    script = config.rna_structure_filter_script
    target = (config.rna_structure_filter_reference_csv
              or config.rna_structures_reference_csv)
    if not script or not Path(script).exists():
        return set()
    if not target or not Path(target).exists():
        return set()
    if not Path(candidates_csv).exists():
        return set()
    cmd = [sys.executable, str(script),
           '--query', str(candidates_csv), '--target', str(target),
           '--output', str(config.rna_structure_matches_csv),
           '--structure-type', config.rna_structure_filter_structure_type,
           '--min-similarity',
           str(config.rna_structure_filter_min_similarity),
           '--pre-filter-threshold',
           str(config.rna_structure_filter_pre_filter_threshold),
           '--batch-size', str(config.rna_structure_filter_batch_size)]
    if config.rna_structure_filter_max_results:
        cmd += ['--max-results', str(config.rna_structure_filter_max_results)]
    if config.rna_structure_filter_cpus:
        cmd += ['--cpus', str(config.rna_structure_filter_cpus)]
    subprocess.run(cmd, check=True)
    if not config.rna_structure_matches_csv.exists():
        return set()
    results = pd.read_csv(config.rna_structure_matches_csv)
    if 'Query_ID' not in results.columns:
        return set()
    return set(results['Query_ID'].astype(str))


def run_rna_sequence_filter(candidates_csv, config: Config) -> Set[str]:
    """Delegate to the sequence-identity comparison CLI."""
    import pandas as pd

    script = config.rna_sequence_filter_script
    reference = (config.rna_sequence_filter_reference_csv
                 or config.rna_structures_reference_csv)
    if not script or not Path(script).exists():
        return set()
    if not reference or not Path(reference).exists():
        return set()
    if not Path(candidates_csv).exists():
        return set()
    cmd = [sys.executable, str(script),
           '--reference_csv', str(reference),
           '--comparison_csv', str(candidates_csv),
           '--output_csv', str(config.rna_sequence_matches_csv),
           '--min-identity', str(config.rna_sequence_filter_min_identity)]
    if config.rna_sequence_filter_processes:
        cmd += ['--processes', str(config.rna_sequence_filter_processes)]
    subprocess.run(cmd, check=True)
    if not config.rna_sequence_matches_csv.exists():
        return set()
    results = pd.read_csv(config.rna_sequence_matches_csv)
    if 'comp_root_id' not in results.columns \
            or 'identity_percent' not in results.columns:
        return set()
    passing = results[results['identity_percent']
                      >= config.rna_sequence_filter_min_identity]
    return set(passing['comp_root_id'].astype(str))


def parse_domtblout(domtbl_path):
    """hmmscan --domtblout -> DataFrame (t3ta column subset)."""
    import pandas as pd

    if not Path(domtbl_path).exists():
        return pd.DataFrame()
    opt = lambda f, v: None if v == '-' else f(v)
    hits = []
    with open(domtbl_path, encoding='utf-8') as f:
        for line in f:
            if line.startswith('#'):
                continue
            x = line.strip().split()
            if len(x) < 23:
                continue
            hits.append({
                'pfam_id': x[0], 'pfam_accession': x[1],
                'sequence_id': x[3],
                'e_value': opt(float, x[11]), 'score': opt(float, x[13]),
                'bias': opt(float, x[14]), 'hmm_from': opt(int, x[15]),
                'hmm_to': opt(int, x[16]), 'ali_from': opt(int, x[17]),
                'ali_to': opt(int, x[18]),
                'pfam_name': ' '.join(x[22:]),
            })
    return pd.DataFrame(hits)


def load_allowed_pfam_names(names: Optional[List[str]]) -> Set[str]:
    if not names:
        return set()
    return {str(n).strip().strip('"') for n in names if str(n).strip()}


def run_hmmscan_filter(config: Config):
    """hmmscan filtered proteins vs Pfam; whitelist + E-value filter."""
    import pandas as pd

    if (not config.hmmscan_pfam_db_path
            or not Path(config.hmmscan_pfam_db_path).exists()
            or not Path(config.filtered_proteins_file).exists()):
        return pd.DataFrame()
    subprocess.run(
        [config.hmmscan_binary, '--domtblout',
         str(config.hmmscan_domtblout), '--cpu', str(config.hmmscan_cpu),
         str(config.hmmscan_pfam_db_path),
         str(config.filtered_proteins_file)],
        check=True)
    hits = parse_domtblout(config.hmmscan_domtblout)
    hits.to_csv(config.hmmscan_hits_csv, index=False)
    allowed = load_allowed_pfam_names(config.pfam_allowed_names)
    out = hits
    if allowed and not out.empty:
        norm = {n.strip().strip('"') for n in allowed}
        out = out[out['pfam_name'].apply(
            lambda n: str(n).strip().strip('"') in norm)]
    if config.pfam_evalue_threshold is not None and not out.empty:
        out = out[out['e_value'].apply(
            lambda v: pd.notna(v)
            and float(v) <= config.pfam_evalue_threshold)]
    out.to_csv(config.hmmscan_hits_csv, index=False)
    return out


def load_allowed_families(config: Config) -> Set[str]:
    if not config.cmscan_allowed_families:
        return set()
    return {str(n).strip().lower() for n in config.cmscan_allowed_families}


def parse_cmscan_tblout(tblout_path):
    """Infernal cmscan --tblout -> DataFrame."""
    import pandas as pd

    if not Path(tblout_path).exists():
        return pd.DataFrame()
    rows = []
    with open(tblout_path, encoding='utf-8') as f:
        for line in f:
            if not line.strip() or line.startswith('#'):
                continue
            x = line.strip().split()
            if len(x) < 17:
                continue
            try:
                rows.append({
                    'target_name': x[0], 'target_accession': x[1],
                    'sequence_id': x[2], 'sequence_accession': x[3],
                    'model_type': x[4], 'model_start': int(x[5]),
                    'model_end': int(x[6]), 'sequence_start': int(x[7]),
                    'sequence_end': int(x[8]), 'strand': x[9],
                    'truncation': x[10], 'pass': x[11], 'gc': float(x[12]),
                    'bias': float(x[13]), 'score': float(x[14]),
                    'e_value': float(x[15]), 'inc': x[16],
                    'description': ' '.join(x[17:]),
                })
            except ValueError:
                continue
    return pd.DataFrame(rows)


def run_cmscan_filter(candidate_table, config: Config):
    """cmscan candidate RNAs vs each CM; family whitelist + E-value."""
    import pandas as pd

    if candidate_table.empty or not config.cmscan_model_paths \
            or not config.rna_candidates_fasta.exists():
        pd.DataFrame().to_csv(config.cmscan_hits_csv, index=False)
        return pd.DataFrame()
    frames = []
    for idx, cm_path in enumerate(config.cmscan_model_paths):
        if not Path(cm_path).exists():
            continue
        tblout = config.cmscan_tblout_dir / \
            f'cmscan_{Path(cm_path).stem}_{idx}.tblout'
        subprocess.run(
            [config.cmscan_binary, '--tblout', str(tblout), str(cm_path),
             str(config.rna_candidates_fasta)], check=True)
        df = parse_cmscan_tblout(tblout)
        if not df.empty:
            df['cm_source'] = str(cm_path)
            frames.append(df)
    if not frames:
        return pd.DataFrame()
    hits = pd.concat(frames, ignore_index=True)
    allowed = load_allowed_families(config)
    if allowed:
        hits = hits[hits['target_name'].str.lower().isin(allowed)]
    if not hits.empty:
        hits = hits[hits['e_value'] <= config.cmscan_evalue_threshold]
    if hits.empty:
        hits.to_csv(config.cmscan_hits_csv, index=False)
        return hits
    seq_to_root = dict(zip(candidate_table['Sequence_ID'].astype(str),
                           candidate_table['Root ID'].astype(str)))
    hits = hits.copy()
    hits['Root ID'] = hits['sequence_id'].map(seq_to_root)
    hits = hits.dropna(subset=['Root ID'])
    hits.to_csv(config.cmscan_hits_csv, index=False)
    return hits


# ---------------------------------------------------------------------------
# Orchestration
# ---------------------------------------------------------------------------

def run_pipeline(config_path) -> None:
    import pandas as pd

    config = load_config(config_path)
    prompt_seqs = read_prompts(str(config.input_prompts), config.batched,
                               config.batch_size)
    model, tokenizer = model_load(config.model_name,
                                  checkpoint_path=config.checkpoint_path,
                                  random_init=config.random_init)
    prompts, sequences, scores, ids = sample_model(
        prompt_batches=prompt_seqs, model=model, tokenizer=tokenizer,
        file_save_location=str(config.evo_gen_seqs_file_save_location),
        n_tokens=config.n_tokens, temp=config.temperature,
        top_k=config.top_k, batched=config.batched,
        n_sample_per_prompt=config.n_sample_per_prompt,
        force_prompt_threshold=2)

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

    fold_stats = fold_proteins(str(config.filtered_proteins_file),
                               str(config.output_folds_file))
    if config.run_esm_fold:
        filtered_folds = filter_proteins_by_threshold(
            fold_stats, str(config.output_filtered_folds),
            config.plddt_threshold, config.ptm_threshold)
    else:
        filtered_folds = fold_stats
    if isinstance(filtered_folds, pd.DataFrame) and not filtered_folds.empty:
        filtered_folds = filtered_folds.copy()
        if 'Root ID' not in filtered_folds.columns:
            filtered_folds['Root ID'] = (
                filtered_folds['Evo Sequence ID'].astype(str)
                .str.split('_').str[0])

    trf_df = get_tandem_repeats(
        filtered_folds, config.evo_gen_seqs_file_save_location, config)
    fold_trf_df = fold_trfs(trf_df, config.rna_fold_csv)
    fold_trf_df, trf_root_ids = filter_folded_trfs(trf_df, fold_trf_df,
                                                   config)
    if trf_root_ids:
        trf_df = trf_df[trf_df['Root ID'].astype(str)
                        .isin(trf_root_ids)].copy()
        trf_df.to_csv(config.output_trf_csv, index=False)
        if isinstance(filtered_folds, pd.DataFrame) \
                and not filtered_folds.empty:
            filtered_folds = filtered_folds[
                filtered_folds['Root ID'].astype(str)
                .isin(trf_root_ids)].copy()
    else:
        trf_df = trf_df.iloc[0:0] if isinstance(trf_df, pd.DataFrame) \
            else pd.DataFrame()
        trf_df.to_csv(config.output_trf_csv, index=False)
        if isinstance(filtered_folds, pd.DataFrame):
            filtered_folds = filtered_folds.iloc[0:0]

    ta_pairs_df = get_at_pairs(fold_trf_df, filtered_folds,
                               config.ta_pairs_csv)

    candidate_table = prepare_rna_candidate_table(
        trf_df, fold_trf_df, config.rna_candidates_csv)
    if not candidate_table.empty:
        write_rna_candidates_fasta(candidate_table,
                                   config.rna_candidates_fasta)
        rna_structure_hits = run_rna_structure_filter(
            config.rna_candidates_csv, config)
        rna_sequence_hits = run_rna_sequence_filter(
            config.rna_candidates_csv, config)
        cmscan_hits = run_cmscan_filter(candidate_table, config)
    else:
        Path(config.rna_candidates_fasta).unlink(missing_ok=True)
        rna_structure_hits, rna_sequence_hits = set(), set()
        cmscan_hits = pd.DataFrame()

    hmmscan_hits = run_hmmscan_filter(config)
    hmmscan_root_ids: Set[str] = set()
    if not hmmscan_hits.empty:
        hmmscan_root_ids = set(hmmscan_hits['sequence_id'].astype(str)
                               .str.split('_').str[0])
    cmscan_root_ids: Set[str] = set()
    if isinstance(cmscan_hits, pd.DataFrame) and not cmscan_hits.empty:
        cmscan_root_ids = set(cmscan_hits['Root ID'].astype(str))

    keep = (rna_structure_hits | rna_sequence_hits
            | hmmscan_root_ids | cmscan_root_ids)

    if isinstance(filtered_folds, pd.DataFrame) and not filtered_folds.empty:
        final = (filtered_folds[filtered_folds['Root ID'].astype(str)
                                .isin(keep)].copy()
                 if keep else filtered_folds.iloc[0:0].copy())
        final.to_csv(config.final_candidates_csv, index=False)
    if not ta_pairs_df.empty:
        kept_pairs = (ta_pairs_df[ta_pairs_df['Root ID'].astype(str)
                                  .isin(keep)].copy()
                      if keep else ta_pairs_df.iloc[0:0].copy())
        kept_pairs.to_csv(config.ta_pairs_csv, index=False)
    print('Pipeline completed successfully.', flush=True)


if __name__ == '__main__':
    parser = argparse.ArgumentParser(
        description='Run the Type III TA sampling pipeline (YAML config).')
    parser.add_argument('--config', required=True)
    run_pipeline(Path(parser.parse_args().config))
