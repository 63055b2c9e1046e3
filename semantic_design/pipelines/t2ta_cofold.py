"""Type-II TA cofolding + pDockQ scoring pipeline.

Parity with reference `semantic_design/pipelines/t2ta_cofold.py`: take the
protein pairs CSV from t2ta_sample, cofold each pair with ESMFold multimer
(':'-joined chains), compute pDockQ from the PDB coordinates (the standard
sigmoid fit of FoldDock: 0.724/(1+exp(-0.052 (x-152.611)))+0.018 on
x = interface-pLDDT * log10(contacts+1)), and emit ranked/thresholded
summaries. Same YAML schema and artifact names.

One deliberate deviation: the reference reads chain-2 interface pLDDTs
without the chain offset (`plddt[unique(contacts[:, 1])]` where
contacts[:, 1] indexes the dists[:l1, l1:] SUBMATRIX — i.e., it samples
chain-1 residues twice); `calc_pdockq` here applies the FoldDock `+ l1`
offset, so if_pLDDT (and thus pDockQ) reflects the actual interface.
Documented like the reference's 'GGU' codon typo (evo_tpu/utils.py).

Usage: python -m semantic_design.pipelines.t2ta_cofold --config <yaml>
"""

from __future__ import annotations

import argparse
import hashlib
import os
from collections import OrderedDict, defaultdict
from dataclasses import dataclass, field
from pathlib import Path
from typing import Any, Dict, List, Tuple

import numpy as np
import yaml


def sanitize_identifier(value: str) -> str:
    """Alphanumeric/-/_ only; 'pair' when nothing survives."""
    safe = ''.join(ch for ch in value if ch.isalnum() or ch in ('-', '_'))
    return safe or 'pair'


def shorten_identifier(value: str, max_length: int = 120) -> str:
    """Bound identifier length via an md5 suffix (filesystem limits)."""
    sanitized = sanitize_identifier(value)
    if len(sanitized) <= max_length:
        return sanitized
    digest = hashlib.md5(sanitized.encode('utf-8')).hexdigest()[:10]
    return f'{sanitized[:max_length - len(digest) - 1]}_{digest}'


@dataclass
class CofoldConfig:
    """YAML-config dataclass (field set = reference CofoldConfig)."""

    pairs_csv: Path
    output_dir: Path

    root_id_col: str = 'Root_ID'
    sequence1_col: str = 'Amino Acid Sequence 1'
    sequence2_col: str = 'Amino Acid Sequence 2'
    sequence1_id_col: str = 'Evo Sequence ID 1'
    sequence2_id_col: str = 'Evo Sequence ID 2'

    run_esmfold: bool = True
    run_pdockq: bool = True
    pdockq_threshold: float = 0.23
    device: str = 'cpu'

    cofold_input_csv: Path = field(init=False)
    esmfold_output_dir: Path = field(init=False)
    pdockq_scores_csv: Path = field(init=False)
    pdockq_summary_csv: Path = field(init=False)
    pdockq_filtered_csv: Path = field(init=False)
    pdockq_filtered_fasta: Path = field(init=False)

    def __post_init__(self) -> None:
        self.pairs_csv = Path(self.pairs_csv)
        self.output_dir = Path(self.output_dir)
        self.output_dir.mkdir(parents=True, exist_ok=True)
        self.cofold_input_csv = self.output_dir / 'cofold_input.csv'
        self.esmfold_output_dir = self.output_dir / 'esmfold_structures'
        self.esmfold_output_dir.mkdir(parents=True, exist_ok=True)
        self.pdockq_scores_csv = self.output_dir / 'pdockq_scores.csv'
        self.pdockq_summary_csv = self.output_dir / 'pdockq_summary.csv'
        self.pdockq_filtered_csv = \
            self.output_dir / 'pdockq_high_confidence.csv'
        self.pdockq_filtered_fasta = \
            self.output_dir / 'pdockq_high_confidence.fasta'


def load_config(config_path) -> CofoldConfig:
    with open(config_path) as f:
        data = yaml.safe_load(f)
    if not isinstance(data, dict):
        raise ValueError(f'Configuration must be a mapping: {config_path}')
    return CofoldConfig(**data)


def prepare_cofold_inputs(config: CofoldConfig):
    """Pairs CSV -> folding table [sequence1, sequence2, id_pair]."""
    import pandas as pd

    df = pd.read_csv(config.pairs_csv)
    required = [config.root_id_col, config.sequence1_col,
                config.sequence2_col, config.sequence1_id_col,
                config.sequence2_id_col]
    missing = [c for c in required if c not in df.columns]
    if missing:
        raise ValueError(
            f'Missing required columns in {config.pairs_csv}: {missing}')
    ids = [shorten_identifier(f'{r[config.sequence1_id_col]}_'
                              f'{r[config.sequence2_id_col]}')
           for _, r in df.iterrows()]
    cofold_df = pd.DataFrame({
        'sequence1': df[config.sequence1_col].astype(str),
        'sequence2': df[config.sequence2_col].astype(str),
        'id_pair': ids,
    }).drop_duplicates(subset='id_pair').reset_index(drop=True)
    cofold_df.to_csv(config.cofold_input_csv, index=False)
    return cofold_df


def run_esmfold(config: CofoldConfig, cofold_df) -> None:
    """Cofold each pair as a ':'-joined multimer; one PDB per pair dir.
    Skips pairs outside [100, 1024] total length and already-folded pairs
    (restartable, like the reference)."""
    import torch
    from transformers import AutoTokenizer, EsmForProteinFolding

    MIN_LEN, MAX_LEN = 100, 1024
    model = EsmForProteinFolding.from_pretrained('facebook/esmfold_v1')
    model = model.eval().to(config.device)
    if config.device != 'cpu':
        model.esm = model.esm.half()
    tok = AutoTokenizer.from_pretrained('facebook/esmfold_v1')

    for seq1, seq2, pair_id in zip(cofold_df['sequence1'],
                                   cofold_df['sequence2'],
                                   cofold_df['id_pair']):
        total = len(seq1) + len(seq2)
        if total < MIN_LEN or total > MAX_LEN:
            continue
        pair_dir = config.esmfold_output_dir / pair_id
        pdb_path = pair_dir / f'{pair_id}.pdb'
        if pdb_path.exists():
            continue
        # multimer trick: chains joined by a long glycine linker would
        # change numbering; ESMFold supports ':' separators natively via
        # tokenizer position offsets in infer(); transformers' port takes
        # the joined string with ':'
        multimer = f'{seq1}:{seq2}'
        with torch.inference_mode():
            inputs = tok([multimer.replace(':', '')], return_tensors='pt',
                         add_special_tokens=False).to(config.device)
            # offset chain-2 positions so ESMFold treats them as a new chain
            position_ids = torch.arange(len(seq1) + len(seq2))[None]
            position_ids[0, len(seq1):] += 512
            out = model(**inputs, position_ids=position_ids.to(config.device))
            pdb = model.output_to_pdb(out)[0]
        # transformers' output_to_pdb emits ONE chain; relabel chain 2 by
        # residue order so the pDockQ stage sees a two-chain complex
        pdb = _split_pdb_chains(pdb, len(seq1))
        pair_dir.mkdir(parents=True, exist_ok=True)
        pdb_path.write_text(pdb)


def _split_pdb_chains(pdb: str, l1: int) -> str:
    """Relabel residues after the first `l1` (in order of appearance) as
    chain B. ESMFold's transformers port writes the whole cofolded
    multimer as a single chain A, which would make every pDockQ 0."""
    out_lines = []
    seen: 'OrderedDict[str, None]' = OrderedDict()
    for line in pdb.splitlines():
        if line.startswith(('ATOM', 'HETATM', 'TER')) and len(line) > 26:
            res_key = line[22:27]
            if line.startswith(('ATOM', 'HETATM')):
                seen.setdefault(res_key, None)
            if res_key in seen:
                chain = 'A' if list(seen).index(res_key) < l1 else 'B'
                line = line[:21] + chain + line[22:]
        out_lines.append(line)
    return '\n'.join(out_lines) + '\n'


def _parse_atm_record(line: str) -> Dict[str, Any]:
    return {
        'atm_name': line[12:16].strip(),
        'res_name': line[17:20].strip(),
        'chain': line[21],
        'res_no': int(line[22:26]),
        'coords': (float(line[30:38]), float(line[38:46]),
                   float(line[46:54])),
        'B': float(line[60:66]),
    }


def pdb_to_coords(pdb: str):
    """CB (CA for GLY) coordinates per chain + per-residue pLDDT array."""
    chain_coords: Dict[str, List[List[float]]] = defaultdict(list)
    plddt_dict: 'OrderedDict[str, List[float]]' = OrderedDict()
    for line in pdb.splitlines():
        if not line.startswith('ATOM'):
            continue
        rec = _parse_atm_record(line)
        if rec['atm_name'] == 'CB' or (rec['atm_name'] == 'CA'
                                       and rec['res_name'] == 'GLY'):
            chain_coords[rec['chain']].append(list(rec['coords']))
            plddt_dict.setdefault(f"{rec['chain']}{rec['res_no']}",
                                  []).append(rec['B'])
    plddt = np.array([np.mean(v) for v in plddt_dict.values()])
    return chain_coords, plddt


def calc_pdockq(chain_coords, plddt) -> Tuple[float, float, int, float]:
    """pDockQ of a 2-chain complex from interface contacts (<=8A CB-CB)."""
    chains = list(chain_coords.keys())
    if len(chains) < 2 or plddt.size == 0:
        return 0.0, 0.0, 0, 0.0
    c1 = np.array(chain_coords[chains[0]])
    c2 = np.array(chain_coords[chains[1]])
    mat = np.append(c1, c2, axis=0)
    dists = np.sqrt(((mat[:, None, :] - mat[None, :, :]) ** 2).sum(-1))
    l1 = len(c1)
    contacts = np.argwhere(dists[:l1, l1:] <= 8)
    if contacts.size == 0:
        return 0.0, 0.0, 0, float(plddt.mean())
    # contacts[:, 1] is local to chain 2 — offset by l1 into the
    # concatenated per-residue plddt array (FoldDock convention)
    avg_if_plddt = float(np.average(np.concatenate(
        [plddt[np.unique(contacts[:, 0])],
         plddt[np.unique(contacts[:, 1]) + l1]])))
    n_if_contacts = int(contacts.shape[0])
    x = avg_if_plddt * np.log10(n_if_contacts + 1)
    pdockq = float(0.724 / (1 + np.exp(-0.052 * (x - 152.611))) + 0.018)
    return pdockq, avg_if_plddt, n_if_contacts, float(plddt.mean())


def extract_pdockq_scores(config: CofoldConfig) -> None:
    """Score every PDB under the esmfold output dir -> pdockq_scores.csv."""
    import pandas as pd

    records = []
    for folder, _, files in os.walk(config.esmfold_output_dir):
        for filename in files:
            if not filename.endswith('.pdb'):
                continue
            pdb_path = Path(folder) / filename
            chain_coords, plddt = pdb_to_coords(pdb_path.read_text())
            pdockq, if_plddt, n_contacts, avg_plddt = calc_pdockq(
                chain_coords, plddt)
            records.append({
                'PDB_File': str(pdb_path),
                'pDockQ': pdockq,
                'if_pLDDT': if_plddt,
                'if_contacts': n_contacts,
                'avg_pLDDT': avg_plddt,
            })
    cols = ['PDB_File', 'pDockQ', 'if_pLDDT', 'if_contacts', 'avg_pLDDT']
    pd.DataFrame(records, columns=cols).to_csv(config.pdockq_scores_csv,
                                               index=False)


def summarize_pdockq(config: CofoldConfig, cofold_df, pdockq_df) -> None:
    """Rank by pDockQ, write summary + high-confidence CSV/FASTA."""
    import pandas as pd

    if pdockq_df.empty:
        print('No pDockQ scores extracted; skipping summary.')
        return
    pdockq_df = pdockq_df.copy()
    pdockq_df['id_pair'] = pdockq_df['PDB_File'].apply(
        lambda p: Path(p).stem)
    for col in ['pDockQ', 'if_pLDDT', 'if_contacts', 'avg_pLDDT']:
        pdockq_df[col] = pd.to_numeric(pdockq_df[col], errors='coerce')
    merged = pdockq_df.merge(cofold_df, on='id_pair', how='left')
    merged = merged.sort_values(by='pDockQ', ascending=False)
    merged.to_csv(config.pdockq_summary_csv, index=False)
    high = merged[merged['pDockQ'] >= config.pdockq_threshold]
    high.to_csv(config.pdockq_filtered_csv, index=False)
    if high.empty:
        print(f'No complexes with pDockQ >= {config.pdockq_threshold}.')
        return
    with open(config.pdockq_filtered_fasta, 'w') as f:
        for _, row in high.iterrows():
            f.write(f">{row['id_pair']}_tox\n{row['sequence1']}\n")
            f.write(f">{row['id_pair']}_antitox\n{row['sequence2']}\n")


def run_pipeline(config: CofoldConfig) -> None:
    cofold_df = prepare_cofold_inputs(config)
    if config.run_esmfold:
        print('Running ESMFold multimer on TA pairs...', flush=True)
        run_esmfold(config, cofold_df)
    if config.run_pdockq:
        import pandas as pd
        print('Extracting pDockQ metrics...', flush=True)
        extract_pdockq_scores(config)
        summarize_pdockq(config, cofold_df,
                         pd.read_csv(config.pdockq_scores_csv))


if __name__ == '__main__':
    parser = argparse.ArgumentParser(
        description='Cofold TA pairs and score pDockQ from a YAML config.')
    parser.add_argument('--config', required=True)
    run_pipeline(load_config(Path(parser.parse_args().config)))
