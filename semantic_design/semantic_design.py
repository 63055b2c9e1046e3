"""Semantic-design building blocks (Evo 1.5 paper workflows).

Functional parity with the reference library
`/root/reference/semantic_design/semantic_design.py` — same function names,
file formats (CSV/FASTA schemas), and external-tool invocations — rebuilt on
the TPU engine (`evo_tpu`) and without the BioPython dependency (plain-text
FASTA handling via `evo_tpu.io.fasta`).

The engine touchpoints are exactly three (reference lines 103-179, 271):
`model_load`, `run_model`, `sample_model`; everything else is host-side
orchestration of C/C++ CLI tools (prodigal, segmasker, hmmer, foldseek,
mmseqs2, mafft — SURVEY.md §2.F), which stay as subprocess wrappers.
"""

from __future__ import annotations

import csv
import math
import os
import shutil
import subprocess
import sys
import tempfile
import uuid
from collections import Counter
from typing import Any, Dict, List, Optional, Sequence, Tuple, Union

import numpy as np

from evo_tpu.generation import generate
from evo_tpu.io.fasta import iter_fasta, read_fasta, write_fasta
from evo_tpu.models import Evo
from evo_tpu.tokenizer import CharLevelTokenizer
from evo_tpu.utils import reverse_complement

PromptType = Union[str, List[str]]
BatchType = Union[List[str], List[List[str]]]


# ---------------------------------------------------------------------------
# Prompt IO
# ---------------------------------------------------------------------------

def read_prompts(input_file: str, batched: bool = True,
                 batch_size: int = 150) -> Union[List[List[str]], List[str]]:
    """CSV (first column = sequence, first row = header) -> prompts.

    batched=True groups prompts of equal length into batches of at most
    `batch_size` (equal length is what lets generation run as one batch,
    reference `semantic_design.py:39-100`).
    """
    with open(input_file, encoding='utf-8-sig', newline='') as f:
        reader = csv.reader(f)
        next(reader)                       # header
        # strip prompt cells: sample_model records stripped prompts,
        # and downstream CSV joins on the prompt string must match
        prompts = [row[0].strip() for row in reader if row]
    if not batched:
        return prompts
    by_len: Dict[int, List[str]] = {}
    for seq in prompts:
        by_len.setdefault(len(seq), []).append(seq)
    batches: List[List[str]] = []
    for group in by_len.values():
        for i in range(0, len(group), batch_size):
            batches.append(group[i:i + batch_size])
    return batches


# ---------------------------------------------------------------------------
# Engine touchpoints
# ---------------------------------------------------------------------------

def model_load(model_name: str, checkpoint_path: Optional[str] = None,
               random_init: bool = False, mesh=None):
    """Load the Evo engine -> (model, tokenizer).

    `checkpoint_path`/`random_init`/`mesh` are TPU-framework extensions
    (no-network environments, sharded execution); reference signature is
    `model_load(model_name)` with an implicit HF download.
    """
    if checkpoint_path is None:
        checkpoint_path = os.environ.get('EVO_TPU_CHECKPOINT_PATH')
    evo_model = Evo(model_name, checkpoint_path=checkpoint_path,
                    random_init=random_init, mesh=mesh)
    return evo_model.model, evo_model.tokenizer


def run_model(
    prompts: PromptType,
    model,
    tokenizer: CharLevelTokenizer,
    n_tokens: int = 1000,
    temp: float = 0.7,
    top_k: int = 4,
    batched: bool = True,
    device: str = 'tpu',
    force_prompt_threshold: int = 2,
    cached_generation: bool = True,
) -> Tuple[Union[List[str], str], Union[List[float], float]]:
    """Generate DNA continuations (thin wrapper over evo_tpu.generate;
    reference defaults kept, incl. force_prompt_threshold=2).

    On TPU the FFT prefill consumes arbitrary prompt lengths in one program,
    so the reference's teacher-forcing split (threshold 2 => token-by-token
    prompt replay) is unnecessary; we prefill everything at once, which is
    numerically equivalent (tests/test_model.py decode<->prefill seam) and
    orders of magnitude faster.
    """
    prompt_list = [prompts] if isinstance(prompts, str) else list(prompts)
    seqs, scores = generate(
        prompt_seqs=prompt_list,
        model=model,
        tokenizer=tokenizer,
        n_tokens=n_tokens,
        temperature=temp,
        top_k=top_k,
        batched=batched,
        force_prompt_threshold=None,      # full-prompt FFT prefill
        cached_generation=cached_generation,
        verbose=1,
    )
    if isinstance(prompts, str):
        return seqs[0], scores[0]
    return seqs, scores


def read_evo_seqs(gen_seqs: List[List[Any]]):
    """[[uuid, prompt, seq, score], ...] -> (prompts, seqs, scores, ids)."""
    scores = []
    for row in gen_seqs:
        try:
            scores.append(float(row[3]))
        except (ValueError, TypeError, IndexError):
            scores.append(0.0)
    return ([row[1] for row in gen_seqs],
            [row[2] for row in gen_seqs],
            scores,
            [row[0] for row in gen_seqs])


def sample_model(
    prompt_batches: BatchType,
    model,
    tokenizer: CharLevelTokenizer,
    file_save_location: str,
    n_tokens: int = 1000,
    temp: float = 0.7,
    top_k: int = 4,
    batched: bool = True,
    n_sample_per_prompt: int = 1,
    device: str = 'tpu',
    force_prompt_threshold: int = 2,
):
    """Batch sampling orchestration: repeat each prompt n_sample_per_prompt
    times, generate, attach UUIDs, drop empty/NaN rows, write CSV
    [UUID, Prompt, Generated Sequence, Score] (reference CSV schema,
    `semantic_design.py:271-427`). Returns (prompts, seqs, scores, ids)."""
    rows: List[List[Any]] = []

    if batched:
        batch_iter: List[List[str]] = [
            b if isinstance(b, list) else [b] for b in prompt_batches]
    else:
        flat = ([prompt_batches] if isinstance(prompt_batches, str)
                else list(prompt_batches))
        batch_iter = [[p] for p in flat]

    for bi, batch in enumerate(batch_iter):
        valid = [s for s in batch if isinstance(s, str) and s.strip()]
        if not valid:
            continue
        repeated: List[str] = []
        for prompt in valid:
            repeated.extend([prompt] * n_sample_per_prompt)
        seqs, scores = run_model(
            repeated, model, tokenizer, n_tokens=n_tokens, temp=temp,
            top_k=top_k, batched=batched,
            force_prompt_threshold=force_prompt_threshold)
        if isinstance(seqs, str):
            seqs, scores = [seqs], [scores]
        for prompt, seq, score in zip(repeated, seqs, scores):
            if not (isinstance(seq, str) and seq.strip()):
                continue
            try:
                fscore = float(score)
            except (TypeError, ValueError):
                continue
            if math.isnan(fscore):
                continue
            rows.append([uuid.uuid4().hex, prompt.strip(), seq.strip(),
                         fscore])

    with open(file_save_location, 'w', newline='', encoding='utf-8') as f:
        writer = csv.writer(f)
        writer.writerow(['UUID', 'Prompt', 'Generated Sequence', 'Score'])
        writer.writerows(rows)
    return read_evo_seqs(rows)


# ---------------------------------------------------------------------------
# Sequence bookkeeping
# ---------------------------------------------------------------------------

def get_rc(sequences: Sequence[str], rc_truth: bool = True,
           return_both: bool = True) -> List[str]:
    """Reverse-complement expansion (reference returns rc + originals)."""
    seqs = [str(s) for s in sequences]
    if rc_truth and return_both:
        return [reverse_complement(s) for s in seqs] + seqs
    if rc_truth:
        return [reverse_complement(s) for s in seqs]
    return seqs


def make_fasta(sequences: Sequence[str], prompts: Sequence[str],
               ids: Sequence[str], output_file: str) -> None:
    """FASTA writer: header '>id prompt' per record (BioPython SeqRecord
    id+description format of the reference).

    When `sequences` is the 2N output of get_rc(return_both=True) — the
    RC half first, then the originals — ids/prompts are expanded to match
    ('{id}_rc' for the RC half). The reference silently truncates here,
    writing ONLY the reverse complements and dropping every forward-strand
    generation; deviation kept deliberate.
    """
    if len(sequences) == 2 * len(ids):
        ids = [f'{i}_rc' for i in ids] + list(ids)
        prompts = list(prompts) * 2
    elif len(sequences) != len(ids):
        raise ValueError(
            f'{len(sequences)} sequences vs {len(ids)} ids: expected equal '
            'or the 2N layout of get_rc(return_both=True)')
    names = [f'{i} {p}' if p else str(i) for i, p in zip(ids, prompts)]
    write_fasta(output_file, names, [str(s) for s in sequences], width=60)


# ---------------------------------------------------------------------------
# External tools (host-side C/C++ binaries via subprocess; SURVEY.md §2.F)
# ---------------------------------------------------------------------------

def _require_exe(name: str, explicit: Optional[str] = None) -> str:
    exe = explicit or shutil.which(name)
    if not exe or not os.path.exists(exe):
        raise FileNotFoundError(
            f'{name} executable not found; install it or pass its path')
    return exe


def run_prodigal(input_file: str, output_file: str, output_orf_file: str,
                 prodigal_path: Optional[str] = None) -> None:
    """Prodigal gene calling in metagenomics mode (-p meta): writes protein
    (-a) and nucleotide ORF (-d) FASTAs."""
    exe = _require_exe('prodigal', prodigal_path)
    subprocess.run(
        [exe, '-i', input_file, '-a', output_file, '-d', output_orf_file,
         '-p', 'meta'],
        check=True)


def _segmasker_masked_fraction(seq: str, segmasker_path: str) -> float:
    """Fraction of residues segmasker lowercases/masks (X count in fasta
    outfmt with the reference's window/locut/hicut parameters)."""
    tmp_dir = '/dev/shm' if os.path.exists('/dev/shm') else None
    with tempfile.NamedTemporaryFile('w', suffix='.fasta', dir=tmp_dir,
                                     delete=False) as tf:
        tf.write(f'>s\n{seq}\n')
        path = tf.name
    try:
        out = subprocess.run(
            [segmasker_path, '-in', path, '-outfmt', 'fasta',
             '-window', '15', '-locut', '1.8', '-hicut', '3.4'],
            capture_output=True, text=True)
        return out.stdout.count('X') / max(len(seq), 1)
    finally:
        try:
            os.remove(path)
        except OSError:
            pass


def is_highly_repetitive(seq: str, min_repeat_length: int = 3,
                         threshold: float = 0.3) -> bool:
    """True when any k-mer (k in [min_repeat_length, +7)) covers more than
    `threshold` of the sequence."""
    n = len(seq)
    for k in range(min_repeat_length, min_repeat_length + 7):
        if k > n:
            break
        counts = Counter(seq[i:i + k] for i in range(n - k + 1))
        if counts and max(counts.values()) * k > n * threshold:
            return True
    return False


def is_underrepresented_amino_acids(seq: str) -> bool:
    """True when the bottom 30% of the distinct-residue count table all occur
    fewer than twice (low-complexity indicator)."""
    counts = sorted(Counter(seq).values(), reverse=True)
    if not counts:
        return True
    num_bottom = max(1, int(0.3 * len(counts)))
    return all(c < 2 for c in counts[-num_bottom:])


def filter_protein_fasta(
    input_fasta: str,
    output_fasta: str,
    segmasker_path: str,
    min_length: int = 40,
    max_length: int = 1200,
    filter_partial_bool: bool = True,
    segmasker_threshold: float = 0.2,
) -> int:
    """Protein QC (reference `semantic_design.py:472-648`): drop sequences
    that are low-complexity (segmasker > threshold), repetitive, have <12
    distinct residues, have underrepresented residues, fall outside the
    length window, or (optionally) are prodigal-partial (`partial=00`
    missing from the header). Returns the number kept."""
    _require_exe('segmasker', segmasker_path)
    kept_names, kept_seqs = [], []
    for name, seq in iter_fasta(input_fasta):
        if not (min_length <= len(seq) <= max_length):
            continue
        if filter_partial_bool and 'partial=00' not in name:
            continue
        if len(set(seq)) < 12:
            continue
        if is_highly_repetitive(seq):
            continue
        if is_underrepresented_amino_acids(seq):
            continue
        if _segmasker_masked_fraction(
                seq, segmasker_path) > segmasker_threshold:
            continue
        kept_names.append(name)
        kept_seqs.append(seq)
    if kept_names:
        write_fasta(output_fasta, kept_names, kept_seqs, width=60)
    return len(kept_names)


def run_hmmsearch(input_fasta: str, hmm_folder: str, output_csv: str,
                  n_threads: int = 1, incE: float = 0.2):
    """hmmsearch every *.hmm3 profile in `hmm_folder` against the FASTA;
    returns/writes a DataFrame [Evo Sequence ID, Sequence Description,
    Amino Acid Sequence, HMM, E-value] (reference CSV schema)."""
    import pandas as pd

    sequences = {name.split()[0]: seq
                 for name, seq in iter_fasta(input_fasta)}
    results = []
    for hmm_file in sorted(os.listdir(hmm_folder)):
        if not hmm_file.endswith('.hmm3'):
            continue
        hmm_path = os.path.join(hmm_folder, hmm_file)
        with tempfile.NamedTemporaryFile('w', suffix='.txt',
                                         delete=False) as tf:
            table = tf.name
        try:
            subprocess.run(
                ['hmmsearch', '--domtblout', table, '--cpu', str(n_threads),
                 '--incE', str(incE), hmm_path, input_fasta],
                check=True, capture_output=True)
            with open(table) as f:
                for line in f:
                    if line.startswith('#'):
                        continue
                    fields = line.split()
                    if len(fields) < 20:
                        continue
                    results.append({
                        'Evo Sequence ID': fields[0],
                        'Sequence Description': fields[3],
                        'Amino Acid Sequence': sequences.get(fields[0], ''),
                        'HMM': hmm_file,
                        'E-value': float(fields[6]),
                    })
        except subprocess.CalledProcessError as e:
            print(f'hmmsearch failed ({e.returncode}): '
                  f'{e.stderr.decode(errors="replace")}', file=sys.stderr)
        except FileNotFoundError:
            raise FileNotFoundError(
                'hmmsearch not installed (conda install -c bioconda hmmer)')
        finally:
            try:
                os.remove(table)
            except OSError:
                pass
    df = pd.DataFrame(results)
    df.to_csv(output_csv, index=False)
    return df


def get_pfam_hits(input_fasta: str, pfam_db_path: str, output_csv: str,
                  n_threads: int = 1, verbose: bool = False):
    """hmmscan vs Pfam -> DataFrame of domain hits (reference columns
    incl. the sequence-keyed description join)."""
    import pandas as pd

    records = list(iter_fasta(input_fasta))
    # reference quirk kept: query records are re-keyed by their sequence so
    # hits join back to descriptions by sequence text
    with tempfile.NamedTemporaryFile('w', suffix='.faa', delete=False) as tf:
        for name, seq in records:
            tf.write(f'>{seq}\n{seq}\n')
        query = tf.name
    with tempfile.NamedTemporaryFile('w', suffix='.txt', delete=False) as tf:
        table = tf.name
    columns = ['target name', 'accession', 'query name',
               'amino acid sequence', 'E-value', 'score', 'bias',
               'c-Evalue', 'i-Evalue', 'score2', 'bias2', 'hmmfrom',
               'hmm to', 'alifrom', 'ali to', 'envfrom', 'env to', 'acc',
               'description of target']
    try:
        subprocess.run(
            ['hmmscan', '--domtblout', table, '--cpu', str(n_threads),
             pfam_db_path, query],
            check=False, capture_output=not verbose)
        hits = []
        with open(table) as f:
            for line in f:
                if line.startswith('#'):
                    continue
                fields = line.split()
                if len(fields) >= len(columns) - 1:
                    hits.append(fields[:len(columns) - 1]
                                + [' '.join(fields[len(columns) - 1:])])
        df = pd.DataFrame(hits, columns=columns)
    finally:
        for path in (query, table):
            try:
                os.remove(path)
            except OSError:
                pass
    desc_by_seq = {seq: name for name, seq in records}
    if len(df):
        df['sequence description'] = df['amino acid sequence'].map(
            desc_by_seq)
    df.to_csv(output_csv, index=False)
    return df


def fold_proteins(input_file: str, output_file: str, device: str = 'cpu'):
    """ESMFold structure prediction -> DataFrame [Amino Acid Sequence,
    Evo Sequence ID, PDB Output, Average pLDDT, pTM].

    ESMFold runs under torch (the reference's path, kept: folding is not an
    Evo-engine workload and torch-cpu is in the image; a GPU `device` works
    unchanged where available).
    """
    import pandas as pd
    import torch
    from transformers import AutoTokenizer, EsmForProteinFolding

    esmfold = EsmForProteinFolding.from_pretrained('facebook/esmfold_v1')
    esmfold = esmfold.to(device)
    if device != 'cpu':
        esmfold.esm = esmfold.esm.half()
    tok = AutoTokenizer.from_pretrained('facebook/esmfold_v1')
    folds = []
    for name, seq in iter_fasta(input_file):
        protein = seq.rstrip('*')
        with torch.inference_mode():
            inputs = tok([protein], return_tensors='pt',
                         add_special_tokens=False).to(device)
            out = esmfold(**inputs)
            pdb_str = esmfold.output_to_pdb(out)[0]
            exists = out['atom37_atom_exists']
            plddt = float(((out['plddt'] * exists).sum(dim=(1, 2))
                           / exists.sum(dim=(1, 2))).item())
            ptm = float(out['ptm'].item()) if 'ptm' in out else None
        folds.append([protein, name, pdb_str, plddt, ptm])
    df = pd.DataFrame(folds, columns=[
        'Amino Acid Sequence', 'Evo Sequence ID', 'PDB Output',
        'Average pLDDT', 'pTM'])
    df.to_csv(output_file, index=False)
    return df


def filter_proteins_by_threshold(df, output_file: str,
                                 plddt_threshold: float = 0.4,
                                 ptm_threshold: float = 0.4):
    """Keep folds with pLDDT and pTM above thresholds."""
    kept = df[(df['Average pLDDT'] >= plddt_threshold)
              & (df['pTM'] >= ptm_threshold)]
    kept.to_csv(output_file, index=False)
    return kept


def run_foldseek(filtered_df, output_file: str, db_path: str,
                 sensitivity: float = 7.5, coverage: float = 0.4):
    """foldseek easy-search each predicted structure against a PDB database;
    returns/writes [Amino Acid Sequence, Sequence ID, Query, Target,
    Alignment TM-score, LDDT, Probability]."""
    import pandas as pd

    results = []
    with tempfile.TemporaryDirectory() as tmp:
        for _, row in filtered_df.iterrows():
            pdb_name = str(row['Evo Sequence ID']).split()[0]
            pdb_path = os.path.join(tmp, f'{uuid.uuid4().hex}.pdb')
            out_path = os.path.join(tmp, f'{uuid.uuid4().hex}.tsv')
            with open(pdb_path, 'w') as f:
                f.write(row['PDB Output'])
            cmd = ['foldseek', 'easy-search', pdb_path, db_path, out_path,
                   tmp, '-s', str(sensitivity), '-c', str(coverage),
                   '--format-output', 'query,target,alntmscore,lddt,prob']
            try:
                subprocess.run(cmd, check=True, capture_output=True,
                               text=True)
            except subprocess.CalledProcessError as e:
                print(f'foldseek failed ({e.returncode}): {e.stderr}',
                      file=sys.stderr)
                continue
            if not os.path.exists(out_path):
                continue
            with open(out_path) as f:
                for line in f:
                    q, t, tm, lddt, prob = line.rstrip('\n').split('\t')
                    results.append([row['Amino Acid Sequence'], pdb_name,
                                    q, t, float(tm), float(lddt),
                                    float(prob)])
    df = pd.DataFrame(results, columns=[
        'Amino Acid Sequence', 'Sequence ID', 'Query', 'Target',
        'Alignment TM-score', 'LDDT', 'Probability'])
    df.to_csv(output_file, index=False)
    return df


def filt_foldseek(foldseek_df, output_csv: str,
                  tm_score_threshold: float = 0.4) -> None:
    """Unique (sequence, id) pairs with TM-score above threshold -> CSV."""
    seen = set()
    rows = []
    for _, row in foldseek_df.iterrows():
        if row['Alignment TM-score'] <= tm_score_threshold:
            continue
        key = (row['Amino Acid Sequence'], row['Sequence ID'])
        if key in seen:
            continue
        seen.add(key)
        rows.append({'Amino Acid Sequence': key[0], 'Sequence ID': key[1]})
    with open(output_csv, 'w', newline='') as f:
        writer = csv.DictWriter(
            f, fieldnames=['Amino Acid Sequence', 'Sequence ID'])
        writer.writeheader()
        writer.writerows(rows)


def run_mmseqs_search(fasta_file: str, mmseqs_db: str, output_csv: str,
                      result_dir: str = 'mmseqs_results', threads: int = 4,
                      sensitivity: float = 4.0):
    """mmseqs2 easy-search wrapper -> DataFrame with the reference's column
    schema (query/sequence/target/identity/alignment stats)."""
    import pandas as pd

    if not os.path.isfile(fasta_file):
        raise FileNotFoundError(f'FASTA file not found: {fasta_file}')
    if not (os.path.isdir(mmseqs_db) or os.path.isfile(mmseqs_db)):
        raise FileNotFoundError(f'MMseqs database not found: {mmseqs_db}')
    os.makedirs(result_dir, exist_ok=True)
    out_m8 = os.path.join(result_dir, 'mmseqs_result.m8')
    log_path = os.path.join(result_dir, 'mmseqs_search.log')
    cmd = ['mmseqs', 'easy-search', fasta_file, mmseqs_db, out_m8,
           result_dir, '--threads', str(threads), '-s', str(sensitivity),
           '--remove-tmp-files', '1', '--format-output',
           'query,target,fident,alnlen,mismatch,gapopen,qstart,qend,'
           'tstart,tend,evalue,bits,qaln,taln']
    with open(log_path, 'w') as log:
        subprocess.run(cmd, check=True, stdout=log, stderr=log, text=True)
    sequences = {name.split()[0]: seq
                 for name, seq in iter_fasta(fasta_file)}
    hits = []
    with open(out_m8) as f:
        for line in f:
            fields = line.rstrip('\n').split('\t')
            if fields[0] in sequences:
                hits.append([fields[0], sequences[fields[0]]] + fields[1:])
    columns = ['Query', 'Sequence', 'Target', 'Fident', 'Alnlen',
               'Mismatch', 'Gapopen', 'Qstart', 'Qend', 'Tstart', 'Tend',
               'E-value', 'Bits', 'Qaln', 'Taln']
    df = pd.DataFrame(hits, columns=columns)
    for col in ['Fident', 'Alnlen', 'Mismatch', 'Gapopen', 'E-value']:
        df[col] = pd.to_numeric(df[col])
    df.to_csv(output_csv, index=False)
    return df


def _pairwise_identity(a: str, b: str) -> float:
    """Identity over mutually aligned (non-gap in both) columns."""
    matches = aligned = 0
    for x, y in zip(a, b):
        if x != '-' and y != '-':
            aligned += 1
            if x == y:
                matches += 1
    return matches / aligned if aligned else 0.0


def align_sequences_mafft(
    input_fasta: str,
    reference_fasta: str,
    output_csv: str,
    output_fasta: str,
    mafft_path: str = 'mafft',
    identity_threshold: float = 0.25,
) -> None:
    """Pairwise-MAFFT each query against every reference; keep the best
    match per query when identity >= threshold. Writes the reference's CSV
    columns and a FASTA of passing queries."""
    import pandas as pd

    for path in (output_csv, output_fasta):
        os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    queries = list(iter_fasta(input_fasta))
    references = list(iter_fasta(reference_fasta))

    def align_pair(q: Tuple[str, str], r: Tuple[str, str]):
        with tempfile.NamedTemporaryFile('w', suffix='.fasta',
                                         delete=False) as tf:
            tf.write(f'>{q[0]}\n{q[1]}\n>{r[0]}\n{r[1]}\n')
            pair_path = tf.name
        try:
            result = subprocess.run([mafft_path, pair_path],
                                    capture_output=True, text=True,
                                    check=True)
            aligned = read_fasta_text(result.stdout)
            a, b = aligned[0][1], aligned[1][1]
            return a, b, _pairwise_identity(a, b)
        finally:
            try:
                os.remove(pair_path)
            except OSError:
                pass

    rows, kept = [], []
    for qname, qseq in queries:
        best = (None, 0.0, None)
        for ref in references:
            a, b, ident = align_pair((qname, qseq), ref)
            if ident > best[1]:
                best = (ref, ident, (a, b))
        ref, ident, alignment = best
        if ref is not None and ident >= identity_threshold:
            rows.append({
                'Input Sequence Description': qname,
                'Input Sequence': qseq,
                'Best Matching Reference Description': ref[0],
                'Best Matching Reference Sequence': ref[1],
                'Percent Alignment': f'{ident * 100:.2f}%',
                'Aligned Input Sequence': alignment[0],
                'Aligned Reference Sequence': alignment[1],
            })
            kept.append((qname, qseq))
    if rows:
        pd.DataFrame(rows).to_csv(output_csv, index=False)
    if kept:
        write_fasta(output_fasta, [n for n, _ in kept],
                    [s for _, s in kept], width=60)
    print(f'Processed {len(queries)} sequences; kept {len(kept)} above '
          f'{identity_threshold * 100:.0f}% identity')


def read_fasta_text(text: str) -> List[Tuple[str, str]]:
    """Parse FASTA from an in-memory string (e.g. mafft stdout)."""
    import io
    return list(iter_fasta(io.StringIO(text)))
