"""Genetic-architecture similarity scoring vs PhiX174.

Functional parity with reference `phage_gen/pipelines/genetic_architecture.py`
(same truth coordinates, weighting, Gaussian row blur, normalization, and
output-table schema), with a redesigned core: the reference materializes an
(n, n) circular-permutation matrix per sequence and takes a dense matmul
(O(n^2) memory/compute); here the same max-over-circular-shifts dot product
is computed as a circular cross-correlation via FFT in O(n log n) — exact
same scores.

Math: reference score row r, shift i is
    c[r, i] = sum_{p<n} truth'[r, p] * v[(p - i) mod n]
with truth' = truth row truncated/zero-padded to the sequence length n
(which is exactly what the reference's row/column padding of the dense
matrices amounts to). That is the circular cross-correlation
    c[r] = irfft( rfft(truth'[r]) * conj(rfft(v)) ).
"""

from __future__ import annotations

import functools
import os
from typing import Dict, List, Sequence, Tuple

import numpy as np

# --- PhiX174 (NC_001422.1) gene-boundary truth coordinates ---------------
# Start/stop codon positions for each gene/module, no cryptic codons.
PHIX174_LENGTH = 5386

GENOME_INDICES_NC001422_1: Dict[str, int] = {
    'A_start': 3980, 'A*_start': 4496, 'B_start': 5074, 'K_start': 50,
    'C_start': 132, 'D_start': 389, 'E_start': 567, 'J_start': 847,
    'F_start': 1000, 'G_start': 2394, 'H_start': 2930,
    'A_stop': 133, 'A*_stop': 133, 'B_stop': 48, 'K_stop': 218,
    'C_stop': 390, 'D_stop': 845, 'E_stop': 840, 'J_stop': 961,
    'F_stop': 2281, 'G_stop': 2919, 'H_stop': 3914,
}

_MODULES: Dict[str, Tuple[str, ...]] = {
    'genome': ('A', 'A*', 'B', 'K', 'C', 'D', 'E', 'J', 'F', 'G', 'H'),
    'AABKC': ('A', 'A*', 'B', 'K', 'C'),
    'DE': ('D', 'E'),
    'J': ('J',),
    'F': ('F',),
    'G': ('G',),
    'H': ('H',),
}
MODULE_NAMES = tuple(_MODULES)          # row order of the truth matrix

_START_STOP = ('ATG', 'TAA', 'TAG', 'TGA')


def binary_start_stop_vector(sequence: str) -> np.ndarray:
    """1 at every position opening a start (ATG) or stop (TAA/TAG/TGA)
    codon, with 2-nt circular extension so all positions are scored."""
    seq = sequence.upper()
    ext = seq + seq[:2]
    n = len(seq)
    out = np.zeros(n, dtype=np.float64)
    for i in range(n):
        if ext[i:i + 3] in _START_STOP:
            out[i] = 1.0
    return out


def build_truth_matrix() -> np.ndarray:
    """(7, 5386) truth matrix: one row per module of MODULE_NAMES."""
    rows = []
    for genes in _MODULES.values():
        v = np.zeros(PHIX174_LENGTH, dtype=np.float64)
        for g in genes:
            v[GENOME_INDICES_NC001422_1[f'{g}_start']] = 1.0
            v[GENOME_INDICES_NC001422_1[f'{g}_stop']] = 1.0
        rows.append(v)
    return np.stack(rows)


def gaussian_row_blur(matrix: np.ndarray, sigma: float) -> np.ndarray:
    """Gaussian-blur each row; original non-zero entries retained exactly
    (positional tolerance without diluting exact hits)."""
    from scipy.ndimage import gaussian_filter1d

    out = matrix.copy()
    for i in range(matrix.shape[0]):
        blurred = gaussian_filter1d(matrix[i], sigma=sigma)
        nz = matrix[i] != 0
        blurred[nz] = matrix[i][nz]
        out[i] = blurred
    return out


def _fit_rows(truth: np.ndarray, n: int) -> np.ndarray:
    """Truncate or zero-pad truth rows to length n (the padding semantics
    of the reference's dense formulation)."""
    N = truth.shape[1]
    if N == n:
        return truth
    if N > n:
        return truth[:, :n]
    return np.pad(truth, ((0, 0), (0, n - N)))


def max_circular_correlation(truth: np.ndarray, v: np.ndarray) -> np.ndarray:
    """max_i sum_p truth'[r, p] v[(p-i) mod n] per row r, via FFT."""
    n = v.shape[0]
    t = _fit_rows(truth, n)
    tf = np.fft.rfft(t, axis=-1)
    vf = np.fft.rfft(v)
    corr = np.fft.irfft(tf * np.conj(vf)[None], n=n, axis=-1)
    return corr.max(axis=-1, keepdims=True)


def genetic_architecture_score(truth_matrix: np.ndarray,
                               sequence_to_score: str,
                               weight_vector: np.ndarray,
                               normalization_vector: np.ndarray
                               ) -> np.ndarray:
    """Per-module normalized architecture scores, shape (modules, 1)."""
    v = binary_start_stop_vector(sequence_to_score)
    maxima = max_circular_correlation(truth_matrix, v)
    return weight_vector * maxima / normalization_vector


class ArchitectureScorer:
    """Precomputed truth/weight/normalization bundle.

    `sigma` > 0 applies the Gaussian row blur to the truth matrix; the
    normalization is the (blurred) truth scored against the real PhiX174
    genome, so PhiX174 itself scores exactly 1 per module.
    """

    def __init__(self, reference_sequence: str, sigma: float = 0.0):
        truth = build_truth_matrix()
        self.weight_vector = truth.sum(axis=1, keepdims=True)
        if sigma > 0:
            truth = gaussian_row_blur(truth, sigma)
        self.truth_matrix = truth
        ref_max = max_circular_correlation(
            truth, binary_start_stop_vector(reference_sequence))
        self.normalization_vector = self.weight_vector * ref_max

    @classmethod
    def from_fasta(cls, path: str | None = None,
                   sigma: float = 0.0) -> 'ArchitectureScorer':
        from evo_tpu.io.fasta import read_fasta
        if path is None:
            path = os.path.join(os.path.dirname(__file__), '..', 'data',
                                'NC_001422_1.fna')
        _, seqs = read_fasta(path)
        return cls(seqs[0], sigma=sigma)

    def score(self, sequence: str) -> np.ndarray:
        return genetic_architecture_score(
            self.truth_matrix, sequence, self.weight_vector,
            self.normalization_vector)

    def score_table(self, sequences: Sequence[str],
                    ids: Sequence[str], n_jobs: int = 0):
        """Score many sequences -> DataFrame with the reference's columns
        ([id_prompt, <module>_score..., genetic_architecture_score =
        product of module scores])."""
        import pandas as pd

        if n_jobs and n_jobs != 1:
            from concurrent.futures import ProcessPoolExecutor
            workers = None if n_jobs < 0 else n_jobs
            with ProcessPoolExecutor(max_workers=workers) as ex:
                scores = list(ex.map(self.score, sequences))
        else:
            scores = [self.score(s) for s in sequences]
        df = pd.DataFrame({'id_prompt': list(ids), **{
            ('genome_score' if name == 'genome'
             else f'{name.lower()}_score'): [s[i, 0] for s in scores]
            for i, name in enumerate(MODULE_NAMES)}})
        score_cols = [c for c in df.columns if c.endswith('_score')]
        df['genetic_architecture_score'] = df[score_cols].prod(axis=1)
        return df


def calculate_genetic_architecture_score_parallel(
        sequences_df, truth_matrix, weight_vector, normalization_vector,
        n_jobs: int = -1) -> List[Tuple[str, np.ndarray]]:
    """Reference-signature batch API: DataFrame with columns
    ['sequence', 'id_prompt'] -> [(id, (modules,1) score array), ...].

    n_jobs follows the joblib convention (-1 = all cores), delegated to a
    process pool as in the reference (its joblib.Parallel call)."""
    ids = sequences_df['id_prompt'].tolist()
    seqs = sequences_df['sequence'].tolist()
    score_one = functools.partial(
        genetic_architecture_score, truth_matrix,
        weight_vector=weight_vector,
        normalization_vector=normalization_vector)
    if n_jobs and n_jobs != 1:
        from concurrent.futures import ProcessPoolExecutor
        workers = None if n_jobs < 0 else n_jobs
        with ProcessPoolExecutor(max_workers=workers) as ex:
            scores = list(ex.map(score_one, seqs))
    else:
        scores = [score_one(s) for s in seqs]
    return list(zip(ids, scores))
