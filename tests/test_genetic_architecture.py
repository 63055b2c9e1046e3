"""Genetic-architecture scorer tests: the FFT circular-correlation core vs
a brute-force roll oracle, and PhiX174 self-score == 1."""

import numpy as np
import pytest

from phage_gen.pipelines import genetic_architecture as ga


def _brute_force_max(truth, v):
    """Reference formulation: dense circular-permutation matrix + matmul."""
    n = len(v)
    t = ga._fit_rows(truth, n)
    best = np.full((truth.shape[0], 1), -np.inf)
    for i in range(n):
        rolled = np.roll(v, i)
        dots = t @ rolled
        best[:, 0] = np.maximum(best[:, 0], dots)
    return best


def test_fft_correlation_matches_bruteforce():
    rng = np.random.default_rng(0)
    truth = (rng.random((3, 40)) < 0.1).astype(float)
    v = (rng.random(40) < 0.15).astype(float)
    got = ga.max_circular_correlation(truth, v)
    want = _brute_force_max(truth, v)
    np.testing.assert_allclose(got, want, atol=1e-9)


def test_fft_correlation_length_mismatch():
    rng = np.random.default_rng(1)
    truth = (rng.random((2, 50)) < 0.1).astype(float)
    for n in (30, 70):                     # shorter and longer sequences
        v = (rng.random(n) < 0.2).astype(float)
        np.testing.assert_allclose(
            ga.max_circular_correlation(truth, v),
            _brute_force_max(truth, v), atol=1e-9)


def test_binary_start_stop_vector():
    v = ga.binary_start_stop_vector('ATGCCTAA')
    # pos 0: ATG start; pos 5: TAA stop; circular tail AAA+AT: pos 6 'AAT'
    # no, pos 7 'AAT'? ext = ATGCCTAA + AT -> AATGC...; check pos 6: 'AAA'?
    # ext[6:9] = 'AAT' no-hit, ext[7:10]='AAT' no-hit
    assert v[0] == 1 and v[5] == 1
    assert v.sum() == 2


def test_phix174_scores_one():
    scorer = ga.ArchitectureScorer.from_fasta()
    from evo_tpu.io.fasta import read_fasta
    import os
    path = os.path.join(os.path.dirname(ga.__file__), '..', 'data',
                        'NC_001422_1.fna')
    _, seqs = read_fasta(path)
    scores = scorer.score(seqs[0])
    np.testing.assert_allclose(scores, np.ones_like(scores), rtol=1e-9)
    # and a random sequence scores < 1 on the genome row
    rng = np.random.default_rng(2)
    rand_seq = ''.join(rng.choice(list('ACGT'), size=5386))
    assert scorer.score(rand_seq)[0, 0] < 1.0


def test_blurred_scorer_still_normalized():
    scorer = ga.ArchitectureScorer.from_fasta(sigma=5.0)
    import os
    from evo_tpu.io.fasta import read_fasta
    path = os.path.join(os.path.dirname(ga.__file__), '..', 'data',
                        'NC_001422_1.fna')
    _, seqs = read_fasta(path)
    np.testing.assert_allclose(scorer.score(seqs[0]),
                               np.ones((len(ga.MODULE_NAMES), 1)),
                               rtol=1e-9)


def test_score_table_columns():
    scorer = ga.ArchitectureScorer.from_fasta()
    rng = np.random.default_rng(3)
    seqs = [''.join(rng.choice(list('ACGT'), size=200)) for _ in range(3)]
    df = scorer.score_table(seqs, ['a', 'b', 'c'])
    assert list(df['id_prompt']) == ['a', 'b', 'c']
    assert 'genetic_architecture_score' in df.columns
    assert 'genome_score' in df.columns
    prod = (df['genome_score'] * df['aabkc_score'] * df['de_score']
            * df['j_score'] * df['f_score'] * df['g_score']
            * df['h_score'])
    np.testing.assert_allclose(df['genetic_architecture_score'], prod)
