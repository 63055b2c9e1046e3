import os

import jax
import numpy as np
import pytest

pytestmark = pytest.mark.smoke

from evo_tpu import model as model_lib
from evo_tpu.config import tiny_config
from evo_tpu.io.fasta import read_fasta
from evo_tpu.models import EvoModel
from evo_tpu.scoring import (logits_to_logprobs, positional_entropies,
                             prepare_batch, score_sequences)
from evo_tpu.tokenizer import CharLevelTokenizer

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
EXAMPLE_FASTA = os.path.join(REPO, 'examples', 'example_seqs.fasta')


@pytest.fixture(scope='module')
def setup():
    cfg = tiny_config()
    params = model_lib.init_params(jax.random.PRNGKey(0), cfg)
    return EvoModel(cfg, params), CharLevelTokenizer(512)


def test_prepare_batch_padding():
    tok = CharLevelTokenizer(512)
    ids, lengths = prepare_batch(['ACGT', 'AC'], tok, prepend_bos=True)
    assert lengths == [4, 2]
    assert ids.shape == (2, 5)
    assert ids[0, 0] == 0 and ids[1, 0] == 0          # BOS = eod = 0
    assert list(ids[1, 3:]) == [1, 1]                  # right pad = 1


def test_prepare_batch_no_bos():
    tok = CharLevelTokenizer(512)
    ids, _ = prepare_batch(['ACGT'], tok, prepend_bos=False)
    assert ids.shape == (1, 4)
    assert list(ids[0]) == [65, 67, 71, 84]


def test_logits_to_logprobs_shapes(setup):
    model, tok = setup
    ids, _ = prepare_batch(['ACGT', 'CAGATTCCATT'], tok)
    logits, _ = model(ids)
    lp = logits_to_logprobs(logits, ids, trim_bos=True)
    assert lp.shape == (2, ids.shape[1] - 1)
    assert np.all(np.asarray(lp) <= 0)


def test_score_sequences_on_example_fasta(setup):
    """BASELINE config #1 anchor: score examples/example_seqs.fasta on the
    tiny CPU-runnable config."""
    model, tok = setup
    names, seqs = read_fasta(EXAMPLE_FASTA)
    assert names == ['seq0', 'seq1', 'seq2']
    scores = score_sequences(seqs, model, tok)
    assert len(scores) == 3
    assert all(np.isfinite(s) and s < 0 for s in scores)
    sums = score_sequences(seqs, model, tok, reduce_method='sum')
    for s_mean, s_sum, seq in zip(scores, sums, seqs):
        np.testing.assert_allclose(s_sum, s_mean * len(seq), rtol=1e-5)


def test_bucketing_invariance(setup):
    """pad_to_bucket must not change scores (causal right-pad invariance)."""
    model, tok = setup
    _, seqs = read_fasta(EXAMPLE_FASTA)
    a = score_sequences(seqs, model, tok, pad_to_bucket=False)
    b = score_sequences(seqs, model, tok, pad_to_bucket=True)
    np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-5)


def test_batch_vs_single_scores(setup):
    """Ragged batching with right-pad must equal per-sequence scoring."""
    model, tok = setup
    _, seqs = read_fasta(EXAMPLE_FASTA)
    batch_scores = score_sequences(seqs, model, tok)
    single_scores = [score_sequences([s], model, tok)[0] for s in seqs]
    np.testing.assert_allclose(batch_scores, single_scores, rtol=1e-4,
                               atol=1e-5)


def test_positional_entropies(setup):
    model, tok = setup
    _, seqs = read_fasta(EXAMPLE_FASTA)
    ents = positional_entropies(seqs, model, tok)
    assert [len(e) for e in ents] == [len(s) for s in seqs]
    for e in ents:
        assert np.all(e >= 0)
        assert np.all(e <= np.log(512) + 1e-5)


@pytest.mark.parametrize('prepend_bos,segment_len', [(True, 16),
                                                     (False, 13)])
def test_segmented_entropies_match_monolithic(setup, prepend_bos,
                                              segment_len):
    """Per-position entropies through the resumable donate-cache prefill
    == one-pass entropies (the 131k long-context analysis path), incl.
    non-aligned segment sizes."""
    from evo_tpu.scoring import positional_entropies_segmented
    model, tok = setup
    seqs = ['ACGTACGATCGACGATCCGATCGGATCCAAAGGCGCGATACGATCAGCTT',
            'CAGATTCCATT']
    for s in seqs:
        want = positional_entropies([s], model, tok,
                                    prepend_bos=prepend_bos)[0]
        got = positional_entropies_segmented(
            [s], model, tok, segment_len=segment_len,
            prepend_bos=prepend_bos)[0]
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_invalid_reduce_method(setup):
    model, tok = setup
    with pytest.raises(ValueError):
        score_sequences(['ACGT'], model, tok, reduce_method='median')


def test_score_stream_matches_score_sequences(setup):
    from evo_tpu.scoring import score_sequences, score_stream
    model, tokenizer = setup
    seqs = ['ACGT', 'CAGATTCCATT', 'ACGTACGTACGTACGTACGTACGTACGTACGT',
            'GG', 'TTTTTTT']
    want = []
    for i in range(0, len(seqs), 2):
        want += score_sequences(seqs[i:i + 2], model, tokenizer,
                                pad_to_bucket=True)
    batches = [seqs[i:i + 2] for i in range(0, len(seqs), 2)]
    seen = []
    got = score_stream(batches, model, tokenizer, pad_to_bucket=True,
                       progress=seen.append)
    assert got == want
    assert seen[-1] == len(seqs)


def test_prefetch_map_order_and_errors():
    from evo_tpu.io.prefetch import prefetch_map
    assert list(prefetch_map(lambda x: x * x, range(10), depth=3)) == \
        [x * x for x in range(10)]
    assert list(prefetch_map(str, [], depth=2)) == []

    def boom(x):
        if x == 2:
            raise ValueError('boom')
        return x
    it = prefetch_map(boom, range(5), depth=1)
    assert next(it) == 0 and next(it) == 1
    import pytest as _pytest
    with _pytest.raises(ValueError, match='boom'):
        list(it)


def test_no_bos_scoring_uses_next_token_pairing(setup):
    """With prepend_bos=False the reference still trims (evo/scoring.py:83):
    position-t logits score token t+1. The score must equal the manual
    next-token computation."""
    from evo_tpu.scoring import score_sequences
    model, tokenizer = setup
    seq = 'ACGTACGTACG'
    ids, _ = prepare_batch([seq], tokenizer, prepend_bos=False)
    logits, _ = model(ids)
    import jax.numpy as jnp
    logp = np.asarray(jax.nn.log_softmax(
        jnp.asarray(logits, jnp.float32), axis=-1))
    manual = [logp[0, t, int(ids[0, t + 1])]
              for t in range(len(seq) - 1)]
    got = score_sequences([seq], model, tokenizer, prepend_bos=False,
                          reduce_method='sum')[0]
    # reference slices [:seq_len] over the L-1 trimmed positions -> the
    # sum covers exactly the L-1 next-token terms
    np.testing.assert_allclose(got, float(np.sum(manual)), rtol=1e-5)


def test_segment_bounds():
    """Ragged remainder first; tiny remainders absorbed into the first
    segment (a 1-token LAST segment would route through the non-donating
    decode step — the 131073-token BOS-prefixed OOM found in review)."""
    from evo_tpu.scoring import _segment_bounds
    assert _segment_bounds(131073, 8192)[:2] == [0, 8193]
    b = _segment_bounds(131073, 8192)
    assert b[-1] == 131073 and all(e - s == 8192 for s, e in
                                   zip(b[1:-1], b[2:]))
    assert _segment_bounds(51, 16) == [0, 19, 35, 51]
    assert _segment_bounds(280, 180) == [0, 100, 280]
    assert _segment_bounds(32, 64) == [0, 32]
    assert _segment_bounds(64, 64) == [0, 64]
    assert _segment_bounds(1, 8192) == [0, 1]
    # no segment besides a tail-less first is ever shorter than 64
    for L in (8193, 8256, 10000, 16384):
        bb = _segment_bounds(L, 8192)
        assert all(e - s >= 64 for s, e in zip(bb[1:-1], bb[2:]))


@pytest.mark.parametrize('prepend_bos,segment_len',
                         [(True, 16), (False, 16), (True, 13),
                          # L % seg == 1 (the 131073-token shape class)
                          (True, 10)])
def test_segmented_scoring_matches_monolithic(setup, prepend_bos,
                                              segment_len):
    """Chunked-prefill scoring through the resumable cache == one-pass
    scoring, incl. a short final segment and non-aligned segment sizes
    (the 131k single-chip memory path, SURVEY.md §7 hard part #3)."""
    from evo_tpu.scoring import score_sequences_segmented
    model, tok = setup
    seqs = ['ACGTACGATCGACGATCCGATCGGATCCAAAGGCGCGATACGATCAGCTT',
            'CAGATTCCATT']
    for reduce_method in ('mean', 'sum'):
        # oracle is UNBATCHED monolithic scoring: segmented runs B=1, so
        # the reference's batch-padding quirk (one pad logprob leaks into
        # short sequences when prepend_bos=False) does not apply
        want = [score_sequences([s], model, tok,
                                reduce_method=reduce_method,
                                prepend_bos=prepend_bos)[0] for s in seqs]
        got = score_sequences_segmented(
            seqs, model, tok, segment_len=segment_len,
            reduce_method=reduce_method, prepend_bos=prepend_bos)
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)
