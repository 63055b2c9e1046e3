"""Golden regression fixtures (SURVEY.md §4 prescription #3).

There is no runnable reference engine in this environment (the model lives
in an unvendored pip package), so the parity anchor is *self-consistency
over time*: the tiny-config model's outputs on the repo's example FASTA are
frozen to disk the first time this test runs and asserted equal (1e-5)
thereafter. Any numeric drift — a kernel rewrite, a precision change, an
XLA upgrade — trips this test and must be either fixed or consciously
re-frozen (delete tests/golden/*.npz and rerun).
"""

import os

import jax
import numpy as np
import pytest

pytestmark = pytest.mark.smoke

from evo_tpu import model as model_lib
from evo_tpu.config import tiny_config
from evo_tpu.io.fasta import read_fasta
from evo_tpu.models import EvoModel
from evo_tpu.scoring import score_sequences
from evo_tpu.tokenizer import CharLevelTokenizer

GOLDEN = os.path.join(os.path.dirname(__file__), 'golden',
                      'tiny_scores.npz')


@pytest.fixture(scope='module')
def setup():
    cfg = tiny_config()
    params = model_lib.init_params(jax.random.PRNGKey(0), cfg)
    return EvoModel(cfg, params), CharLevelTokenizer(512)


def test_scores_match_golden(setup):
    model, tokenizer = setup
    _, seqs = read_fasta(os.path.join(os.path.dirname(__file__), '..',
                                      'examples', 'example_seqs.fasta'))
    scores = np.asarray(
        score_sequences(seqs, model, tokenizer), dtype=np.float64)
    logits = np.asarray(
        model(tokenizer.tokenize(seqs[0])[None].astype('int32'))[0],
        dtype=np.float32)
    if not os.path.exists(GOLDEN):
        os.makedirs(os.path.dirname(GOLDEN), exist_ok=True)
        np.savez(GOLDEN, scores=scores, logits0=logits)
        pytest.skip('golden fixture created; rerun to compare')
    want = np.load(GOLDEN)
    np.testing.assert_allclose(scores, want['scores'], rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(logits, want['logits0'], rtol=1e-4,
                               atol=1e-4)


def test_greedy_generation_matches_golden(setup):
    from evo_tpu.generation import generate
    model, tokenizer = setup
    golden = os.path.join(os.path.dirname(GOLDEN), 'tiny_greedy.npz')
    seqs, scores = generate(['ACGTACGT'], model, tokenizer, n_tokens=16,
                            top_k=1, temperature=1.0, verbose=0)
    if not os.path.exists(golden):
        os.makedirs(os.path.dirname(golden), exist_ok=True)
        np.savez(golden, seq=np.frombuffer(seqs[0].encode(), np.uint8),
                 score=np.float64(scores[0]))
        pytest.skip('golden fixture created; rerun to compare')
    want = np.load(golden)
    assert seqs[0] == bytes(want['seq']).decode()
    np.testing.assert_allclose(scores[0], float(want['score']), rtol=1e-5)
