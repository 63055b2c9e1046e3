"""n-gram speculative decoding (evo_tpu/speculative.py): token-exact vs
ordinary greedy decoding on both friendly (repetitive) and adversarial
(low-acceptance) inputs."""

import jax
import numpy as np
import pytest

from evo_tpu import model as model_lib
from evo_tpu.config import tiny_config
from evo_tpu.generation import Generator
from evo_tpu.models import EvoModel
from evo_tpu.speculative import NGramIndex, generate_speculative
from evo_tpu.tokenizer import CharLevelTokenizer


@pytest.fixture(scope='module')
def setup():
    cfg = tiny_config()
    params = model_lib.init_params(jax.random.PRNGKey(0), cfg)
    return EvoModel(cfg, params), CharLevelTokenizer(512)


def _greedy(model, tok, prompt, n):
    g = Generator(model, tok, top_k=1, temperature=0.0)
    gen, scores, _ = g.generate(
        input_ids=np.asarray(tok.tokenize(prompt))[None], num_tokens=n)
    return np.asarray(gen)[0], np.asarray(scores)


def test_ngram_index_proposes_continuation_of_earlier_match():
    idx = NGramIndex(n=2)
    idx.extend([5, 6, 7, 8, 9, 5, 6])
    # trailing gram (5, 6) occurred earlier at positions 0-1 -> continue 7, 8
    np.testing.assert_array_equal(idx.propose(3), [7, 8, 9])
    # no match: repeats the last token
    idx2 = NGramIndex(n=2)
    idx2.extend([1, 2, 3])
    np.testing.assert_array_equal(idx2.propose(2), [3, 3])


@pytest.mark.parametrize('gamma,ngram', [(1, 2), (4, 3), (8, 3)])
def test_speculative_matches_greedy_repetitive_prompt(setup, gamma, ngram):
    model, tok = setup
    prompt = 'ACGTACGTACGTACGTACGT'     # high n-gram self-similarity
    n = 24
    want, _ = _greedy(model, tok, prompt, n)
    got, logps, stats = generate_speculative(
        model, tok, prompt=prompt, num_tokens=n, gamma=gamma, ngram=ngram)
    np.testing.assert_array_equal(got, want)
    assert len(logps) == n and all(np.isfinite(lp) and lp <= 0.0
                                   for lp in logps)
    assert stats.cycles >= 1


def test_speculative_matches_greedy_adversarial_prompt(setup):
    """Low-acceptance input: every cycle may roll back; still exact."""
    model, tok = setup
    prompt = 'AGTCCATGAACGTTAGCATGCAATCGGATC'     # no repeated 3-grams
    n = 17
    want, _ = _greedy(model, tok, prompt, n)
    got, logps, stats = generate_speculative(
        model, tok, prompt=prompt, num_tokens=n, gamma=4, ngram=3)
    np.testing.assert_array_equal(got, want)
    assert len(logps) == n


def test_speculative_logprobs_match_generator_scores(setup):
    """The per-token logprobs equal the greedy Generator's score logits
    evaluated at the emitted tokens (same distribution rows)."""
    model, tok = setup
    prompt = 'ACGTACGTACGT'
    n = 10
    want, score_logits = _greedy(model, tok, prompt, n)
    got, logps, _ = generate_speculative(model, tok, prompt=prompt,
                                         num_tokens=n, gamma=4)
    lg = score_logits[0].astype(np.float64)                # (n, V)
    m = lg.max(-1, keepdims=True)
    ref_logp = lg - m - np.log(np.exp(lg - m).sum(-1, keepdims=True))
    want_lp = ref_logp[np.arange(n), want]
    np.testing.assert_allclose(np.asarray(logps), want_lp, atol=1e-4)


def test_speculative_acceptance_saves_device_calls(setup):
    """On a strongly periodic generation the verify pass amortizes: fewer
    device calls than emitted tokens."""
    model, tok = setup
    # force a periodic stream by priming a long repeated motif
    prompt = 'ACGTTGCA' * 6
    n = 32
    got, _, stats = generate_speculative(model, tok, prompt=prompt,
                                         num_tokens=n, gamma=8, ngram=3)
    want, _ = _greedy(model, tok, prompt, n)
    np.testing.assert_array_equal(got, want)
    assert stats.proposed > 0
    # exactness is mandatory; savings depend on the model's own output —
    # report rather than assert a threshold on random weights
    print('acceptance', stats.acceptance_rate, 'tokens/call',
          stats.tokens_per_call)


def test_speculative_validation(setup):
    model, tok = setup
    with pytest.raises(ValueError):
        generate_speculative(model, tok, prompt='', num_tokens=4)
    with pytest.raises(ValueError):
        generate_speculative(model, tok, prompt='ACGT', num_tokens=0)
    with pytest.raises(ValueError):
        generate_speculative(model, tok, prompt='ACGT', num_tokens=4,
                             gamma=0)
