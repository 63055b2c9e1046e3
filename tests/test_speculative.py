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


def test_ngram_longest_match_beats_short_collisions():
    # 4-letter-alphabet regression (BASELINE.md 2026-08-20): on a tandem
    # repeat of a long unit, short grams collide WITHIN the unit and a
    # short-only index copies from the wrong local match; the
    # longest-match index must recover the true periodic continuation.
    rng = np.random.default_rng(7)
    unit = rng.integers(0, 4, 512).tolist()       # DNA-sized alphabet
    stream = unit * 2 + unit[:31]                 # mid-unit query point
    idx = NGramIndex(n=12, n_min=4)
    idx.extend(stream)
    np.testing.assert_array_equal(idx.propose(8), unit[31:39])
    # single short-n behavior preserved (n_min defaults to n): the most
    # recent 3-mer match inside the unit generally is NOT one period back
    idx3 = NGramIndex(n=3)
    idx3.extend(stream)
    assert idx3.n_min == idx3.n == 3


def test_ngram_index_memory_bounded_by_window():
    # ADVICE r4: without eviction the per-length dicts grow one entry per
    # emitted token — GBs at the >650k-token regime. The sliding-window
    # rebuild must bound every dict at <= 2*window entries while keeping
    # proposals exact for matches inside the window.
    rng = np.random.default_rng(3)
    unit = rng.integers(0, 4, 256).tolist()
    idx = NGramIndex(n=12, n_min=4, window=1024)
    for _ in range(40):                      # 10,240 tokens >> 2*window
        idx.extend(unit)
        idx.propose(8)                       # triggers _catch_up
    assert all(len(d) <= 2 * idx.window for d in idx._index.values())
    # the most recent period is inside the window -> proposal still exact
    idx.extend(unit[:31])
    np.testing.assert_array_equal(idx.propose(8), unit[31:39])


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


def test_accept_or_resample_preserves_target_distribution():
    """The point-draft rejection step emits exactly p-distributed tokens
    for any proposal (brute-force empirical check)."""
    from evo_tpu.speculative import accept_or_resample
    p = np.asarray([0.5, 0.25, 0.15, 0.1])
    for proposal in range(4):
        rng = np.random.default_rng(proposal)
        counts = np.zeros(4)
        n = 200_000
        for _ in range(n):
            _, tok = accept_or_resample(rng, p, proposal)
            counts[tok] += 1
        np.testing.assert_allclose(counts / n, p, atol=5e-3)


def test_filtered_probs_matches_sampling_ops():
    """Host-side filtering == the on-device sampling filters."""
    import jax.numpy as jnp

    from evo_tpu.ops.sampling import top_k_filter, top_p_filter
    from evo_tpu.speculative import filtered_probs
    rng = np.random.default_rng(0)
    for temp, k, p_nuc in [(0.7, 4, 1.0), (1.0, 0, 0.6), (0.5, 8, 0.9)]:
        logits = rng.normal(size=24).astype(np.float32) * 3
        want = jnp.asarray(logits, jnp.float32) / temp
        want = top_k_filter(want, k)
        want = top_p_filter(want, p_nuc)
        want = np.asarray(jax.nn.softmax(want))
        got = filtered_probs(logits, temp, k, p_nuc)
        np.testing.assert_allclose(got, want, atol=1e-6)


def test_sampled_speculative_marginal_matches_direct_sampling(setup):
    """Statistical exactness: the distribution of the token emitted by
    the speculative sampler's FIRST verify cycle equals direct sampling
    from the same model (same temperature/top-k)."""
    model, tok = setup
    prompt = 'ACGTACGTACGT'
    n_trials = 1500
    spec_counts: dict = {}
    for s in range(n_trials):
        got, _, _ = generate_speculative(model, tok, prompt=prompt,
                                         num_tokens=2, gamma=2,
                                         temperature=0.8, top_k=4, seed=s)
        key = (int(got[0]), int(got[1]))
        spec_counts[key] = spec_counts.get(key, 0) + 1
    # direct sampling oracle with the same filters, via the model's own
    # logits (host-side categorical draws)
    from evo_tpu.speculative import filtered_probs
    ids = np.asarray(tok.tokenize(prompt))[None]
    logits, _ = model(ids)
    p0 = filtered_probs(np.asarray(logits[0, -1], np.float32), 0.8, 4, 1.0)
    rng = np.random.default_rng(12345)
    direct_counts: dict = {}
    # exact two-step enumeration is heavy; compare the FIRST-token
    # marginal (closed form) and the conditional second-token marginal
    # for the most likely first token
    first_marginal = np.zeros_like(p0)
    for (t0, _t1), c in spec_counts.items():
        first_marginal[t0] += c
    first_marginal /= n_trials
    support = p0 > 1e-9
    assert np.max(np.abs(first_marginal[support] - p0[support])) < 0.05
    t0_star = int(np.argmax(p0))
    ids2 = np.concatenate([ids, [[t0_star]]], axis=1)
    logits2, _ = model(ids2)
    p1 = filtered_probs(np.asarray(logits2[0, -1], np.float32), 0.8, 4, 1.0)
    cond = np.zeros_like(p1)
    n_cond = 0
    for (t0, t1), c in spec_counts.items():
        if t0 == t0_star:
            cond[t1] += c
            n_cond += c
    assert n_cond > 200          # the argmax token appears often enough
    cond /= n_cond
    assert np.max(np.abs(cond[p1 > 1e-9] - p1[p1 > 1e-9])) < 0.08


def test_speculative_validation(setup):
    model, tok = setup
    with pytest.raises(ValueError):
        generate_speculative(model, tok, prompt='', num_tokens=4)
    with pytest.raises(ValueError):
        generate_speculative(model, tok, prompt='ACGT', num_tokens=0)
    with pytest.raises(ValueError):
        generate_speculative(model, tok, prompt='ACGT', num_tokens=4,
                             gamma=0)
