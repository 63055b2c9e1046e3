"""End-to-end model tests on the tiny CPU config: shapes, padding
invariance, and the prefill <-> decode equivalence seam (SURVEY.md §4
prescription #5: 'same tokens via one forward vs prefill+step must agree' —
the highest-risk numeric seam)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.smoke

from evo_tpu import model as model_lib
from evo_tpu.config import tiny_config


@pytest.fixture(scope='module')
def setup():
    cfg = tiny_config()
    params = model_lib.init_params(jax.random.PRNGKey(0), cfg)
    return cfg, params


def test_forward_shape_and_dtype(setup):
    cfg, params = setup
    ids = jax.random.randint(jax.random.PRNGKey(1), (3, 17), 0, 512)
    logits = model_lib.forward(params, cfg, ids)
    assert logits.shape == (3, 17, cfg.vocab_size)
    assert logits.dtype == jnp.float32
    assert np.all(np.isfinite(np.asarray(logits)))


def test_right_padding_does_not_change_earlier_logits(setup):
    """Causality: right-padding (bucketing) must not alter logits at
    positions before the pad — the padding-without-masking contract
    (evo/scoring.py:22-31) and the bucketing optimization both rely on it."""
    cfg, params = setup
    ids = jax.random.randint(jax.random.PRNGKey(2), (2, 9), 0, 512)
    padded = jnp.concatenate(
        [ids, jnp.full((2, 7), 1, dtype=ids.dtype)], axis=1)
    lg_a = model_lib.forward(params, cfg, ids)
    lg_b = model_lib.forward(params, cfg, padded)[:, :9]
    np.testing.assert_allclose(np.asarray(lg_a), np.asarray(lg_b),
                               rtol=1e-5, atol=1e-5)


def test_prefill_matches_forward_logits(setup):
    cfg, params = setup
    ids = jax.random.randint(jax.random.PRNGKey(3), (2, 12), 0, 512)
    cache = model_lib.init_cache(cfg, 2, 20)
    lg_fwd = model_lib.forward(params, cfg, ids)
    lg_pre, cache = model_lib.prefill(params, cfg, ids, cache)
    np.testing.assert_allclose(np.asarray(lg_fwd), np.asarray(lg_pre),
                               rtol=1e-5, atol=1e-5)
    assert int(cache['offset']) == 12


def test_decode_matches_forward(setup):
    """Prefill L tokens then decode the rest one-by-one; every step's logits
    must match the full-sequence forward at that position."""
    cfg, params = setup
    total, split = 18, 7
    ids = jax.random.randint(jax.random.PRNGKey(4), (2, total), 0, 512)
    lg_full = np.asarray(model_lib.forward(params, cfg, ids))

    cache = model_lib.init_cache(cfg, 2, total)
    lg_pre, cache = model_lib.prefill(params, cfg, ids[:, :split], cache)
    np.testing.assert_allclose(np.asarray(lg_pre), lg_full[:, :split],
                               rtol=1e-4, atol=1e-4)
    for t in range(split, total):
        lg_t, cache = model_lib.decode_step(params, cfg, ids[:, t], cache)
        np.testing.assert_allclose(
            np.asarray(lg_t), lg_full[:, t], rtol=1e-3, atol=1e-3,
            err_msg=f'decode step at position {t}')
    assert int(cache['offset']) == total


def test_decode_from_length_one_prefill(setup):
    """Degenerate prefill (single token) then pure decode."""
    cfg, params = setup
    total = 9
    ids = jax.random.randint(jax.random.PRNGKey(5), (1, total), 0, 512)
    lg_full = np.asarray(model_lib.forward(params, cfg, ids))
    cache = model_lib.init_cache(cfg, 1, total)
    lg, cache = model_lib.prefill(params, cfg, ids[:, :1], cache)
    np.testing.assert_allclose(np.asarray(lg), lg_full[:, :1], rtol=1e-4,
                               atol=1e-4)
    for t in range(1, total):
        lg, cache = model_lib.decode_step(params, cfg, ids[:, t], cache)
        np.testing.assert_allclose(np.asarray(lg), lg_full[:, t], rtol=1e-3,
                                   atol=1e-3)


def test_tied_embeddings(setup):
    cfg, params = setup
    assert cfg.tie_embeddings
    assert 'unembed' not in params


def test_param_count_7b_schema():
    """The full-size config should land at ~7B params (README.md:9)."""
    from evo_tpu.models import config_for_model
    cfg = config_for_model('evo-1-8k-base')
    D, I, V = cfg.hidden_size, cfg.inner_mlp_size_actual, cfg.padded_vocab_size
    assert I == 10928
    n_attn, n_hyena = 3, 29
    per_mlp = 2 * D * I + I * D
    per_attn = D * 3 * D + 3 * D + D * D + D
    per_hyena = (D * 3 * D + 3 * D) + (3 * D * 3 + 3 * D) + \
        (D * cfg.state_size * 2 * 2) + D + (D * D + D)
    norms = cfg.num_layers * 2 * D + D
    total = V * D + n_attn * per_attn + n_hyena * per_hyena + \
        cfg.num_layers * per_mlp + norms
    assert 6.0e9 < total < 8.0e9


def test_chunked_conv_config_matches_monolithic(setup):
    """cfg.hyena_fft_chunk must not change forward logits (131k memory
    path, SURVEY.md §7 hard part #3)."""
    cfg, params = setup
    ids = jax.random.randint(jax.random.PRNGKey(9), (2, 21), 0, 512)
    want = model_lib.forward(params, cfg, ids)
    got = model_lib.forward(params, cfg.replace(hyena_fft_chunk=8), ids)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-4)


def test_chunked_prefill_decode_handoff(setup):
    """Prefill through the chunked-conv path, then decode: logits must
    match the full forward at each decoded position."""
    cfg, params = setup
    cfg = cfg.replace(hyena_fft_chunk=8)
    total, split = 20, 13
    ids = jax.random.randint(jax.random.PRNGKey(10), (1, total), 0, 512)
    full = model_lib.forward(params, cfg, ids)
    cache = model_lib.init_cache(cfg, 1, total + 2)
    lg, cache = model_lib.prefill(params, cfg, ids[:, :split], cache)
    np.testing.assert_allclose(np.asarray(lg), np.asarray(full[:, :split]),
                               rtol=2e-4, atol=2e-4)
    last = lg[:, -1]
    for t in range(split, total):
        last, cache = model_lib.decode_step(params, cfg, ids[:, t], cache)
        np.testing.assert_allclose(np.asarray(last), np.asarray(full[:, t]),
                                   rtol=2e-3, atol=2e-3)
