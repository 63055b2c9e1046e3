"""Weight-only int8 serving mode (evo_tpu/quant.py): quantization error
bounds, model-level closeness, the prefill<->decode seam under quantized
weights, sharding-spec resolution for {'q','s'} leaves, and the byte
reduction that funds the decode-roofline claim."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from evo_tpu import model as model_lib
from evo_tpu.config import tiny_config
from evo_tpu.quant import (is_quantized, quantize_params, quantize_weight,
                           quantized_bytes, wcast)


@pytest.fixture(scope='module')
def setup():
    cfg = tiny_config()
    params = model_lib.init_params(jax.random.PRNGKey(0), cfg)
    qparams = quantize_params(params)
    return cfg, params, qparams


def test_quantize_weight_roundtrip_error():
    w = jax.random.normal(jax.random.PRNGKey(1), (64, 48), jnp.float32)
    q = quantize_weight(w, (0,))
    assert q['q'].dtype == jnp.int8 and q['s'].shape == (1, 48)
    deq = np.asarray(wcast(q, jnp.float32))
    # symmetric int8: error <= scale/2 per element
    err = np.abs(deq - np.asarray(w))
    assert np.all(err <= np.asarray(q['s'])[0] * 0.5 + 1e-7)


def test_quantize_params_selects_projections_only(setup):
    cfg, params, qparams = setup
    blocks = model_lib.layer_blocks(qparams, cfg)
    hy = next(b for b in blocks if 'hyena' in b)
    at = next(b for b in blocks if 'attn' in b)
    for leaf in (hy['hyena']['w_in'], hy['hyena']['w_out'],
                 at['attn']['wqkv'], at['attn']['wo'],
                 hy['mlp']['w1'], hy['mlp']['w2'], hy['mlp']['w3']):
        assert is_quantized(leaf)
    # precision-critical leaves untouched
    assert hy['hyena']['poles'].dtype == jnp.float32
    assert not is_quantized(hy['hyena']['fir_w'])
    assert not is_quantized(qparams['embedding'])


def test_quantize_params_idempotent(setup):
    cfg, params, qparams = setup
    again = quantize_params(qparams)
    a, b = jax.tree_util.tree_leaves(qparams), \
        jax.tree_util.tree_leaves(again)
    assert all(x is y or (x.shape == y.shape and x.dtype == y.dtype)
               for x, y in zip(a, b))
    assert len(a) == len(b)


def test_quantized_bytes_halved(setup):
    cfg, params, qparams = setup
    assert quantized_bytes(qparams) < 0.6 * quantized_bytes(params)


def test_forward_close_to_unquantized(setup):
    cfg, params, qparams = setup
    ids = jax.random.randint(jax.random.PRNGKey(2), (2, 33), 0, 512)
    lg = np.asarray(model_lib.forward(params, cfg, ids))
    lq = np.asarray(model_lib.forward(qparams, cfg, ids))
    diff = np.abs(lq - lg)
    assert np.isfinite(lq).all()
    assert diff.mean() < 0.05, diff.mean()
    assert diff.max() < 0.6, diff.max()
    # greedy path mostly agrees on a random tiny model
    agree = (lg.argmax(-1) == lq.argmax(-1)).mean()
    assert agree > 0.8, agree


def test_prefill_decode_seam_quantized(setup):
    """The highest-risk numeric seam (SURVEY.md §4 #5) must stay exact
    under quantized weights: prefill and decode read identical dequantized
    values."""
    cfg, params, qparams = setup
    ids = jax.random.randint(jax.random.PRNGKey(3), (1, 16), 0, 512)
    lg_fwd = model_lib.forward(qparams, cfg, ids)
    cache = model_lib.init_cache(cfg, 1, 24)
    lg_pre, cache = model_lib.prefill(qparams, cfg, ids, cache)
    np.testing.assert_allclose(np.asarray(lg_fwd), np.asarray(lg_pre),
                               rtol=1e-5, atol=1e-5)
    step = jax.random.randint(jax.random.PRNGKey(4), (1, 1), 0, 512)
    full = jnp.concatenate([ids, step], axis=1)
    lg_all = model_lib.forward(qparams, cfg, full)
    lg_s, _ = model_lib.decode_step(qparams, cfg, step, cache)
    np.testing.assert_allclose(
        np.asarray(lg_s).reshape(1, -1), np.asarray(lg_all[:, -1]),
        rtol=2e-4, atol=2e-4)


def test_sharded_quantized_forward():
    from evo_tpu.parallel.mesh import make_mesh
    from evo_tpu.parallel.sharding import param_shardings

    cfg = tiny_config(weight_quant='int8')
    mesh = make_mesh(dp=2, tp=4)
    params = model_lib.init_params(jax.random.PRNGKey(0), cfg)
    qparams = quantize_params(params)
    shardings = param_shardings(cfg, mesh)
    jax.tree_util.tree_map(lambda a, b: None, qparams, shardings)  # same tree
    qparams = jax.device_put(qparams, shardings)
    ids = jax.random.randint(jax.random.PRNGKey(5), (2, 32), 0, 512)
    lg = jax.jit(lambda p, i: model_lib.forward(p, cfg, i, mesh=mesh))(
        qparams, ids)
    lq_ref = model_lib.forward(quantize_params(params), cfg, ids)
    np.testing.assert_allclose(np.asarray(lg), np.asarray(lq_ref),
                               rtol=2e-4, atol=2e-4)
    # int8 x int8 path under the same tp sharding (GSPMD partitions the
    # int8 dots; per-token activation scales are replicated on tp)
    cfg_aq = cfg.replace(act_quant='int8')
    lga = jax.jit(lambda p, i: model_lib.forward(p, cfg_aq, i, mesh=mesh))(
        qparams, ids)
    lga_ref = model_lib.forward(quantize_params(params), cfg_aq, ids)
    np.testing.assert_allclose(np.asarray(lga), np.asarray(lga_ref),
                               rtol=5e-4, atol=5e-4)


def test_qdot_matches_dequantized_dot():
    from evo_tpu.quant import qdot
    key = jax.random.PRNGKey(7)
    x = jax.random.normal(key, (4, 9, 64), jnp.float32)
    w = jax.random.normal(jax.random.PRNGKey(8), (64, 32), jnp.float32)
    wq = quantize_weight(w, (0,))
    got = np.asarray(qdot(x, wq))
    want = np.asarray(x @ np.asarray(wcast(wq, jnp.float32)))
    # activation quantization adds ~|x|_max/254 per element over 64 terms
    assert np.abs(got - want).max() < 0.35
    # unquantized fallback is exact
    np.testing.assert_allclose(np.asarray(qdot(x, w)), np.asarray(x @ w),
                               rtol=1e-6, atol=1e-6)
    # nc=2: contract two trailing/leading dims (attention wo layout)
    y = jax.random.normal(key, (2, 5, 4, 16), jnp.float32)
    wo = jax.random.normal(jax.random.PRNGKey(9), (4, 16, 8), jnp.float32)
    woq = quantize_weight(wo, (0, 1))
    got2 = np.asarray(qdot(y, woq, nc=2))
    want2 = np.einsum('blhe,hed->bld', np.asarray(y),
                      np.asarray(wcast(woq, jnp.float32)))
    assert got2.shape == (2, 5, 8)
    assert np.abs(got2 - want2).max() < 0.35


def test_act_quant_forward_close(setup):
    cfg, params, qparams = setup
    cfg_aq = cfg.replace(weight_quant='int8', act_quant='int8')
    ids = jax.random.randint(jax.random.PRNGKey(12), (2, 40), 0, 512)
    lg = np.asarray(model_lib.forward(params, cfg, ids))
    la = np.asarray(model_lib.forward(qparams, cfg_aq, ids))
    assert np.isfinite(la).all()
    diff = np.abs(la - lg)
    assert diff.mean() < 0.08, diff.mean()
    agree = (lg.argmax(-1) == la.argmax(-1)).mean()
    assert agree > 0.75, agree


def test_act_quant_prefill_decode_seam(setup):
    """Prefill and decode quantize the same activations identically, so
    the seam stays tight even in the int8 x int8 mode."""
    cfg, params, qparams = setup
    cfg_aq = cfg.replace(weight_quant='int8', act_quant='int8')
    ids = jax.random.randint(jax.random.PRNGKey(13), (1, 12), 0, 512)
    cache = model_lib.init_cache(cfg_aq, 1, 20)
    lg_fwd = model_lib.forward(qparams, cfg_aq, ids)
    lg_pre, cache = model_lib.prefill(qparams, cfg_aq, ids, cache)
    np.testing.assert_allclose(np.asarray(lg_fwd), np.asarray(lg_pre),
                               rtol=1e-4, atol=1e-4)
    step = jax.random.randint(jax.random.PRNGKey(14), (1, 1), 0, 512)
    full = jnp.concatenate([ids, step], axis=1)
    lg_all = model_lib.forward(qparams, cfg_aq, full)
    lg_s, _ = model_lib.decode_step(qparams, cfg_aq, step, cache)
    np.testing.assert_allclose(
        np.asarray(lg_s).reshape(1, -1), np.asarray(lg_all[:, -1]),
        rtol=5e-4, atol=5e-4)


def test_act_quant_requires_weight_quant():
    from evo_tpu.models import load_checkpoint
    with pytest.raises(ValueError, match='act_quant'):
        load_checkpoint('evo-1-8k-base', random_init=True,
                        config_overrides=dict(
                            hidden_size=64, num_filters=64, num_layers=2,
                            attn_layer_idxs=(1,), hyena_layer_idxs=(),
                            num_attention_heads=4, state_size=4,
                            use_pallas='never', act_quant='int8'))


def test_evo_api_weight_quant():
    from evo_tpu import Evo, score_sequences
    ov = dict(hidden_size=64, num_filters=64, num_layers=2,
              attn_layer_idxs=(1,), hyena_layer_idxs=(),
              num_attention_heads=4, state_size=4,
              compute_dtype='float32', param_dtype='float32',
              use_pallas='never', weight_quant='int8')
    evo = Evo('evo-1-8k-base', random_init=True, config_overrides=ov)
    scores = score_sequences(['ACGT', 'ACGTT'], evo.model, evo.tokenizer)
    assert all(np.isfinite(s) and s < 0 for s in scores)
