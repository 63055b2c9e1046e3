"""Weight-only int4 serving mode (evo_tpu/quant.py int4 +
ops/pallas_int4.py): pack/unpack round-trip, kernel vs exact oracle,
qdot dispatch, quantization error bounds, and model-level closeness."""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from evo_tpu import model as model_lib
from evo_tpu.models import config_for_model
from evo_tpu.ops.pallas_int4 import (M_MAX, int4_matmul,
                                     int4_matmul_supported, pack_int4,
                                     unpack_int4_jnp)
from evo_tpu.quant import (int4_dot, is_int4, qdot, quantize_params,
                           quantize_weight_int4, quantized_bytes)

def int4_matmul_i(*a, **kw):
    return int4_matmul(*a, interpret=True, **kw)


def _rand_q(key, Kp, N):
    return jax.random.randint(key, (Kp, N), -8, 8, jnp.int8)


def test_pack_unpack_roundtrip():
    q = _rand_q(jax.random.PRNGKey(0), 256, 384)
    p = pack_int4(q)
    assert p.shape == (128, 384) and p.dtype == jnp.int8
    np.testing.assert_array_equal(np.asarray(unpack_int4_jnp(p)),
                                  np.asarray(q))


def _oracle(x, q, s):
    """Exact f32 reference of the kernel's math: per-group bf16-input
    f32-accum dot, f32 scale applied to the accumulator."""
    M, Kp = x.shape
    G, N = s.shape
    w = np.asarray(unpack_int4_jnp(q), np.float32).reshape(G, 128, N)
    xg = np.asarray(x, np.float32).reshape(M, G, 128)
    acc = np.zeros((M, N), np.float32)
    for g in range(G):
        acc += (xg[:, g] @ w[g]) * s[g][None]
    return acc


def _oracle_block(x, q, s):
    """Block-mode reference: scales folded into bf16 weights pre-dot."""
    M, Kp = x.shape
    G, N = s.shape
    w = np.asarray(unpack_int4_jnp(q), np.float32).reshape(G, 128, N)
    wbf = np.asarray(jnp.asarray(w * np.asarray(s)[:, None])
                     .astype(jnp.bfloat16).astype(jnp.float32))
    return np.asarray(x, np.float32).reshape(M, Kp) @ wbf.reshape(Kp, N)


def _oracle_dots8(x, q, s):
    """dots8-mode reference: same per-row int8 activation quantization,
    then the exact-integer group dots."""
    x32 = np.asarray(x, np.float32)
    xs = np.maximum(np.max(np.abs(x32), axis=1, keepdims=True) / 127.0,
                    1e-12)
    xq = np.clip(np.round(x32 / xs), -127, 127).astype(np.float32)
    M, Kp = x.shape
    G, N = s.shape
    w = np.asarray(unpack_int4_jnp(q), np.float32).reshape(G, 128, N)
    xg = xq.reshape(M, G, 128)
    acc = np.zeros((M, N), np.float32)
    for g in range(G):
        acc += (xg[:, g] @ w[g]) * s[g][None]
    return acc * xs


@pytest.mark.parametrize('M,Kp,N', [
    (8, 256, 512),       # small everything
    (1, 4096, 688),      # decode matvec; N not a lane multiple (tail tile)
    (16, 1536, 512),     # Kp with 12 groups / 6 byte blocks
    (128, 512, 1024),    # M at the single-block limit
])
@pytest.mark.parametrize('mode', ['unroll', 'block', 'dots', 'dots8'])
def test_kernel_matches_oracle(M, Kp, N, mode):
    ks = jax.random.split(jax.random.PRNGKey(M + N), 3)
    x = jax.random.normal(ks[0], (M, Kp), jnp.bfloat16)
    q = pack_int4(_rand_q(ks[1], Kp, N))
    s = jax.random.uniform(ks[2], (Kp // 128, N), jnp.float32,
                           minval=0.01, maxval=0.1)
    got = np.asarray(int4_matmul_i(x, q, s, mode=mode))
    if mode == 'block':
        want = _oracle_block(x, q, s)
    elif mode == 'dots8':
        want = _oracle_dots8(x, q, s)
    else:
        # 'dots' uses exact-in-bf16 byte values, so like 'unroll' it
        # matches the f32-accum oracle to dot-order noise
        want = _oracle(x, q, s)
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_supported_shapes():
    assert int4_matmul_supported(1, 4096)
    assert int4_matmul_supported(M_MAX, 11008)
    assert not int4_matmul_supported(M_MAX + 1, 4096)   # prefill -> jnp
    assert not int4_matmul_supported(8, 4100)           # unpadded K
    assert not int4_matmul_supported(8, 4224)           # 128- not 256-mult


def test_quantize_weight_int4_error_bound():
    """Dequantized weight within one rounding step of the original:
    |w - deq| <= s/2 = groupmax/14 elementwise."""
    w = jax.random.normal(jax.random.PRNGKey(1), (300, 40)) * 0.1
    qd = quantize_weight_int4(w, 1)
    assert qd['q4'].shape == (256, 40)                  # Kp=512 padded
    assert qd['s4'].shape == (4, 40)
    deq = (np.asarray(unpack_int4_jnp(qd['q4']), np.float32)
           .reshape(4, 128, 40) * np.asarray(qd['s4'])[:, None])
    deq = deq.reshape(512, 40)[:300]
    bound = np.repeat(np.asarray(qd['s4']), 128, axis=0)[:300] / 2 + 1e-6
    assert (np.abs(np.asarray(w) - deq) <= bound).all()


def test_int4_dot_multi_axis_output_and_nc2():
    """wqkv-style (D, 3, H, Dh) output reshape and wo-style nc=2."""
    ks = jax.random.split(jax.random.PRNGKey(2), 3)
    D, H, Dh = 256, 4, 32
    wqkv = jax.random.normal(ks[0], (D, 3, H, Dh)) * 0.05
    x = jax.random.normal(ks[1], (2, 5, D), jnp.bfloat16)
    qd = quantize_weight_int4(wqkv, 1)
    y = int4_dot(x, qd, nc=1)
    assert y.shape == (2, 5, 3, H, Dh) and y.dtype == x.dtype
    ref = jnp.einsum('bld,dthe->blthe', x.astype(jnp.float32),
                     wqkv.astype(jnp.float32))
    # random-normal weights are int4's worst case (no outlier structure):
    # error ~ sqrt(K) * s/sqrt(12) -> ~10% relative at K=256
    err = float(jnp.mean(jnp.abs(y.astype(jnp.float32) - ref)))
    assert err < 0.15 * float(jnp.mean(jnp.abs(ref)))

    wo = jax.random.normal(ks[2], (H, Dh, D)) * 0.05
    qo = quantize_weight_int4(wo, 2)
    xo = jax.random.normal(ks[1], (2, 5, H, Dh), jnp.bfloat16)
    yo = int4_dot(xo, qo, nc=2)
    assert yo.shape == (2, 5, D)
    # VALUE check on the padded-contraction branch (K=H*Dh=128 -> Kp=256:
    # zero-pad rows interleave with real rows across the lo/hi byte
    # halves — a pairing regression here would corrupt every attention
    # out-projection under int4 while shape checks stay green)
    ref_o = jnp.einsum('blhe,hed->bld', xo.astype(jnp.float32),
                       wo.astype(jnp.float32))
    err_o = float(jnp.mean(jnp.abs(yo.astype(jnp.float32) - ref_o)))
    assert err_o < 0.15 * float(jnp.mean(jnp.abs(ref_o)))


def test_qdot_dispatches_int4():
    w = jax.random.normal(jax.random.PRNGKey(3), (256, 64)) * 0.1
    x = jax.random.normal(jax.random.PRNGKey(4), (3, 256), jnp.bfloat16)
    qd = quantize_weight_int4(w, 1)
    assert is_int4(qd)
    y = qdot(x, qd)
    ref = x.astype(jnp.float32) @ w.astype(jnp.float32)
    err = float(jnp.mean(jnp.abs(y.astype(jnp.float32) - ref)))
    assert err < 0.15 * float(jnp.mean(jnp.abs(ref)))


def _tiny_cfg():
    # dims are multiples of 256 so the int4 contraction padding
    # (pack_int4 pairs rows j and Kp/2+j) is exact and the bytes
    # comparison below is meaningful
    return config_for_model('evo-1-8k-base').replace(
        hidden_size=256, num_filters=256, num_layers=4,
        attn_layer_idxs=(1,), hyena_layer_idxs=(0, 2, 3),
        num_attention_heads=4, state_size=4, inner_mlp_size=512,
        use_pallas='never')


def test_model_int4_quantize_and_forward():
    """quantize_params(mode='int4') on the full param tree (incl. stacked
    hyena runs): bytes shrink ~2x vs int8, forward stays close to bf16."""
    cfg = _tiny_cfg()
    params = model_lib.init_params(jax.random.PRNGKey(0), cfg)
    b_full = quantized_bytes(params)
    p8 = quantize_params(params, mode='int8')
    p4 = quantize_params(params, mode='int4')
    b8, b4 = quantized_bytes(p8), quantized_bytes(p4)
    assert b4 < 0.7 * b8 < 0.7 * b_full
    ids = jnp.asarray(np.random.default_rng(0).integers(0, 256, (2, 64)),
                      jnp.int32)
    lg = np.asarray(model_lib.forward(params, cfg, ids))
    lg4 = np.asarray(model_lib.forward(p4, cfg, ids))
    # int4 is lossy by design (serving mode): bounded logit drift
    assert np.mean(np.abs(lg4 - lg)) < 0.15

    # machinery check: against the same weights explicitly dequantized,
    # the int4 path is just a different computation order -> tight match
    from evo_tpu.ops.pallas_int4 import unpack_int4_jnp

    # dequantize into the original shapes using the bf16 tree as template
    def deq2d(q4, s4):
        G, N = s4.shape[0], q4.shape[-1]
        return (unpack_int4_jnp(q4).astype(jnp.float32).reshape(G, 128, N)
                * s4.reshape(G, 1, N)).reshape(2 * q4.shape[0], N)

    def deq_like(orig_leaf, q_leaf):
        if not is_int4(q_leaf):
            return q_leaf
        q4, s4 = q_leaf['q4'], q_leaf['s4']
        if q4.ndim == 3:                                  # stacked run
            w = jax.vmap(lambda a, b: deq2d(a, b.reshape(b.shape[0], -1))
                         )(q4, s4)
            Korig = 1
            for d in orig_leaf.shape[1:orig_leaf.ndim - (s4.ndim - 2)]:
                Korig *= d
            w = w[:, :Korig]
        else:
            w = deq2d(q4, s4.reshape(s4.shape[0], -1))
            Korig = 1
            for d in orig_leaf.shape[:orig_leaf.ndim - (s4.ndim - 1)]:
                Korig *= d
            w = w[:Korig]
        return w.reshape(orig_leaf.shape).astype(orig_leaf.dtype)
    pdq = jax.tree_util.tree_map(
        deq_like, params, p4,
        is_leaf=lambda x: isinstance(x, dict) and 'q4' in x)
    lgd = np.asarray(model_lib.forward(pdq, cfg, ids))
    # residual: the int4 path applies scales in f32 after the dot, the
    # template path rounds dequantized weights to bf16 first
    np.testing.assert_allclose(lg4, lgd, rtol=2e-2, atol=5e-2)


def test_model_int4_prefill_decode_seam():
    """prefill + decode_step under int4 match the int4 full forward (the
    quantization must not break the FFT<->recurrence handoff)."""
    cfg = _tiny_cfg()
    params = quantize_params(
        model_lib.init_params(jax.random.PRNGKey(0), cfg), mode='int4')
    ids = jnp.asarray(np.random.default_rng(1).integers(0, 256, (1, 33)),
                      jnp.int32)
    full = np.asarray(model_lib.forward(params, cfg, ids))[:, -1]
    cache = model_lib.init_cache(cfg, 1, 64)
    _, cache = model_lib.prefill(params, cfg, ids[:, :32], cache)
    step, _ = model_lib.decode_step(params, cfg, ids[:, 32], cache)
    np.testing.assert_allclose(np.asarray(step), full, rtol=2e-2,
                               atol=2e-2)


def test_int4_requires_single_chip():
    from evo_tpu.models import Evo
    from evo_tpu.parallel.mesh import local_mesh
    mesh = local_mesh(dp=4, tp=2)
    with pytest.raises(ValueError, match='single-chip'):
        Evo('evo-1-8k-base', random_init=True, mesh=mesh,
            config_overrides=dict(
                hidden_size=128, num_filters=128, num_layers=2,
                attn_layer_idxs=(1,), hyena_layer_idxs=(0,),
                num_attention_heads=4, state_size=4, inner_mlp_size=256,
                weight_quant='int4', use_pallas='never'))


def test_quantize_params_rejects_mode_switch():
    """An already-int8 tree passed with mode='int4' must raise (silent
    no-op would serve 2x the requested bytes)."""
    cfg = _tiny_cfg()
    params = model_lib.init_params(jax.random.PRNGKey(0), cfg)
    p8 = quantize_params(params, mode='int8')
    with pytest.raises(ValueError, match='different mode'):
        quantize_params(p8, mode='int4')
    # same-mode re-quantization stays idempotent
    again = quantize_params(p8, mode='int8')
    assert jax.tree_util.tree_structure(again) \
        == jax.tree_util.tree_structure(p8)
