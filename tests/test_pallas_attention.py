"""Pallas flash-attention kernel vs the naive SDPA oracle (SURVEY.md §4
prescription #1). Runs in interpreter mode on the CPU backend; the same
code path compiles with Mosaic on TPU."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from evo_tpu.layers.attention import sdpa_causal
from evo_tpu.ops.pallas_attention import flash_attention_causal


@pytest.mark.parametrize('L,bq,bk', [(256, 128, 128), (192, 128, 128),
                                     (128, 128, 128),
                                     # tall q blocks (production default
                                     # shape) and non-multiple L — the
                                     # configurations behind the causal
                                     # block-skip and padding bugs
                                     (512, 256, 128), (512, 128, 256),
                                     (1000, 512, 128), (384, 256, 128)])
def test_flash_matches_naive(L, bq, bk):
    B, H, Dh = 1, 2, 128
    ks = jax.random.split(jax.random.PRNGKey(0), 3)
    q = jax.random.normal(ks[0], (B, L, H, Dh), jnp.float32)
    k = jax.random.normal(ks[1], (B, L, H, Dh), jnp.float32)
    v = jax.random.normal(ks[2], (B, L, H, Dh), jnp.float32)
    want = sdpa_causal(q, k, v)
    got = flash_attention_causal(q, k, v, block_q=bq, block_k=bk,
                                 interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-3, atol=2e-3)


def test_flash_bf16():
    B, L, H, Dh = 1, 128, 2, 128
    ks = jax.random.split(jax.random.PRNGKey(1), 3)
    q = jax.random.normal(ks[0], (B, L, H, Dh), jnp.bfloat16)
    k = jax.random.normal(ks[1], (B, L, H, Dh), jnp.bfloat16)
    v = jax.random.normal(ks[2], (B, L, H, Dh), jnp.bfloat16)
    want = sdpa_causal(q, k, v)
    got = flash_attention_causal(q, k, v, block_q=128, block_k=128,
                                 interpret=True)
    assert got.dtype == jnp.bfloat16
    np.testing.assert_allclose(
        np.asarray(got.astype(jnp.float32)),
        np.asarray(want.astype(jnp.float32)), rtol=3e-2, atol=3e-2)


def _buffer_oracle(q, k_buf, v_buf, offset):
    """Dense reference for segment-vs-buffer attention: query row r is
    absolute position offset + r; mask col <= offset + row."""
    B, Lq, H, Dh = q.shape
    T = k_buf.shape[1]
    s = jnp.einsum('blhd,bthd->bhlt', q.astype(jnp.float32),
                   k_buf.astype(jnp.float32)) / (Dh ** 0.5)
    row = jnp.arange(Lq)[:, None]
    col = jnp.arange(T)[None, :]
    s = jnp.where((col <= offset + row)[None, None], s, -jnp.inf)
    a = jax.nn.softmax(s, axis=-1)
    y = jnp.einsum('bhlt,bthd->blhd', a, v_buf.astype(jnp.float32))
    return y.astype(q.dtype)


@pytest.mark.parametrize('Lq,T,offset', [
    (128, 1024, 0),      # fresh prefill into an aligned buffer
    (128, 1024, 128),    # resumed: one prior segment
    (128, 1024, 731),    # unaligned offset
    (100, 1024, 512),    # Lq not a block multiple (padded q rows)
    (256, 2048, 1792),   # segment fills the buffer to the brim
])
def test_flash_buffer_matches_dense(Lq, T, offset):
    from evo_tpu.ops.pallas_attention import (flash_attention_buffer,
                                              flash_buffer_supported)
    assert flash_buffer_supported(T)
    B, H, Dh = 1, 2, 128
    ks = jax.random.split(jax.random.PRNGKey(offset + Lq), 3)
    q = jax.random.normal(ks[0], (B, Lq, H, Dh), jnp.float32)
    # buffer contents: positions [0, offset+Lq) real, tail is garbage the
    # mask must ignore
    k_buf = jax.random.normal(ks[1], (B, T, H, Dh), jnp.float32) * 10
    v_buf = jax.random.normal(ks[2], (B, T, H, Dh), jnp.float32) * 10
    want = _buffer_oracle(q, k_buf, v_buf, offset)
    got = flash_attention_buffer(q, k_buf, v_buf, offset, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-3, atol=2e-3)


def test_flash_buffer_traced_offset():
    """offset arrives as a traced scalar under jit (the production path:
    cache['offset'] inside the prefill program)."""
    from evo_tpu.ops.pallas_attention import flash_attention_buffer
    B, Lq, T, H, Dh = 1, 64, 1024, 2, 128
    ks = jax.random.split(jax.random.PRNGKey(9), 3)
    q = jax.random.normal(ks[0], (B, Lq, H, Dh), jnp.float32)
    k_buf = jax.random.normal(ks[1], (B, T, H, Dh), jnp.float32)
    v_buf = jax.random.normal(ks[2], (B, T, H, Dh), jnp.float32)
    fn = jax.jit(lambda off: flash_attention_buffer(
        q, k_buf, v_buf, off, interpret=True))
    for off in (0, 64, 300):
        want = _buffer_oracle(q, k_buf, v_buf, off)
        np.testing.assert_allclose(np.asarray(fn(jnp.int32(off))),
                                   np.asarray(want), rtol=2e-3, atol=2e-3)


def test_buffer_flash_layer_integration(monkeypatch):
    """mha_full(attend_buffer=True, use_pallas=True) routes through the
    buffer-flash kernel and matches the jnp online-softmax fallback —
    catches (B, H) plumbing mistakes that would otherwise surface only
    on TPU."""
    import evo_tpu.ops.pallas_attention as pa
    from evo_tpu.layers.attention import mha_full
    from evo_tpu.models import config_for_model

    orig = pa.flash_attention_buffer
    monkeypatch.setattr(
        pa, 'flash_attention_buffer',
        lambda *a, **kw: orig(*a, interpret=True, **kw))

    cfg = config_for_model('evo-1-8k-base').replace(
        hidden_size=256, num_filters=256, num_layers=2,
        attn_layer_idxs=(0,), hyena_layer_idxs=(1,),
        num_attention_heads=2, state_size=4, inner_mlp_size=512,
        compute_dtype='float32', param_dtype='float32')
    ks = jax.random.split(jax.random.PRNGKey(3), 4)
    D, H, Dh = 256, 2, 128
    p = {'wqkv': jax.random.normal(ks[0], (D, 3, H, Dh)) * 0.05,
         'bqkv': jax.random.normal(ks[1], (3, H, Dh)) * 0.01,
         'wo': jax.random.normal(ks[2], (H, Dh, D)) * 0.05,
         'bo': jnp.zeros((D,))}
    x = jax.random.normal(ks[3], (1, 64, D), jnp.float32)
    T, offset = 1024, 192
    k_buf = jnp.zeros((1, T, H, Dh), jnp.float32)
    v_buf = jnp.zeros((1, T, H, Dh), jnp.float32)
    want, kv_w = mha_full(p, cfg, x, offset=offset,
                          kv_buffers=(k_buf, v_buf), use_pallas=False,
                          attend_buffer=True)
    got, kv_g = mha_full(p, cfg, x, offset=offset,
                         kv_buffers=(k_buf, v_buf), use_pallas=True,
                         attend_buffer=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-3, atol=2e-3)
    np.testing.assert_allclose(np.asarray(kv_g[0]), np.asarray(kv_w[0]))


def test_buffer_flash_sharded(monkeypatch):
    """The (dp, tp) shard_map route around the buffer kernel: per-shard
    results must equal the unsharded kernel (heads split on tp, batch on
    dp, replicated offset)."""
    import evo_tpu.ops.pallas_attention as pa
    from evo_tpu.layers.attention import mha_full
    from evo_tpu.models import config_for_model
    from evo_tpu.parallel.mesh import local_mesh

    orig = pa.flash_attention_buffer
    monkeypatch.setattr(
        pa, 'flash_attention_buffer',
        lambda *a, **kw: orig(*a, interpret=True, **kw))

    cfg = config_for_model('evo-1-8k-base').replace(
        hidden_size=512, num_filters=512, num_layers=2,
        attn_layer_idxs=(0,), hyena_layer_idxs=(1,),
        num_attention_heads=4, state_size=4, inner_mlp_size=1024,
        compute_dtype='float32', param_dtype='float32')
    ks = jax.random.split(jax.random.PRNGKey(5), 4)
    D, H, Dh = 512, 4, 128
    p = {'wqkv': jax.random.normal(ks[0], (D, 3, H, Dh)) * 0.05,
         'bqkv': jax.random.normal(ks[1], (3, H, Dh)) * 0.01,
         'wo': jax.random.normal(ks[2], (H, Dh, D)) * 0.05,
         'bo': jnp.zeros((D,))}
    x = jax.random.normal(ks[3], (2, 64, D), jnp.float32)
    T, offset = 1024, 100
    k_buf = jnp.zeros((2, T, H, Dh), jnp.float32)
    v_buf = jnp.zeros((2, T, H, Dh), jnp.float32)
    mesh = local_mesh(dp=2, tp=4)
    want, _ = mha_full(p, cfg, x, offset=offset,
                       kv_buffers=(k_buf, v_buf), use_pallas=True,
                       attend_buffer=True)
    got, _ = mha_full(p, cfg, x, offset=offset, mesh=mesh,
                      kv_buffers=(k_buf, v_buf), use_pallas=True,
                      attend_buffer=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-3, atol=2e-3)
