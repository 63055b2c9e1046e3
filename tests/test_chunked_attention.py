"""Chunked (flash-style, pure-lax) causal attention: the long-context
core used wherever the Pallas kernel is unavailable — CPU runs and the
local body of Ulysses context parallelism at 131k. Oracle: the dense
f32-softmax `sdpa_causal`."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.smoke

import evo_tpu.layers.attention as attn
from evo_tpu.layers.attention import chunked_sdpa_causal, sdpa_causal


def _qkv(L, B=1, H=4, Dh=32, dtype=jnp.float32, seed=0):
    ks = jax.random.split(jax.random.PRNGKey(seed), 3)
    return tuple(jax.random.normal(k, (B, L, H, Dh), jnp.float32)
                 .astype(dtype) for k in ks)


@pytest.mark.parametrize('L,block', [(256, 128), (300, 128), (512, 512),
                                     (777, 256), (1024, 512)])
def test_matches_dense(L, block):
    q, k, v = _qkv(L)
    got = chunked_sdpa_causal(q, k, v, block=block)
    want = sdpa_causal(q, k, v)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5)


def test_matches_dense_bf16():
    q, k, v = _qkv(600, dtype=jnp.bfloat16)
    got = chunked_sdpa_causal(q, k, v, block=256).astype(jnp.float32)
    want = sdpa_causal(q, k, v).astype(jnp.float32)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=3e-2)


def test_batched_and_jit():
    q, k, v = _qkv(384, B=3, H=2, seed=7)
    got = jax.jit(lambda a, b, c: chunked_sdpa_causal(a, b, c, block=128))(
        q, k, v)
    want = sdpa_causal(q, k, v)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5)


def test_dense_dispatch_threshold(monkeypatch):
    """sdpa_causal auto-routes to the chunked core above _DENSE_ATTN_MAX
    (the dense L^2 scores are infeasible at long context)."""
    calls = []
    orig = attn.chunked_sdpa_causal

    def spy(q, k, v, **kw):
        calls.append(q.shape)
        return orig(q, k, v, **kw)

    monkeypatch.setattr(attn, 'chunked_sdpa_causal', spy)
    q, k, v = _qkv(64, seed=3)
    _ = sdpa_causal(q, k, v)
    assert not calls, 'small L must stay on the dense path'
    monkeypatch.setattr(attn, '_DENSE_ATTN_MAX', 128)
    q, k, v = _qkv(256, seed=4)
    got = sdpa_causal(q, k, v)
    assert calls, 'L above the threshold must dispatch to chunked'
    monkeypatch.setattr(attn, '_DENSE_ATTN_MAX', 2048)
    want = sdpa_causal(q, k, v)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5)


def test_grad_flows():
    """Training uses the same dispatch; the chunked core must be
    differentiable (lax.scan + lax.cond linearize)."""
    q, k, v = _qkv(256, H=2, Dh=16, seed=9)

    def loss(q, k, v):
        return jnp.sum(chunked_sdpa_causal(q, k, v, block=128) ** 2)

    g_got = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)

    def loss_dense(q, k, v):
        return jnp.sum(sdpa_causal(q, k, v) ** 2)

    g_want = jax.grad(loss_dense, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g_got, g_want):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)
