"""Ring attention vs the naive causal SDPA oracle on the 8-virtual-device
CPU mesh (context-parallel correctness, SURVEY.md §4 prescription #4)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from evo_tpu.layers.attention import sdpa_causal
from evo_tpu.ops.ring_attention import ring_attention
from evo_tpu.parallel.mesh import make_mesh


@pytest.mark.parametrize('dp,tp,B,L', [(1, 8, 2, 64), (2, 4, 2, 64),
                                       (1, 4, 1, 128)])
def test_ring_matches_naive(dp, tp, B, L):
    mesh = make_mesh(dp=dp, tp=tp, devices=jax.devices()[:dp * tp])
    H, Dh = 4, 16
    ks = jax.random.split(jax.random.PRNGKey(0), 3)
    q = jax.random.normal(ks[0], (B, L, H, Dh), jnp.float32)
    k = jax.random.normal(ks[1], (B, L, H, Dh), jnp.float32)
    v = jax.random.normal(ks[2], (B, L, H, Dh), jnp.float32)
    want = sdpa_causal(q, k, v)
    got = ring_attention(q, k, v, mesh, axis_name='tp', batch_axis='dp')
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_ring_rejects_ragged_length():
    mesh = make_mesh(dp=1, tp=8)
    x = jnp.zeros((1, 60, 2, 8))
    with pytest.raises(ValueError, match='not divisible'):
        ring_attention(x, x, x, mesh)


def test_ring_under_jit():
    mesh = make_mesh(dp=1, tp=8)
    ks = jax.random.split(jax.random.PRNGKey(1), 3)
    q = jax.random.normal(ks[0], (1, 64, 2, 16), jnp.float32)
    k = jax.random.normal(ks[1], (1, 64, 2, 16), jnp.float32)
    v = jax.random.normal(ks[2], (1, 64, 2, 16), jnp.float32)
    fn = jax.jit(lambda a, b, c: ring_attention(a, b, c, mesh))
    np.testing.assert_allclose(np.asarray(fn(q, k, v)),
                               np.asarray(sdpa_causal(q, k, v)),
                               rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize('dp,tp,B,L,H', [(1, 8, 2, 64, 8), (2, 4, 2, 64, 4)])
def test_ulysses_matches_naive(dp, tp, B, L, H):
    from evo_tpu.ops.ulysses_attention import ulysses_attention
    mesh = make_mesh(dp=dp, tp=tp, devices=jax.devices()[:dp * tp])
    Dh = 16
    ks = jax.random.split(jax.random.PRNGKey(2), 3)
    q = jax.random.normal(ks[0], (B, L, H, Dh), jnp.float32)
    k = jax.random.normal(ks[1], (B, L, H, Dh), jnp.float32)
    v = jax.random.normal(ks[2], (B, L, H, Dh), jnp.float32)
    want = sdpa_causal(q, k, v)
    got = ulysses_attention(q, k, v, mesh, axis_name='tp',
                            batch_axis='dp')
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_ulysses_rejects_indivisible_heads():
    from evo_tpu.ops.ulysses_attention import ulysses_attention
    mesh = make_mesh(dp=1, tp=8)
    x = jnp.zeros((1, 64, 6, 8))                 # 6 heads, ring 8
    with pytest.raises(ValueError, match='divisible'):
        ulysses_attention(x, x, x, mesh)


@pytest.mark.parametrize('dp,cp,tp,B,L', [(1, 8, 1, 2, 64), (2, 4, 1, 2, 64),
                                          (2, 2, 2, 2, 128), (1, 1, 1, 1, 32)])
def test_zigzag_matches_naive(dp, cp, tp, B, L):
    """Balanced zigzag ring == naive causal SDPA, incl. composed with a tp
    head shard and the degenerate 1-device ring."""
    from evo_tpu.ops.ring_attention import zigzag_ring_attention
    mesh = make_mesh(dp=dp, cp=cp, tp=tp, devices=jax.devices()[:dp * cp * tp])
    H, Dh = 4, 16
    ks = jax.random.split(jax.random.PRNGKey(3), 3)
    q = jax.random.normal(ks[0], (B, L, H, Dh), jnp.float32)
    k = jax.random.normal(ks[1], (B, L, H, Dh), jnp.float32)
    v = jax.random.normal(ks[2], (B, L, H, Dh), jnp.float32)
    want = sdpa_causal(q, k, v)
    got = zigzag_ring_attention(q, k, v, mesh, axis_name='cp',
                                batch_axis='dp', head_axis='tp')
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_zigzag_under_jit_and_rejects_ragged():
    from evo_tpu.ops.ring_attention import zigzag_ring_attention
    mesh = make_mesh(dp=1, cp=8, tp=1)
    ks = jax.random.split(jax.random.PRNGKey(4), 3)
    q = jax.random.normal(ks[0], (1, 128, 2, 16), jnp.float32)
    k = jax.random.normal(ks[1], (1, 128, 2, 16), jnp.float32)
    v = jax.random.normal(ks[2], (1, 128, 2, 16), jnp.float32)
    fn = jax.jit(lambda a, b, c: zigzag_ring_attention(
        a, b, c, mesh, axis_name='cp'))
    np.testing.assert_allclose(np.asarray(fn(q, k, v)),
                               np.asarray(sdpa_causal(q, k, v)),
                               rtol=2e-5, atol=2e-5)
    with pytest.raises(ValueError, match='divisible'):
        zigzag_ring_attention(q[:, :120], k[:, :120], v[:, :120], mesh,
                              axis_name='cp')


def test_zigzag_indices_roundtrip():
    from evo_tpu.ops.ring_attention import zigzag_indices
    perm, inv = zigzag_indices(64, 4)
    assert sorted(perm) == list(range(64))
    np.testing.assert_array_equal(np.asarray(perm)[np.asarray(inv)],
                                  np.arange(64))
    # device 1's shard (positions 16:32 of zigzag order) = chunks 1 and 6
    np.testing.assert_array_equal(perm[16:32],
                                  np.r_[np.arange(8, 16), np.arange(48, 56)])
