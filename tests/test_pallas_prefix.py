"""Oracle tests for the VMEM modal-prefix kernel (ops/pallas_prefix.py)
against the jnp Hillis-Steele loop inside conv_matmul_chunked, plus the
end-to-end conv equivalence with the flag on vs off."""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from evo_tpu.ops import fftconv
from evo_tpu.ops.pallas_prefix import (modal_prefix_pallas,
                                       modal_prefix_supported)

pallas_prefix_i = functools.partial(modal_prefix_pallas, interpret=True)


def _mk(B, D, K, S, seed=0):
    ks = jax.random.split(jax.random.PRNGKey(seed), 4)
    inj_r = jax.random.normal(ks[0], (B, D, K, S), jnp.float32)
    inj_i = jax.random.normal(ks[1], (B, D, K, S), jnp.float32)
    mag = jax.random.uniform(ks[2], (D, S), minval=0.5, maxval=0.98)
    ang = jax.random.uniform(ks[3], (D, S), minval=-3.1, maxval=3.1)
    logmag, theta = jnp.log(mag), ang
    return inj_r, inj_i, logmag, theta


def _oracle(inj_r, inj_i, logmag, theta, C):
    B, D, K, S = inj_r.shape
    sr, si = inj_r, inj_i
    step = 1
    while step < K:
        ar, ai = fftconv._pole_pow_tables(logmag, theta, [C * step])
        ar = ar[None, :, :, 0][:, :, None, :]
        ai = ai[None, :, :, 0][:, :, None, :]
        z = jnp.zeros((B, D, step, S), jnp.float32)
        sr_sh = jnp.concatenate([z, sr[:, :, :-step]], axis=2)
        si_sh = jnp.concatenate([z, si[:, :, :-step]], axis=2)
        sr, si = sr + ar * sr_sh - ai * si_sh, \
            si + ar * si_sh + ai * sr_sh
        step *= 2
    z1 = jnp.zeros((B, D, 1, S), jnp.float32)
    br = jnp.concatenate([z1, sr[:, :, :-1]], axis=2)
    bi = jnp.concatenate([z1, si[:, :, :-1]], axis=2)
    return br, bi, sr[:, :, -1], si[:, :, -1]


@pytest.mark.parametrize('B,D,K,S,C', [
    (1, 64, 128, 8, 64),     # production-blocked shape (scaled channels)
    (2, 32, 16, 4, 32),      # small, multi-batch
    (1, 16, 48, 8, 64),      # non-power-of-two K
    (1, 8, 2, 2, 128),       # minimal K
])
def test_prefix_matches_oracle(B, D, K, S, C):
    inj_r, inj_i, logmag, theta = _mk(B, D, K, S, seed=K)
    assert modal_prefix_supported((B, D, K, S))
    got = pallas_prefix_i(inj_r, inj_i, logmag, theta, C)
    want = _oracle(inj_r, inj_i, logmag, theta, C)
    for g, w in zip(got, want):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w),
                                   rtol=2e-5, atol=2e-5)


def test_conv_flag_equivalence(monkeypatch):
    """conv_matmul_chunked(pallas_prefix=True) == (False) end-to-end."""
    import evo_tpu.ops.pallas_prefix as pp
    monkeypatch.setattr(pp, 'modal_prefix_pallas', pallas_prefix_i)
    ks = jax.random.split(jax.random.PRNGKey(3), 4)
    B, D, L, S, chunk = 2, 24, 512, 8, 64
    u = jax.random.normal(ks[0], (B, D, L), jnp.float32)
    mag = jax.random.uniform(ks[1], (D, S), minval=0.5, maxval=0.98)
    ang = jax.random.uniform(ks[2], (D, S), minval=-3.1, maxval=3.1)
    poles = jnp.stack([mag * jnp.cos(ang), mag * jnp.sin(ang)], -1)
    residues = jax.random.normal(ks[3], (D, S, 2)) * 0.3
    d_skip = jax.random.normal(ks[1], (D,))
    y0, iir0 = fftconv.conv_matmul_chunked(u, poles, residues, chunk,
                                           d_skip=d_skip)
    y1, iir1 = fftconv.conv_matmul_chunked(u, poles, residues, chunk,
                                           d_skip=d_skip,
                                           pallas_prefix=True)
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y0),
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(iir1), np.asarray(iir0),
                               rtol=2e-4, atol=2e-4)


def test_unsupported_shapes_fall_back():
    assert not modal_prefix_supported((1, 64, 1, 8))      # K < 2
    assert not modal_prefix_supported((1, 7, 16, 8))      # no channel block
