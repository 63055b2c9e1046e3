"""Fused FIR+gate Pallas kernel vs the jnp composition oracle
(interpret mode on CPU; the real TPU lowering runs in bench/production)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from evo_tpu.ops import fftconv
from evo_tpu.ops.pallas_fir import fir_gate_pallas


@pytest.mark.parametrize('B,C,L,bias', [(2, 8, 32, True), (1, 16, 64, False)])
def test_fir_gate_matches_oracle(B, C, L, bias):
    K = 3
    ks = jax.random.split(jax.random.PRNGKey(0), 3)
    z = jax.random.normal(ks[0], (B, 3, C, L), jnp.float32)
    w = jax.random.normal(ks[1], (3, C, K), jnp.float32)
    b = jax.random.normal(ks[2], (3, C), jnp.float32) if bias else None

    zp, _ = fftconv.fir_causal_conv(z, w, b)
    x2_want, x1, v = zp[:, 0], zp[:, 1], zp[:, 2]
    u_want = x1 * v

    x2, u = fir_gate_pallas(z, w, b, block_channels=8, interpret=True)
    np.testing.assert_allclose(np.asarray(x2), np.asarray(x2_want),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(u), np.asarray(u_want),
                               rtol=1e-5, atol=1e-5)


def test_fir_gate_under_jit():
    B, C, L = 1, 8, 16
    z = jax.random.normal(jax.random.PRNGKey(1), (B, 3, C, L), jnp.float32)
    w = jax.random.normal(jax.random.PRNGKey(2), (3, C, 3), jnp.float32)
    fn = jax.jit(lambda z: fir_gate_pallas(z, w, None, block_channels=8,
                                           interpret=True))
    x2, u = fn(z)
    assert x2.shape == (B, C, L) and u.shape == (B, C, L)


def test_fir_gate_sharded_specs():
    """The shard_map composition used by hyena_full under a mesh (channel
    axis on tp) matches the unsharded kernel (interpret mode on the CPU
    mesh)."""
    from jax.sharding import PartitionSpec as P
    from evo_tpu.parallel.mesh import make_mesh
    B, C, L = 2, 16, 32
    mesh = make_mesh(dp=2, tp=4)
    z = jax.random.normal(jax.random.PRNGKey(3), (B, 3, C, L), jnp.float32)
    w = jax.random.normal(jax.random.PRNGKey(4), (3, C, 3), jnp.float32)
    b = jax.random.normal(jax.random.PRNGKey(5), (3, C), jnp.float32)
    want = fir_gate_pallas(z, w, b, interpret=True)
    got = jax.shard_map(
        lambda zz, ww, bb: fir_gate_pallas(zz, ww, bb, interpret=True),
        mesh=mesh,
        in_specs=(P('dp', None, 'tp', None), P(None, 'tp', None),
                  P(None, 'tp')),
        out_specs=(P('dp', 'tp', None), P('dp', 'tp', None)),
        check_vma=False)(z, w, b)
    for g, wnt in zip(got, want):
        np.testing.assert_allclose(np.asarray(g), np.asarray(wnt),
                                   rtol=1e-5, atol=1e-5)
