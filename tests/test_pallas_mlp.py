"""Pallas fused dual-matmul gate kernel vs the jnp oracle (interpret
mode on CPU). The adoption decision is made on-chip at model level
(BASELINE.md ledger); these pin correctness across ragged shapes,
activations, and dtypes."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from evo_tpu.ops.pallas_mlp import fused_gate_pallas


def _oracle(x, w1, w2, act='gelu'):
    acts = {'gelu': lambda z: jax.nn.gelu(z, approximate=False),
            'silu': jax.nn.silu}
    z1 = (x @ w1).astype(jnp.float32)
    z2 = (x @ w2).astype(jnp.float32)
    return (acts[act](z1) * z2).astype(x.dtype)


@pytest.mark.parametrize('M,D,I', [(64, 128, 176), (300, 256, 336),
                                   (128, 384, 128)])
def test_matches_oracle_ragged_shapes(M, D, I):
    ks = jax.random.split(jax.random.PRNGKey(0), 3)
    x = jax.random.normal(ks[0], (M, D), jnp.float32)
    w1 = jax.random.normal(ks[1], (D, I), jnp.float32) * 0.05
    w2 = jax.random.normal(ks[2], (D, I), jnp.float32) * 0.05
    want = _oracle(x, w1, w2)
    got = fused_gate_pallas(x, w1, w2, bm=128, bn=128, bk=128,
                            interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_batched_leading_dims_and_silu():
    ks = jax.random.split(jax.random.PRNGKey(1), 3)
    x = jax.random.normal(ks[0], (2, 40, 128), jnp.float32)
    w1 = jax.random.normal(ks[1], (128, 144), jnp.float32) * 0.05
    w2 = jax.random.normal(ks[2], (128, 144), jnp.float32) * 0.05
    want = _oracle(x.reshape(80, 128), w1, w2, act='silu').reshape(
        2, 40, 144)
    got = fused_gate_pallas(x, w1, w2, activation='silu', bm=64, bn=128,
                            bk=128, interpret=True)
    assert got.shape == (2, 40, 144)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_bf16_fp32_accumulation():
    # bf16 inputs must accumulate in f32 (preferred_element_type): with a
    # K-dim of 512 a bf16-accumulated sum would be visibly wrong
    ks = jax.random.split(jax.random.PRNGKey(2), 3)
    x = jax.random.normal(ks[0], (32, 512), jnp.bfloat16)
    w1 = (jax.random.normal(ks[1], (512, 128)) * 0.05).astype(jnp.bfloat16)
    w2 = (jax.random.normal(ks[2], (512, 128)) * 0.05).astype(jnp.bfloat16)
    got = fused_gate_pallas(x, w1, w2, bm=32, bn=128, bk=128,
                            interpret=True)
    assert got.dtype == jnp.bfloat16
    want = _oracle(x.astype(jnp.float32), w1.astype(jnp.float32),
                   w2.astype(jnp.float32))
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(want, np.float32),
                               rtol=3e-2, atol=3e-2)
