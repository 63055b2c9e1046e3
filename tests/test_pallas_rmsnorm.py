"""Pallas fused RMSNorm vs the jnp oracle (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from evo_tpu.layers.norms import rmsnorm
from evo_tpu.ops.pallas_rmsnorm import rmsnorm_pallas


@pytest.mark.parametrize('shape', [(4, 128), (2, 9, 256), (300, 128)])
def test_matches_oracle(shape):
    ks = jax.random.split(jax.random.PRNGKey(0), 2)
    x = jax.random.normal(ks[0], shape, jnp.float32)
    w = jax.random.normal(ks[1], (shape[-1],), jnp.float32)
    want = rmsnorm(x, w, eps=1e-6)
    got = rmsnorm_pallas(x, w, eps=1e-6, block_rows=64, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_bf16_dtype_preserved():
    x = jax.random.normal(jax.random.PRNGKey(1), (16, 128), jnp.bfloat16)
    w = jnp.ones((128,), jnp.bfloat16)
    got = rmsnorm_pallas(x, w, interpret=True)
    assert got.dtype == jnp.bfloat16
    want = rmsnorm(x, w)
    np.testing.assert_allclose(
        np.asarray(got.astype(jnp.float32)),
        np.asarray(want.astype(jnp.float32)), rtol=2e-2, atol=2e-2)
