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
