"""Ring attention: causal self-attention with the sequence axis sharded
across devices (context parallelism for 131k prefill, SURVEY.md §5).

Each device owns one block of queries/keys/values along L. K/V blocks
rotate around the ring with `ppermute` while every device accumulates its
queries' attention over the passing blocks with flash-style online softmax
(fp32 running max / denominator / accumulator). Causality at block level:
a K/V block strictly in the future of the local query block contributes
nothing; the diagonal block is masked elementwise.

Only 3 of 32 StripedHyena layers are attention, so the ring's R-step
latency is cheap overall; the Hyena layers need no sequence-axis
communication at all under channel sharding (see parallel/sharding.py).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

_NEG = -1e30


def _local_ring_attention(q, k, v, *, axis_name: str, ring_size: int):
    """Per-shard body. q, k, v: (B, Lb, H, Dh) local blocks."""
    B, Lb, H, Dh = q.shape
    r = jax.lax.axis_index(axis_name)
    scale = 1.0 / (Dh ** 0.5)
    q32 = q.astype(jnp.float32)

    m = jnp.full((B, H, Lb), -jnp.inf, jnp.float32)
    l = jnp.zeros((B, H, Lb), jnp.float32)
    acc = jnp.zeros((B, H, Lb, Dh), jnp.float32)

    local_pos = jax.lax.broadcasted_iota(jnp.int32, (Lb, Lb), 0)
    block_col = jax.lax.broadcasted_iota(jnp.int32, (Lb, Lb), 1)

    k_cur, v_cur = k, v
    perm = [(i, (i + 1) % ring_size) for i in range(ring_size)]
    for t in range(ring_size):
        j = (r - t) % ring_size                       # owner of k_cur
        s = jnp.einsum('blhd,bmhd->bhlm', q32,
                       k_cur.astype(jnp.float32),
                       preferred_element_type=jnp.float32) * scale
        # block-level causality: j > r -> fully masked; j == r -> causal
        diag_mask = block_col <= local_pos            # (Lb, Lb)
        allowed = jnp.where(
            j < r, jnp.ones((Lb, Lb), bool),
            jnp.where(j == r, diag_mask, jnp.zeros((Lb, Lb), bool)))
        s = jnp.where(allowed[None, None], s, _NEG)

        m_new = jnp.maximum(m, jnp.max(s, axis=-1))
        p = jnp.exp(s - m_new[..., None])
        alpha = jnp.exp(m - m_new)
        l = l * alpha + jnp.sum(p, axis=-1)
        acc = acc * alpha[..., None] + jnp.einsum(
            'bhlm,bmhd->bhld', p, v_cur.astype(jnp.float32),
            preferred_element_type=jnp.float32)
        m = m_new
        if t + 1 < ring_size:
            k_cur = jax.lax.ppermute(k_cur, axis_name, perm)
            v_cur = jax.lax.ppermute(v_cur, axis_name, perm)

    out = acc / jnp.maximum(l[..., None], 1e-30)
    return jnp.swapaxes(out, 1, 2).astype(q.dtype)    # (B, Lb, H, Dh)


def ring_attention(q, k, v, mesh: Mesh, axis_name: str = 'tp',
                   batch_axis: Optional[str] = 'dp'):
    """Causal SDPA with L sharded over `axis_name` of `mesh`.

    q, k, v: (B, L, H, Dh); L must divide evenly by the ring size. The
    result matches `sdpa_causal` (tests/test_ring_attention.py).
    """
    ring_size = mesh.shape[axis_name]
    if q.shape[1] % ring_size:
        raise ValueError(
            f'sequence length {q.shape[1]} not divisible by ring size '
            f'{ring_size}')
    spec = P(batch_axis, axis_name, None, None)
    body = functools.partial(_local_ring_attention, axis_name=axis_name,
                             ring_size=ring_size)
    return jax.shard_map(body, mesh=mesh, in_specs=(spec, spec, spec),
                         out_specs=spec, check_vma=False)(q, k, v)
