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
                   batch_axis: Optional[str] = 'dp',
                   head_axis: Optional[str] = None,
                   use_pallas: bool = False):
    """Causal SDPA with L sharded over `axis_name` of `mesh`.

    q, k, v: (B, L, H, Dh); L must divide evenly by the ring size. The
    result matches `sdpa_causal` (tests/test_ring_attention.py).
    `head_axis` additionally shards H (tensor parallelism composing with
    the ring). `use_pallas` is accepted for dispatch-signature uniformity;
    the ring body uses the dense fp32 core (per-step blocks are small).
    """
    ring_size = mesh.shape[axis_name]
    if q.shape[1] % ring_size:
        raise ValueError(
            f'sequence length {q.shape[1]} not divisible by ring size '
            f'{ring_size}')
    spec = P(batch_axis, axis_name, head_axis, None)
    body = functools.partial(_local_ring_attention, axis_name=axis_name,
                             ring_size=ring_size)
    return jax.shard_map(body, mesh=mesh, in_specs=(spec, spec, spec),
                         out_specs=spec, check_vma=False)(q, k, v)


# ---------------------------------------------------------------------------
# Zigzag (balanced-causal) ring attention
# ---------------------------------------------------------------------------
#
# With contiguous block assignment every device computes all R ring steps
# against full KV blocks even when the block is entirely in its queries'
# future — total compute equals *bidirectional* attention, 2x the causal
# optimum, and the useful work is skewed toward high-rank devices
# (STATUS.md round-1 gap #6). The zigzag assignment splits the sequence
# into 2R chunks and gives device r the pair (r, 2R-1-r): early and late
# chunks pair up, so every device's causal workload is identical, and per
# ring step exactly two quarter-blocks are live:
#
#   incoming KV pair (j, 2R-1-j) vs local queries (r, 2R-1-r), j != r:
#     k-chunk j        -> q-chunk 2R-1-r : always unmasked (j < 2R-1-r)
#     k-chunk j        -> q-chunk r      : unmasked iff j < r
#     k-chunk 2R-1-j   -> q-chunk 2R-1-r : unmasked iff j > r
#     k-chunk 2R-1-j   -> q-chunk r      : never (2R-1-j > R-1 >= r)
#
# The middle two are mutually exclusive on sign(j - r), so each step runs
# the always-on quarter plus ONE selected quarter (jnp.where on the chunk
# inputs keeps shapes static under SPMD) — R steps x 2 quarters ~= the
# causal-optimal L^2/2, balanced across devices by construction.


def zigzag_indices(L: int, ring_size: int):
    """(perm, inv): contiguous -> zigzag sequence order and its inverse.

    Zigzag order concatenates, for each device r, chunks r and 2R-1-r of
    the 2R-chunk split, so a contiguous shard over the ring axis lands
    exactly the zigzag pair on each device."""
    import numpy as np

    Lc = L // (2 * ring_size)
    order = []
    for r in range(ring_size):
        order += [r, 2 * ring_size - 1 - r]
    perm = np.concatenate(
        [np.arange(c * Lc, (c + 1) * Lc) for c in order])
    inv = np.argsort(perm)
    return perm, inv


def _online_update(m, l, acc, s, v_blk):
    """Flash-style online-softmax accumulation of one score block.
    s: (B, H, Lq, Lk) fp32; v_blk: (B, Lk, H, Dh)."""
    m_new = jnp.maximum(m, jnp.max(s, axis=-1))
    p = jnp.exp(s - m_new[..., None])
    alpha = jnp.exp(m - m_new)
    l_new = l * alpha + jnp.sum(p, axis=-1)
    acc_new = acc * alpha[..., None] + jnp.einsum(
        'bhlm,bmhd->bhld', p, v_blk.astype(jnp.float32),
        preferred_element_type=jnp.float32)
    return m_new, l_new, acc_new


def _local_zigzag(q, k, v, *, axis_name: str, ring_size: int):
    """Per-shard body. Local blocks hold zigzag chunk pair (r, 2R-1-r),
    each of length Lc, concatenated."""
    R = ring_size
    B, L2, H, Dh = q.shape
    Lc = L2 // 2
    r = jax.lax.axis_index(axis_name)
    scale = 1.0 / (Dh ** 0.5)
    q0 = q[:, :Lc].astype(jnp.float32)      # chunk r
    q1 = q[:, Lc:].astype(jnp.float32)      # chunk 2R-1-r

    def stats():
        return (jnp.full((B, H, Lc), -jnp.inf, jnp.float32),
                jnp.zeros((B, H, Lc), jnp.float32),
                jnp.zeros((B, H, Lc, Dh), jnp.float32))

    st0, st1 = stats(), stats()
    diag = (jax.lax.broadcasted_iota(jnp.int32, (Lc, Lc), 1)
            <= jax.lax.broadcasted_iota(jnp.int32, (Lc, Lc), 0))

    def score(qh, kc):
        return jnp.einsum('blhd,bmhd->bhlm', qh, kc.astype(jnp.float32),
                          preferred_element_type=jnp.float32) * scale

    k_cur, v_cur = k, v
    perm = [(i, (i + 1) % R) for i in range(R)]
    for t in range(R):
        k0c, k1c = k_cur[:, :Lc], k_cur[:, Lc:]
        v0c, v1c = v_cur[:, :Lc], v_cur[:, Lc:]
        if t == 0:
            # diagonal step (j == r): both self-chunks causal, plus the
            # cross quarter q-late x k-early (always fully unmasked)
            st0 = _online_update(*st0, jnp.where(diag[None, None],
                                                 score(q0, k0c), _NEG), v0c)
            st1 = _online_update(*st1, jnp.where(diag[None, None],
                                                 score(q1, k1c), _NEG), v1c)
            st1 = _online_update(*st1, score(q1, k0c), v0c)
        else:
            j = (r - t) % R                  # owner of k_cur
            st1 = _online_update(*st1, score(q1, k0c), v0c)
            early = j < r                    # which exclusive quarter lives
            q_sel = jnp.where(early, q0, q1)
            k_sel = jnp.where(early, k0c, k1c)
            v_sel = jnp.where(early, v0c, v1c)
            s_sel = score(q_sel, k_sel)
            n0 = _online_update(*st0, s_sel, v_sel)
            n1 = _online_update(*st1, s_sel, v_sel)
            st0 = tuple(jnp.where(early, n, o) for n, o in zip(n0, st0))
            st1 = tuple(jnp.where(early, o, n) for n, o in zip(n1, st1))
        if t + 1 < R:
            k_cur = jax.lax.ppermute(k_cur, axis_name, perm)
            v_cur = jax.lax.ppermute(v_cur, axis_name, perm)

    def finish(st):
        m, l, acc = st
        return acc / jnp.maximum(l[..., None], 1e-30)

    out = jnp.concatenate([finish(st0), finish(st1)], axis=2)
    return jnp.swapaxes(out, 1, 2).astype(q.dtype)   # (B, 2*Lc, H, Dh)


def zigzag_ring_attention(q, k, v, mesh: Mesh, axis_name: str = 'tp',
                          batch_axis: Optional[str] = 'dp',
                          head_axis: Optional[str] = None,
                          use_pallas: bool = False):
    """Causal SDPA, L sharded over `axis_name`, balanced zigzag chunk
    assignment (~2x less attention compute than `ring_attention` at scale;
    identical results — tests/test_ring_attention.py)."""
    ring_size = mesh.shape[axis_name]
    B, L, H, Dh = q.shape
    if L % (2 * ring_size):
        raise ValueError(f'zigzag needs L ({L}) divisible by '
                         f'2*ring_size ({2 * ring_size})')
    perm, inv = zigzag_indices(L, ring_size)
    perm, inv = jnp.asarray(perm), jnp.asarray(inv)
    spec = P(batch_axis, axis_name, head_axis, None)
    body = functools.partial(_local_zigzag, axis_name=axis_name,
                             ring_size=ring_size)
    fn = jax.shard_map(body, mesh=mesh, in_specs=(spec, spec, spec),
                       out_specs=spec, check_vma=False)
    oz = fn(jnp.take(q, perm, axis=1), jnp.take(k, perm, axis=1),
            jnp.take(v, perm, axis=1))
    return jnp.take(oz, inv, axis=1)
