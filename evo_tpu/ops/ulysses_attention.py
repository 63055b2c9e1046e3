"""Ulysses attention: the all-to-all alternative to ring attention for
sequence-parallel prefill (SURVEY.md §2.A parallelism inventory).

With activations sharded on the sequence axis, an `all_to_all` reshards
(L-sharded, all heads) -> (all L, head-sharded); each device then runs
plain causal attention for its head group over the full sequence, and a
second `all_to_all` restores sequence sharding. Two collectives per layer
— cheap here because only 3 of 32 StripedHyena layers are attention — and
the attention core stays the dense flash-eligible kernel.

Requires heads % ring_size == 0 and L % ring_size == 0.
"""

from __future__ import annotations

import functools

import jax
from jax.sharding import Mesh, PartitionSpec as P

from evo_tpu.layers.attention import sdpa_causal


def _local_ulysses(q, k, v, *, axis_name: str, use_pallas: bool):
    # (B, L/R, H, Dh) -> (B, L, H/R, Dh)
    reshard = functools.partial(jax.lax.all_to_all,
                                axis_name=axis_name, split_axis=2,
                                concat_axis=1, tiled=True)
    q_g, k_g, v_g = reshard(q), reshard(k), reshard(v)
    o_g = sdpa_causal(q_g, k_g, v_g, use_pallas=use_pallas)
    # back: (B, L, H/R, Dh) -> (B, L/R, H, Dh)
    return jax.lax.all_to_all(o_g, axis_name=axis_name, split_axis=1,
                              concat_axis=2, tiled=True)


def ulysses_attention(q, k, v, mesh: Mesh, axis_name: str = 'tp',
                      batch_axis: str = 'dp', head_axis: str = None,
                      use_pallas: bool = False):
    """Causal SDPA with L sharded over `axis_name`; result identical to
    `sdpa_causal` (and to ring_attention).

    With `head_axis` set (the model's (dp, cp, tp) prefill path), heads
    are additionally tensor-parallel-sharded: the local block is
    (B/dp, L/cp, H/tp, Dh), and the all_to_all over `axis_name` further
    splits the local head group cp ways while gathering the sequence —
    Ulysses composed with TP, all collectives explicit (GSPMD left to
    infer this reshard falls back to involuntary full rematerialization
    around the out-projection; observed on the 131k tp=4 cp=2 compile)."""
    R = mesh.shape[axis_name]
    B, L, H, Dh = q.shape
    H_local = H // mesh.shape[head_axis] if head_axis else H
    if L % R or H_local % R or (head_axis and H % mesh.shape[head_axis]):
        raise ValueError(
            f'Ulysses needs L ({L}) and local heads ({H_local}) divisible '
            f'by the mesh axis size ({R})')
    spec = P(batch_axis, axis_name, head_axis, None)
    body = functools.partial(_local_ulysses, axis_name=axis_name,
                             use_pallas=use_pallas)
    return jax.shard_map(body, mesh=mesh, in_specs=(spec, spec, spec),
                         out_specs=spec, check_vma=False)(q, k, v)
