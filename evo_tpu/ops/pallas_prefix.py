"""Pallas VMEM kernel for the modal cross-chunk prefix (N3/N4 family).

The chunked Toeplitz conv (ops/fftconv.py:conv_matmul_chunked) combines
per-chunk injected modal states with a Hillis-Steele decayed inclusive
prefix over the K = L/chunk chunks:

    incl[k] = sum_{j<=k} (p^C)^(k-j) inj[j]

As jnp ops this is log2(K) full passes over the (B, D, K, S) state array
— each step concatenates a shifted copy and multiply-adds. Here the
whole prefix runs in VMEM: one read of inj, log2(K) register-level
lane-shifted multiply-adds, one write of the shifted result
`ent[k] = incl[k-1]` (the state ENTERING chunk k, which is what the
y_state einsum consumes) plus the final carry incl[K-1].

MEASURED (on-chip interleaved A/B, 7B B=1 L=8192): step-NEUTRAL —
809/811 ms with the kernel vs 809/813 ms jnp. XLA already overlaps the
Hillis-Steele HBM passes with the surrounding MXU matmuls at this shape,
so the recovered traffic buys nothing (same lesson as the conv-table
rewrite, BASELINE.md). Default OFF (`hyena_pallas_prefix`); kept
oracle-tested for VPU-pressured shapes (small-batch / sharded) where the
elementwise passes do surface on the critical path.

Layout: chunks on the lane axis ((bc, S, K) blocks; K is 128 at the 8k
production shape — exactly one vreg of lanes). Lane-axis shifts are
static concat+slice, which Mosaic supports; the per-step decay powers
(p^C)^step arrive pre-computed as a (D, S, ceil_log2(K)) table.

Oracle: the jnp loop in conv_matmul_chunked (tests/test_pallas_prefix.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _steps(K: int):
    out, step = [], 1
    while step < K:
        out.append(step)
        step *= 2
    return out


def _prefix_kernel(inj_r_ref, inj_i_ref, pcs_r_ref, pcs_i_ref,
                   ent_r_ref, ent_i_ref, fin_r_ref, fin_i_ref,
                   *, K: int, steps: tuple):
    sr = inj_r_ref[0].astype(jnp.float32)                 # (bc, S, K)
    si = inj_i_ref[0].astype(jnp.float32)
    bc, S, _ = sr.shape
    z1 = jnp.zeros((bc, S, 1), jnp.float32)
    for j, step in enumerate(steps):
        ar = pcs_r_ref[:, :, j:j + 1]                     # (bc, S, 1)
        ai = pcs_i_ref[:, :, j:j + 1]
        zs = jnp.zeros((bc, S, step), jnp.float32)
        srs = jnp.concatenate([zs, sr[..., :K - step]], axis=-1)
        sis = jnp.concatenate([zs, si[..., :K - step]], axis=-1)
        sr = sr + ar * srs - ai * sis
        si = si + ar * sis + ai * srs
    # ent[k] = incl[k-1] (zero-seeded); carry = incl[K-1]
    ent_r_ref[0] = jnp.concatenate([z1, sr[..., :K - 1]], axis=-1)
    ent_i_ref[0] = jnp.concatenate([z1, si[..., :K - 1]], axis=-1)
    fin_r_ref[0] = sr[..., K - 1:]
    fin_i_ref[0] = si[..., K - 1:]


def _pick_bc(D: int, S: int, K: int):
    # Mosaic's measured scoped-VMEM stack is ~22x bc*S*K*4 bytes (the
    # concat+slice shifts keep several live copies per step; 22.67M at
    # bc=256, S=8, K=128) against a 16M scoped limit — budget 14M.
    for bc in (256, 128, 64, 32, 16, 8):
        if D % bc == 0 and 22 * bc * S * K * 4 <= 14 * 1024 * 1024:
            return bc
    return None


def modal_prefix_supported(shape) -> bool:
    """shape = (B, D, K, S) of the injected states."""
    B, D, K, S = shape
    return K >= 2 and _pick_bc(D, S, K) is not None


def modal_prefix_pallas(inj_r, inj_i, logmag, theta, chunk: int,
                        interpret: bool = False):
    """inj_r/inj_i: (B, D, K, S) float32 per-chunk injected states;
    logmag/theta: (D, S) pole logs; chunk: C (the decay base is p^C).

    Returns (ent_r, ent_i, fin_r, fin_i): the state entering each chunk
    ((B, D, K, S), zero-seeded) and the final inclusive state (B, D, S).
    Callers with a nonzero segment-continuation state add the A^k x s0
    terms outside (cheap, and only on the resume path).
    """
    from evo_tpu.ops import fftconv

    B, D, K, S = inj_r.shape
    bc = _pick_bc(D, S, K)
    steps = _steps(K)
    # (D, S, NS) per-step decay powers (p^C)^step, via the log-doubling
    # range on scaled logs (exact at these few exponents)
    pcs_r, pcs_i = fftconv._pole_pow_tables(
        chunk * logmag, chunk * theta, jnp.asarray(steps, jnp.float32))
    inj_r_t = jnp.moveaxis(inj_r, 3, 2)                   # (B, D, S, K)
    inj_i_t = jnp.moveaxis(inj_i, 3, 2)
    grid = (B, D // bc)
    ent_r, ent_i, fin_r, fin_i = pl.pallas_call(
        functools.partial(_prefix_kernel, K=K, steps=tuple(steps)),
        out_shape=(jax.ShapeDtypeStruct((B, D, S, K), jnp.float32),
                   jax.ShapeDtypeStruct((B, D, S, K), jnp.float32),
                   jax.ShapeDtypeStruct((B, D, S, 1), jnp.float32),
                   jax.ShapeDtypeStruct((B, D, S, 1), jnp.float32)),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, bc, S, K), lambda b, c: (b, c, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bc, S, K), lambda b, c: (b, c, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bc, S, len(steps)), lambda b, c: (c, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bc, S, len(steps)), lambda b, c: (c, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, bc, S, K), lambda b, c: (b, c, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bc, S, K), lambda b, c: (b, c, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bc, S, 1), lambda b, c: (b, c, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bc, S, 1), lambda b, c: (b, c, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        interpret=interpret,
    )(inj_r_t, inj_i_t, pcs_r, pcs_i)
    return (jnp.moveaxis(ent_r, 2, 3), jnp.moveaxis(ent_i, 2, 3),
            fin_r[..., 0], fin_i[..., 0])
