"""Pallas fused RMSNorm (the N2 kernel slot of SURVEY.md §2.A — the
reference engine exposes it as `use_flash_rmsnorm`, a Triton kernel there).

One VMEM-resident pass per row block: fp32 mean-of-squares, rsqrt, scale —
no HBM round-trip for the intermediate square/mean tensors. XLA usually
fuses plain RMSNorm well; this kernel exists for the cases where the norm
sits at a fusion boundary (e.g. ahead of a custom-call) and as the
reference-parity extension point.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _rmsnorm_kernel(x_ref, w_ref, o_ref, *, eps: float):
    x = x_ref[...].astype(jnp.float32)
    ms = jnp.mean(x * x, axis=-1, keepdims=True)
    inv = jax.lax.rsqrt(ms + eps)
    o_ref[...] = (x * inv * w_ref[...].astype(jnp.float32)[None]) \
        .astype(o_ref.dtype)


def rmsnorm_pallas(x, w, eps: float = 1e-6, block_rows: int = 256,
                   interpret: bool = False):
    """y = x * rsqrt(mean(x^2, -1) + eps) * w.

    x: (..., D); w: (D,). Rows are processed in blocks of `block_rows`.
    """
    orig_shape = x.shape
    D = orig_shape[-1]
    n = 1
    for s in orig_shape[:-1]:
        n *= s
    x2 = x.reshape(n, D)
    rows = min(block_rows, max(8, n))
    pad = (-n) % rows
    if pad:
        x2 = jnp.pad(x2, ((0, pad), (0, 0)))
    grid = ((n + pad) // rows,)
    out = pl.pallas_call(
        functools.partial(_rmsnorm_kernel, eps=eps),
        out_shape=jax.ShapeDtypeStruct(x2.shape, x.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((rows, D), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((D,), lambda i: (0,), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((rows, D), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(x2, w)
    if pad:
        out = out[:n]
    return out.reshape(orig_shape)
