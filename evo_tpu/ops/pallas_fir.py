"""Pallas fused short-FIR + gate (the `use_flash_depthwise` kernel slot —
SURVEY.md §2.A N2; a Triton switch in the reference engine,
`evo/configs/evo-1-8k-base_inference.yml:32`).

Fuses the Hyena mixer's elementwise head in one VMEM pass over the
projected streams z (B, 3, C, L):

    z' = depthwise causal FIR(z)      (length-3 taps, zero left pad)
    x2, x1, v = z'                    (three streams)
    u = x1 * v                        (conv input pre-gate)

emitting (x2, u) directly — the intermediate z' (2/3 of which is consumed
immediately by the gate) never round-trips through HBM. The jnp
composition in ops/fftconv.py (`fir_causal_conv`) is the oracle; segment
continuation (carried FIR state) stays on the jnp path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _fir_gate_kernel(z_ref, w_ref, b_ref, x2_ref, u_ref, *, K: int,
                     bc: int):
    # z: (1, 3, bc, L) block; w: (1, 3*K, bc) and b: (1, 3, bc) per-block
    # slabs (blocked on the leading channel-block axis — whole trailing
    # dims, so the 8/128 lane-blocking rule does not apply to them).
    L = z_ref.shape[-1]
    w = w_ref[0].astype(jnp.float32)                       # (3K, bc)
    b = b_ref[0].astype(jnp.float32)                       # (3, bc)
    outs = []
    for s in range(3):
        zf = z_ref[0, s].astype(jnp.float32)               # (bc, L)
        acc = jnp.zeros((bc, L), jnp.float32)
        for j in range(K):
            shift = K - 1 - j
            tap = w[s * K + j][:, None]
            if shift == 0:
                acc = acc + tap * zf
            else:
                zs = jnp.concatenate(
                    [jnp.zeros((bc, shift), jnp.float32),
                     zf[:, :L - shift]], axis=1)
                acc = acc + tap * zs
        acc = acc + b[s][:, None]
        # round to the activation dtype BEFORE gating, bit-matching the
        # jnp composition (fir_causal_conv casts its output to z.dtype,
        # then the gate multiplies in that dtype)
        outs.append(acc.astype(x2_ref.dtype))
    x2, x1, v = outs
    x2_ref[0] = x2
    u_ref[0] = x1 * v


def _pick_bc(shape, dtype):
    """Largest VMEM-feasible channel block (multiple of 8 dividing C), or
    None when even the smallest block exceeds the budget / no block
    divides C."""
    _, _, C, L = shape
    itemsize = jnp.dtype(dtype).itemsize
    # working set per channel row: z block (3 streams) + 2 outputs in the
    # activation dtype, plus ~3 float32 temporaries inside the kernel
    per_chan = L * itemsize * (3 + 2) + L * 4 * 3
    budget = 10 * 2 ** 20
    cap = budget // per_chan
    if C <= cap and (C % 8 == 0 or C <= 128):
        return C            # whole-channel block (exempt from blocking rule)
    bc = min(128, cap // 8 * 8)
    while bc >= 8 and C % bc:
        bc -= 8
    return bc if bc >= 8 else None


def fir_gate_supported(shape, dtype) -> bool:
    """True when the fused kernel has a feasible blocking for this shape."""
    return _pick_bc(shape, dtype) is not None


def fir_gate_pallas(z, w, b=None, block_channels: int = 64,
                    interpret: bool = False):
    """z: (B, 3, C, L); w: (3, C, K); b: (3, C) or None.

    Returns (x2 (B, C, L), u (B, C, L)) in z.dtype, exactly matching
        z' = fir_causal_conv(z, w, b)[0]; x2, x1, v = z'; u = x1 * v
    for the fresh-sequence case (zero initial FIR state): FIR outputs are
    rounded to z.dtype before the gate, as the jnp composition does.
    """
    B, three, C, L = z.shape
    assert three == 3
    K = w.shape[-1]
    bc = _pick_bc(z.shape, z.dtype)
    if bc is None:
        raise ValueError(
            f'fir_gate_pallas: no VMEM-feasible channel block for shape '
            f'{z.shape} — gate with fir_gate_supported() first')
    bc = min(bc, block_channels if C % block_channels == 0 else bc)
    # (C//bc, 3K, bc) / (C//bc, 3, bc): one slab per channel block
    wt = jnp.swapaxes(
        w.reshape(3, C // bc, bc, K), 2, 3).reshape(3, C // bc, K * bc)
    wt = jnp.swapaxes(wt, 0, 1).reshape(C // bc, 3 * K, bc)
    if b is None:
        b = jnp.zeros((3, C), z.dtype)
    bb = jnp.swapaxes(b.reshape(3, C // bc, bc), 0, 1)     # (C//bc, 3, bc)
    grid = (B, C // bc)
    x2, u = pl.pallas_call(
        functools.partial(_fir_gate_kernel, K=K, bc=bc),
        out_shape=(jax.ShapeDtypeStruct((B, C, L), z.dtype),
                   jax.ShapeDtypeStruct((B, C, L), z.dtype)),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 3, bc, L), lambda ib, ic: (ib, 0, ic, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3 * K, bc), lambda ib, ic: (ic, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3, bc), lambda ib, ic: (ic, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, bc, L), lambda ib, ic: (ib, ic, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bc, L), lambda ib, ic: (ib, ic, 0),
                         memory_space=pltpu.VMEM),
        ),
        interpret=interpret,
    )(z, wt, bb)
    return x2, u
