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
        outs.append(acc)
    x2, x1, v = outs
    x2_ref[0] = x2.astype(x2_ref.dtype)
    u_ref[0] = (x1 * v).astype(u_ref.dtype)


def fir_gate_pallas(z, w, b=None, block_channels: int = 64,
                    interpret: bool = False):
    """z: (B, 3, C, L); w: (3, C, K); b: (3, C) or None.

    Returns (x2 (B, C, L), u (B, C, L)) in z.dtype, exactly matching
        z' = fir_causal_conv(z, w, b)[0]; x2, x1, v = z'; u = x1 * v
    for the fresh-sequence case (zero initial FIR state).
    """
    B, three, C, L = z.shape
    assert three == 3
    K = w.shape[-1]
    # VMEM budget: z block (3 streams, in + fp32 working set) + outputs;
    # shrink the channel block as L grows (131k-context safety). Must be a
    # multiple of 8 (sublane) dividing C.
    itemsize = jnp.dtype(z.dtype).itemsize
    per_chan = L * itemsize * (3 + 2) + L * 4 * 3
    bc = min(block_channels, max(8, (8 * 2 ** 20) // per_chan // 8 * 8))
    while C % bc or bc % 8:
        bc -= 1 if bc > 1 else 0
        if bc < 8:
            bc = C          # tiny C (tests): whole-array block is exempt
            break
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
