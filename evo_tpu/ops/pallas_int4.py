"""Packed-int4 weight-only matmul kernel (N3 family: serving fast path).

7B decode is HBM-bandwidth-bound: every generated token streams the full
weight set through the chip (BASELINE.md decode rows; 12.9 GB bf16 ->
~61 tok/s B=1 ceiling on v5e; int8 halves that to 6.45 GB -> measured
98.5 tok/s at ~87% of the int8 roofline). The only remaining lever is
fewer bytes. Native `jnp.int4` arrays trace-crash on the tunneled axon
backend (round-2 probe: "Recursively calling jit"), and XLA materializes
a bf16 copy when asked to unpack nibble-packed int8 (+9 ms at decode
shapes) — so the unpack must happen in VMEM, in the kernel that feeds
the MXU. That is this module.

Layout: the contraction axis is padded to a multiple of 256; packed byte
row j (j in [0, Kp/2)) holds natural row j in its LOW nibble
(offset-binary: stored value lo+8, in [1, 15]) and natural row Kp/2 + j
in its HIGH nibble (two's complement). The halves pairing keeps every
activation slice a contiguous multiple of 128 lanes (Mosaic rejects
64-wide lane slices), and the offset-lo encoding makes the byte value
exactly `16*hi + (lo+8)` as a signed int8 — so the nibbles never need
separating on the VPU at all. For byte block t (128 rows) the kernel
computes, per the integer identity,

    y_lo = xlo @ b - 16 * (xlo @ h) - 8 * rowsum(xlo)
    y_hi = xhi @ h                       with  h = b >> 4 (arithmetic)

i.e. the "unpack" is one shift per byte plus extra MXU dots against the
raw packed bytes ('dots' = bf16 dots, 'dots8' = exact int8 x int8 dots
on a per-row-quantized activation). Scales are per (group-of-128
natural rows, output channel) f32 — group-128 subchannel quantization,
the standard int4 recipe (per-output-channel-only scales are too coarse
at 4 bits). Byte block t carries lo rows of scale group t and hi rows
of scale group G/2 + t, so both scale rows are single broadcasts.

    packed: (Kp/2, N) int8      scales: (G, N) f32, G = Kp/128
    y[m, n] = sum_g s[g, n] * (x[m, 128g:128(g+1)] @ unpack(q)[...])

The kernel tiles N on the grid, keeps the whole (padded) M x Kp
activation block in VMEM, and statically unrolls the byte-block loop
with f32 accumulation. Weights are read from HBM exactly once when
M <= the single-block limit (decode: M = batch), which is the case this
kernel exists for; larger M (prefill) takes the jnp fallback in
quant.int4_dot where the one-off bf16 materialization amortizes.

No GSPMD partitioning rule -> single-chip serving mode only (validated
at load, models.py). Oracle: unpack_int4_jnp + jnp dot
(tests/test_int4.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# single-M-block limit: x tile (M_MAX, Kp) bf16 must fit VMEM next to the
# weight tile; 128 x 11008 x 2B = 2.8 MB (the 7B MLP w3 is the widest
# contraction). Decode/forced-prefill batches are far below this.
M_MAX = 128
_BN = 512


def pack_int4(q: jax.Array) -> jax.Array:
    """(Kp, N) int4 values in int8 storage -> (Kp/2, N) packed bytes.

    Kp must be a multiple of 256. Byte row j = ((row j + 8) & 15)
    | (row Kp/2 + j) << 4 — see the module docstring for why.
    """
    Kp, N = q.shape
    assert Kp % 256 == 0, Kp
    g = q.astype(jnp.int32)
    b = ((g[:Kp // 2] + 8) & 15) | ((g[Kp // 2:] & 15) << 4)  # [0, 255]
    return jnp.where(b > 127, b - 256, b).astype(jnp.int8)


def unpack_int4_jnp(packed: jax.Array) -> jax.Array:
    """Inverse of pack_int4: (Kp/2, N) -> (Kp, N) int8 in [-8, 7]."""
    b = packed.astype(jnp.int32) & 255
    lo = (b & 15) - 8
    hi = b >> 4
    hi = jnp.where(hi > 7, hi - 16, hi)
    return jnp.concatenate([lo, hi], axis=0).astype(jnp.int8)


def _int4_kernel(x_ref, q_ref, s_ref, o_ref, *, G: int, mode: str):
    bm = x_ref.shape[0]
    bn = q_ref.shape[1]
    Kp = G * 128
    T = G // 2                      # byte blocks of 128 rows
    if mode == 'dots':
        # MXU-unpack, bf16 dots against the raw packed bytes. Per byte:
        # one shift + two bf16 casts; no nibble separation on the VPU.
        acc = jnp.zeros((bm, bn), jnp.float32)
        for t in range(T):
            b8 = q_ref[t * 128:(t + 1) * 128, :]
            b_bf = b8.astype(jnp.bfloat16)
            h_bf = ((b8.astype(jnp.int32) >> 4)
                    .astype(jnp.bfloat16))                # [-8, 7] exact
            xlo = x_ref[:, t * 128:(t + 1) * 128]
            xhi = x_ref[:, Kp // 2 + t * 128:Kp // 2 + (t + 1) * 128]
            dot = functools.partial(
                jax.lax.dot_general,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            a = dot(xlo, b_bf)
            c = dot(xlo, h_bf)
            bb = dot(xhi, h_bf)
            r = jnp.sum(xlo.astype(jnp.float32), axis=1, keepdims=True)
            acc = (acc + (a - 16.0 * c - 8.0 * r) * s_ref[t:t + 1, :]
                   + bb * s_ref[T + t:T + t + 1, :])
        o_ref[:] = acc
        return
    if mode == 'dots8':
        # MXU-unpack, int8 x int8: quantize the activation row once
        # (symmetric per-row max-abs), then three EXACT int8 dots per
        # block against the raw bytes b and h = b >> 4 (the only
        # per-byte VPU work). Exact in int32; float only in the scale
        # epilogue.
        x32 = x_ref[:].astype(jnp.float32)
        xs = jnp.maximum(jnp.max(jnp.abs(x32), axis=1, keepdims=True)
                         / 127.0, jnp.float32(1e-12))
        xq = jnp.clip(jnp.round(x32 / xs), -127, 127).astype(jnp.int8)
        acc = jnp.zeros((bm, bn), jnp.float32)
        for t in range(T):
            b8 = q_ref[t * 128:(t + 1) * 128, :]
            h8 = (b8.astype(jnp.int32) >> 4).astype(jnp.int8)
            xlo = xq[:, t * 128:(t + 1) * 128]
            xhi = xq[:, Kp // 2 + t * 128:Kp // 2 + (t + 1) * 128]
            dot = functools.partial(
                jax.lax.dot_general,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)
            a = dot(xlo, b8)
            c = dot(xlo, h8)
            bb = dot(xhi, h8)
            r = jnp.sum(xlo.astype(jnp.int32), axis=1, keepdims=True)
            acc = (acc + (a - 16 * c - 8 * r).astype(jnp.float32)
                   * s_ref[t:t + 1, :]
                   + bb.astype(jnp.float32) * s_ref[T + t:T + t + 1, :])
        o_ref[:] = acc * xs
        return
    if mode == 'unroll':
        # VPU-unpack reference: decode both nibbles (~5 ops/byte), two
        # K=128 bf16 dots per byte block. Static unroll: no scalar loop,
        # Mosaic pipelines the bodies.
        acc = jnp.zeros((bm, bn), jnp.float32)
        for t in range(T):
            b32 = q_ref[t * 128:(t + 1) * 128, :].astype(jnp.int32)
            lo = ((b32 & 15) - 8).astype(jnp.bfloat16)
            hi = ((b32 << 24) >> 28).astype(jnp.bfloat16)
            dot = functools.partial(
                jax.lax.dot_general,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            xlo = x_ref[:, t * 128:(t + 1) * 128]
            xhi = x_ref[:, Kp // 2 + t * 128:Kp // 2 + (t + 1) * 128]
            acc = (acc + dot(xlo, lo) * s_ref[t:t + 1, :]
                   + dot(xhi, hi) * s_ref[T + t:T + t + 1, :])
        o_ref[:] = acc
        return
    # 'block': unpack + scale the whole (Kp, bn) tile, one MXU dot.
    # Scales fold into the bf16 weights (dequant error >> bf16 rounding).
    b32 = q_ref[:].astype(jnp.int32)
    lo = ((b32 & 15) - 8).astype(jnp.float32)             # natural rows
    hi = ((b32 << 24) >> 28).astype(jnp.float32)          # rows Kp/2..Kp
    w = jnp.concatenate([lo, hi], axis=0).reshape(G, 128, bn)
    w = (w * s_ref[:][:, None, :]).reshape(Kp, bn).astype(jnp.bfloat16)
    o_ref[:] = jax.lax.dot_general(
        x_ref[:], w, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)


def int4_matmul_supported(m: int, kp: int) -> bool:
    return m <= M_MAX and kp % 256 == 0


def int4_matmul(x: jax.Array, packed: jax.Array, scales: jax.Array,
                interpret: bool = False, mode: str = 'unroll',
                bn: int | None = None) -> jax.Array:
    """x: (M, Kp) bf16 (zero-padded to the weight's padded contraction);
    packed: (Kp/2, N) int8 (pack_int4 layout); scales: (G, N) f32.
    Returns (M, N) float32. M must be <= M_MAX.
    """
    M, Kp = x.shape
    _, N = packed.shape
    G = Kp // 128
    assert scales.shape == (G, N), (scales.shape, G, N)
    assert int4_matmul_supported(M, Kp), (M, Kp)
    bm = max(16, -(-M // 16) * 16)                        # bf16 sublane tile
    if M < bm:
        x = jnp.pad(x, ((0, bm - M), (0, 0)))
    if bn is None:
        bn = 256 if mode == 'block' else _BN
    bn = min(bn, N)
    out = pl.pallas_call(
        functools.partial(_int4_kernel, G=G, mode=mode),
        out_shape=jax.ShapeDtypeStruct((bm, N), jnp.float32),
        grid=(pl.cdiv(N, bn),),
        in_specs=[
            pl.BlockSpec((bm, Kp), lambda n: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Kp // 2, bn), lambda n: (0, n),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((G, bn), lambda n: (0, n),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda n: (0, n),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(x.astype(jnp.bfloat16), packed, scales)
    return out[:M]
