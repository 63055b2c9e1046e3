"""Pallas fused gated-MLP front half: act(x @ w1) * (x @ w2) in ONE kernel.

The last untried headline lever (STATUS r4 gap #2; VERDICT r4 #5): the
gated MLP is ~55% of prefill step time and XLA runs it as two (M, D) @
(D, I) matmuls whose (M, I) bf16 intermediates (z1, z2) round-trip HBM
before the gate multiply (358 MB each at M=8192, I=10928). This kernel
computes both matmuls tile-by-tile with fp32 VMEM accumulators and
applies the gelu-gate epilogue in-register — z1/z2 never exist in HBM.

Tiling: grid (M/bm, I/bn, D/bk), K innermost ('arbitrary' semantics so
the accumulators carry across K steps); x tiles are shared by both
products, w1/w2 stream through VMEM. The ragged inner width (I=10928 is
not a lane multiple) is zero-padded to bn and sliced after — gelu(0)*0
columns cost (bn - I % bn)/I extra MXU work (<1% at bn=256).

Inference-only like the other Pallas kernels (no VJP); the model-level
A/B decides adoption (BASELINE.md ledger — four prior kernels measured,
one adopted).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

def _erf(x):
    """Abramowitz-Stegun 7.1.26 erf (|abs err| < 1.5e-7): Mosaic has no
    erf lowering, and 1.5e-7 is ~5 decades below bf16 resolution so the
    exact-erf GELU parity budget (1e-3) is untouched."""
    s = jnp.sign(x)
    a = jnp.abs(x)
    t = 1.0 / (1.0 + 0.3275911 * a)
    poly = t * (0.254829592 + t * (-0.284496736 + t * (
        1.421413741 + t * (-1.453152027 + t * 1.061405429))))
    return s * (1.0 - poly * jnp.exp(-a * a))


def _gelu_erf(x):
    return 0.5 * x * (1.0 + _erf(x * 0.7071067811865476))


_ACTS = {
    'gelu': _gelu_erf,
    'gelu_tanh': lambda x: jax.nn.gelu(x, approximate=True),
    'silu': jax.nn.silu,
    'relu': jax.nn.relu,
    'identity': lambda x: x,
}


def _kernel(x_ref, w1_ref, w2_ref, o_ref, acc1, acc2, *, act, n_k):
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        acc1[...] = jnp.zeros_like(acc1)
        acc2[...] = jnp.zeros_like(acc2)

    xb = x_ref[...]
    acc1[...] += jnp.dot(xb, w1_ref[...],
                         preferred_element_type=jnp.float32)
    acc2[...] += jnp.dot(xb, w2_ref[...],
                         preferred_element_type=jnp.float32)

    @pl.when(k == n_k - 1)
    def _():
        o_ref[...] = (act(acc1[...]) * acc2[...]).astype(o_ref.dtype)


def fused_gate_pallas(x, w1, w2, activation: str = 'gelu',
                      bm: int = 512, bn: int = 256, bk: int = 512,
                      interpret: bool = False):
    """act(x @ w1) * (x @ w2), fused. x: (..., D); w1, w2: (D, I)."""
    act = _ACTS[activation]
    orig_shape = x.shape
    D = orig_shape[-1]
    I = w1.shape[1]
    n = 1
    for s in orig_shape[:-1]:
        n *= s
    x2 = x.reshape(n, D)
    bm = min(bm, max(8, n))
    bk = min(bk, D)
    pad_m = (-n) % bm
    pad_i = (-I) % bn
    pad_k = (-D) % bk
    if pad_m or pad_k:
        x2 = jnp.pad(x2, ((0, pad_m), (0, pad_k)))
    if pad_i or pad_k:
        w1 = jnp.pad(w1, ((0, pad_k), (0, pad_i)))
        w2 = jnp.pad(w2, ((0, pad_k), (0, pad_i)))
    M, K, N = n + pad_m, D + pad_k, I + pad_i
    n_k = K // bk
    out = pl.pallas_call(
        functools.partial(_kernel, act=act, n_k=n_k),
        out_shape=jax.ShapeDtypeStruct((M, N), x.dtype),
        grid=(M // bm, N // bn, n_k),
        in_specs=[
            pl.BlockSpec((bm, bk), lambda i, j, k: (i, k),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bk, bn), lambda i, j, k: (k, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bk, bn), lambda i, j, k: (k, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda i, j, k: (i, j),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((bm, bn), jnp.float32),
            pltpu.VMEM((bm, bn), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=('parallel', 'parallel', 'arbitrary')),
        interpret=interpret,
    )(x2, w1, w2)
    if pad_m or pad_i:
        out = out[:n, :I]
    return out.reshape(orig_shape[:-1] + (I,))
