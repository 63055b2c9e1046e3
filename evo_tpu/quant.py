"""Weight-only int8 quantization — opt-in TPU serving mode.

7B decode is HBM-bandwidth-bound: every generated token streams the full
weight set (12.9 GB bf16 -> ~61 tok/s B=1 ceiling at 819 GB/s on v5e;
BASELINE.md decode rows). Storing the large projection matrices as int8
with per-output-channel float32 scales roughly halves the bytes per step,
lifting the B=1 decode roofline ~2x; XLA fuses the dequantize
(q.astype(bf16) * s) into the consuming dot's operand load, so no bf16
copy of the weights is ever materialized in HBM. MXU-bound prefill is
~neutral (measured ~5% dequant overhead at L=8192).

The reference has no quantized path (GPU bf16 engine,
/root/reference/evo/models.py:148), so this is strictly opt-in and OFF by
default: enable with `weight_quant: int8` in the YAML config or
`Evo(..., config_overrides={'weight_quant': 'int8'})`. The 1e-3 parity
contract (BASELINE configs #2-#4) applies to the default bf16 mode only.

What gets quantized: the seven large projection families (MLP w1/w2/w3,
Hyena w_in/w_out, attention wqkv/wo) — ~97% of parameter bytes.
Everything precision-critical keeps its original dtype: poles/residues
(the reference's fp32-except policy), FIR taps, norms, biases, and the
tied embedding/unembed (4 MB; also used as a gather table).

Symmetric max-abs scales per OUTPUT channel, reduced over the dot's
contraction axes, so the dequantized product equals the bf16 product up
to one int8 rounding of the weight (~0.4% RMS per matmul).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp

# leaf name -> contraction axes (per the unstacked layouts in
# model.init_params; stacked hyena runs shift every axis by +1)
_QUANT_AXES = {
    'w1': (0,), 'w2': (0,), 'w3': (0,),          # (D,I)/(D,I)/(I,D)
    'w_in': (0,), 'w_out': (0,),                 # (D,3,C)/(C,D)
    'wqkv': (0,), 'wo': (0, 1),                  # (D,3,H,Dh)/(H,Dh,D)
}


def quantize_weight(w: jax.Array, axes: tuple) -> dict:
    """Symmetric int8 with per-output-channel max-abs scales."""
    w32 = w.astype(jnp.float32)
    s = jnp.max(jnp.abs(w32), axis=axes, keepdims=True) / 127.0
    s = jnp.maximum(s, jnp.float32(1e-12))
    q = jnp.clip(jnp.round(w32 / s), -127, 127).astype(jnp.int8)
    return {'q': q, 's': s}


def wcast(w: Any, dt) -> jax.Array:
    """Weight-load hook used by every projection site: dequantize
    {'q','s'} leaves (the multiply fuses into the consuming dot) or plain
    `.astype(dt)` for unquantized arrays."""
    if isinstance(w, dict):
        return w['q'].astype(dt) * w['s'].astype(dt)
    return w.astype(dt)


def is_quantized(w: Any) -> bool:
    return isinstance(w, dict) and 'q' in w


def quantize_params(params: Any, free_source: bool = False) -> Any:
    """Replace the large projection leaves with {'q': int8, 's': f32}.

    Works on the model param pytree from `model.init_params` /
    `checkpoint` loading, including stacked Hyena runs (leading scan axis
    excluded from the scale reduction, so each layer keeps its own
    scales). Idempotent on already-quantized trees.

    free_source=True deletes each bf16 source buffer as soon as its int8
    replacement exists (leaf-by-leaf jits, NOT one big program): at 7B the
    one-shot form peaks at 12.9 GB in + 6.6 GB out and OOMs a 16 GB chip,
    while the streaming form peaks near the bf16 size. Only pass it when
    the caller owns `params` and will not reuse the bf16 tree.
    """
    qw = jax.jit(quantize_weight, static_argnums=1)

    def visit(path, leaf):
        keys = [getattr(k, 'key', None) for k in path]
        name = keys[-1]
        if name not in _QUANT_AXES:
            return leaf
        shift = 1 if 'stack' in keys else 0
        axes = tuple(a + shift for a in _QUANT_AXES[name])
        out = qw(leaf, axes)
        if free_source and isinstance(leaf, jax.Array):
            jax.block_until_ready(out)
            leaf.delete()
        return out

    return jax.tree_util.tree_map_with_path(visit, params)


def quantized_bytes(params: Any) -> int:
    """Total parameter bytes (diagnostic for the HBM story)."""
    return sum(x.size * x.dtype.itemsize
               for x in jax.tree_util.tree_leaves(params))
