"""int8 quantization — opt-in TPU serving modes.

Two independent levers, both OFF by default:

* `weight_quant: int8` — weight-only. 7B decode is HBM-bandwidth-bound
  (12.9 GB bf16 weights/step -> ~61 tok/s B=1 ceiling at 819 GB/s on
  v5e); int8 storage with per-output-channel float32 scales halves the
  bytes. Measured: 98.5 tok/s B=1 (1.79x bf16), 668 aggregate at B=8
  (1.61x). XLA fuses the dequantize (q.astype(bf16) * s) into the
  consuming dot's operand load, so no bf16 copy is materialized in HBM;
  MXU-bound prefill is ~neutral.
* `act_quant: int8` (requires weight int8) — int8 x int8 dots via `qdot`:
  dynamic per-token activation scales against the stored weight scales,
  int32 MXU accumulation. The v5e MXU runs int8 at 2x the bf16 rate;
  measured 7B prefill: 13,849 tok/s (1.37x the bf16 path, 1.81x the
  50%-roofline target).

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


def qdot(x: jax.Array, w: Any, nc: int = 1) -> jax.Array:
    """int8 x int8 projection: dynamic per-token activation quantization
    against a weight-quantized {'q','s'} leaf, contracting x's last `nc`
    dims with w['q']'s first `nc` dims. int32 MXU accumulation.

    The v5e MXU runs int8 at 2x the bf16 rate; measured on-chip at the 7B
    MLP shape: 3.12 ms vs 5.04 bf16 per (8192x4096)@(4096x10928) matmul
    (1.62x including the quantize/rescale elementwise work, which XLA
    fuses around the dot). Activation scales are symmetric per-token
    max-abs over the contracted dims; combined rescale is one fused
    multiply: y = int32_dot * x_scale * w_scale.

    Falls back to the bf16 `wcast` path when `w` is an unquantized array
    (so call sites can be unconditional under the act_quant flag).
    """
    if not is_quantized(w):
        red = tuple(range(x.ndim - nc, x.ndim))
        return jax.lax.dot_general(
            x, w.astype(x.dtype),
            ((red, tuple(range(nc))), ((), ())))
    red = tuple(range(x.ndim - nc, x.ndim))
    x32 = x.astype(jnp.float32)
    xs = jnp.max(jnp.abs(x32), axis=red, keepdims=True) / 127.0
    xs = jnp.maximum(xs, jnp.float32(1e-12))
    xq = jnp.clip(jnp.round(x32 / xs), -127, 127).astype(jnp.int8)
    y32 = jax.lax.dot_general(
        xq, w['q'], ((red, tuple(range(nc))), ((), ())),
        preferred_element_type=jnp.int32)
    wshape = w['q'].shape[nc:]
    xs_out = xs.reshape(x.shape[:x.ndim - nc] + (1,) * len(wshape))
    y = y32.astype(jnp.float32) * xs_out * w['s'].reshape(wshape)
    return y.astype(x.dtype)


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
