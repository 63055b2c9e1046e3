"""int8 / int4 quantization — opt-in TPU serving modes.

Three independent levers, all OFF by default:

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
* `weight_quant: int4` — nibble-packed weights with group-128 subchannel
  f32 scales, unpacked in VMEM by the ops/pallas_int4.py kernel so HBM
  sees only the packed bytes (~3.3 GB at 7B). This is a MEMORY-FIT
  mode, not a speed mode: measured B=1 decode is ~56 tok/s, BELOW the
  int8 mode's 98.5, because the unpack compute (VPU nibble decode, or
  the extra MXU dots of the raw-byte 'dots' kernel modes) does not hide
  under the halved DMA (BASELINE.md int4 row has the kernel-level
  ledger). Use it when the 2x weight shrink is what matters — e.g.
  131k-context KV (6.4 GB) + weights in under 10 GB of a 16 GB chip.
  Single-chip serving mode (no GSPMD rule for the kernel; packed
  layouts flatten the TP axes). Quantization error is ~2% RMS per
  matmul (vs ~0.4% for int8) — strictly opt-in.

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


def quantize_weight_int4(w: jax.Array, nc: int) -> dict:
    """Symmetric int4 with group-128 subchannel scales, nibble-packed.

    The first `nc` axes are the contraction (all seven quantized families
    store contraction-leading, _QUANT_AXES); output axes are kept on the
    scales so `int4_dot` can reshape results: returns
    {'q4': (Kp/2, prod(out)) int8 packed, 's4': (Kp/128, *out) f32}.
    """
    from evo_tpu.ops.pallas_int4 import pack_int4

    K = 1
    for d in w.shape[:nc]:
        K *= d
    out = w.shape[nc:]
    N = 1
    for d in out:
        N *= d
    w2 = w.reshape(K, N).astype(jnp.float32)
    Kp = -(-K // 256) * 256        # pack_int4 pairs rows j and Kp/2+j
    if Kp > K:
        w2 = jnp.pad(w2, ((0, Kp - K), (0, 0)))
    G = Kp // 128
    wg = w2.reshape(G, 128, N)
    s = jnp.maximum(jnp.max(jnp.abs(wg), axis=1) / 7.0,
                    jnp.float32(1e-12))                   # (G, N)
    q = jnp.clip(jnp.round(wg / s[:, None]), -7, 7).astype(jnp.int8)
    return {'q4': pack_int4(q.reshape(Kp, N)),
            's4': s.reshape((G,) + out)}


def wcast(w: Any, dt) -> jax.Array:
    """Weight-load hook used by every projection site: dequantize
    {'q','s'} leaves (the multiply fuses into the consuming dot) or plain
    `.astype(dt)` for unquantized arrays."""
    if isinstance(w, dict):
        assert 'q' in w, 'int4 leaves must go through qdot/int4_dot'
        return w['q'].astype(dt) * w['s'].astype(dt)
    return w.astype(dt)


def is_quantized(w: Any) -> bool:
    return isinstance(w, dict) and 'q' in w


def is_int4(w: Any) -> bool:
    return isinstance(w, dict) and 'q4' in w


def int4_dot(x: jax.Array, w: dict, nc: int = 1) -> jax.Array:
    """Weight-only int4 projection: contract x's last `nc` dims with the
    packed weight's contraction rows.

    Small-M calls (decode steps, forced-token prefill: M = batch) run the
    VMEM unpack kernel (ops/pallas_int4.py) so HBM sees only the packed
    bytes — the whole point of int4 (the decode roofline is weight
    traffic). Large-M calls (batch prefill) fall back to a jnp
    unpack+dequant feeding a plain bf16 dot: XLA materializes the bf16
    weights once, which is noise next to the MXU-bound matmul there.
    """
    from evo_tpu.ops import pallas_int4

    q4, s4 = w['q4'], w['s4']
    out = s4.shape[1:]
    G = s4.shape[0]
    Kp = 2 * q4.shape[0]
    lead = x.shape[:-nc]
    K = 1
    for d in x.shape[-nc:]:
        K *= d
    M = 1
    for d in lead:
        M *= d
    x2 = x.reshape(M, K)
    if Kp > K:
        x2 = jnp.pad(x2, ((0, 0), (0, Kp - K)))
    N = q4.shape[1]
    s2 = s4.reshape(G, N)
    if (pallas_int4.int4_matmul_supported(M, Kp)
            and jax.default_backend() == 'tpu'):
        y2 = pallas_int4.int4_matmul(x2, q4, s2)
    else:
        wd = (pallas_int4.unpack_int4_jnp(q4).astype(jnp.bfloat16)
              .reshape(G, 128, N) * s2[:, None].astype(jnp.bfloat16))
        y2 = jax.lax.dot_general(
            x2.astype(jnp.bfloat16), wd.reshape(Kp, N),
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
    return y2.reshape(lead + out).astype(x.dtype)


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
    (so call sites can be unconditional under the act_quant flag), and to
    the weight-only int4 path (`int4_dot`) for {'q4','s4'} leaves.
    """
    if is_int4(w):
        return int4_dot(x, w, nc)
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


def quantize_params(params: Any, free_source: bool = False,
                    mode: str = 'int8') -> Any:
    """Replace the large projection leaves with {'q': int8, 's': f32}
    (mode 'int8') or {'q4': packed int8, 's4': f32 group scales}
    (mode 'int4'; see quantize_weight_int4 / ops/pallas_int4.py).

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
    if mode not in ('int8', 'int4'):
        raise ValueError(f'unknown quantization mode {mode!r}')
    qw = jax.jit(quantize_weight, static_argnums=1)
    qw4 = jax.jit(quantize_weight_int4, static_argnums=1)

    def stacked_map(fn, leaf, arg):
        # Per-layer quantization of a stacked hyena-run leaf. The one-shot
        # (vmapped) form materializes an f32 copy of the WHOLE stack next
        # to the still-live bf16 tree — ~1.6 GB of temp for the 7B stacked
        # MLP leaves, enough to push a 16 GB chip into RESOURCE_EXHAUSTED
        # during int4 conversion (observed in the round-3 bench). Layer-
        # at-a-time bounds the temps to one slice (~200 MB).
        parts = [fn(leaf[i], arg) for i in range(leaf.shape[0])]
        jax.block_until_ready(parts)
        return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *parts)

    def visit(path, leaf):
        keys = [getattr(k, 'key', None) for k in path]
        name = keys[-1]
        if name in ('q', 's', 'q4', 's4') and any(
                k in _QUANT_AXES for k in keys if k):
            # already-quantized leaf: idempotent for the SAME mode, loud
            # for a different one (an int8 tree passed with mode='int4'
            # would otherwise silently keep 2x the requested bytes —
            # an undiagnosable OOM on the memory-fit workloads)
            want = ('q4', 's4') if mode == 'int4' else ('q', 's')
            if name not in want:
                raise ValueError(
                    f'params already quantized in a different mode (found '
                    f'{name!r} leaf, requested {mode!r}); reload the bf16 '
                    'tree before switching quantization modes')
            return leaf
        if name not in _QUANT_AXES:
            return leaf
        stacked = 'stack' in keys
        if mode == 'int4':
            # contraction axes are leading-contiguous for every family
            nc = len(_QUANT_AXES[name])
            out = stacked_map(qw4, leaf, nc) if stacked else qw4(leaf, nc)
        else:
            axes = _QUANT_AXES[name]
            out = stacked_map(qw, leaf, axes) if stacked else qw(leaf, axes)
        if free_source and isinstance(leaf, jax.Array):
            jax.block_until_ready(out)
            leaf.delete()
        return out

    return jax.tree_util.tree_map_with_path(visit, params)


def quantized_bytes(params: Any) -> int:
    """Total parameter bytes (diagnostic for the HBM story)."""
    return sum(x.size * x.dtype.itemsize
               for x in jax.tree_util.tree_leaves(params))
