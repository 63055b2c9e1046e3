"""StripedHyena model: parameter pytree + pure forward/prefill/decode fns.

TPU-first re-design of the reference engine layer (external pkg
`stripedhyena==0.2.2`; observed contract in SURVEY.md §2.A):

  * parameters are a plain nested-dict pytree (no framework modules) so that
    GSPMD NamedShardings, donation, and checkpoint mapping are direct;
  * three pure entry points, each independently jittable:
      - `forward(params, ids)`                  -> logits            (scoring)
      - `prefill(params, ids, cache)`           -> logits, cache     (gen start)
      - `decode_step(params, token, cache)`     -> logits_t, cache   (AR decode)
  * the decode cache mirrors the reference `inference_params_dict`
    ({'mha': KV + seqlen_offset, 'hyena': fir_state + modal state},
    `evo/generation.py:105-148`) as one flat pytree with a single scalar
    `offset`, so the whole generation loop runs under one `lax.scan` with
    donated buffers.

Precision policy (reference `to_bfloat16_except_poles_residues`,
`evo/models.py:148`): params in `config.param_dtype` except Hyena
poles/residues (float32); activations in `config.compute_dtype`; RMSNorm /
softmax / FFT / logits in float32.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from evo_tpu.config import ModelConfig
from evo_tpu.layers.attention import mha_full, mha_step
from evo_tpu.layers.hyena import HyenaState, hyena_full, hyena_step
from evo_tpu.layers.mlp import gated_mlp
from evo_tpu.layers.norms import rmsnorm

Params = Dict[str, Any]


def _dtype(name: str):
    return jnp.dtype(name)


# single source of truth for the use_pallas='never'/'always'/'auto' gate
from evo_tpu.layers.hyena import _pallas_enabled as _use_pallas  # noqa: E402


# ---------------------------------------------------------------------------
# Initialization
# ---------------------------------------------------------------------------

def init_params(rng: jax.Array, cfg: ModelConfig) -> Params:
    """Random-init parameter pytree (shapes = checkpoint schema)."""
    pd = _dtype(cfg.param_dtype)
    D, V = cfg.hidden_size, cfg.padded_vocab_size
    I = cfg.inner_mlp_size_actual
    K = cfg.short_filter_length
    S = cfg.state_size

    def dense(key, fan_in, shape):
        return (jax.random.normal(key, shape, jnp.float32) /
                jnp.sqrt(jnp.float32(fan_in))).astype(pd)

    k_top, k_layers = jax.random.split(rng)
    keys = iter(jax.random.split(k_top, 4))
    layer_keys = jax.random.split(k_layers, cfg.num_layers)

    params: Params = {
        'embedding': (jax.random.normal(next(keys), (V, D), jnp.float32)
                      * 0.02).astype(pd),
    }
    if cfg.final_norm:
        params['final_norm'] = jnp.ones((D,), pd)
    if not cfg.tie_embeddings:
        params['unembed'] = (jax.random.normal(next(keys), (V, D),
                                               jnp.float32) * 0.02).astype(pd)

    def mlp_block(key):
        k1, k2, k3 = jax.random.split(key, 3)
        return {
            'w1': dense(k1, D, (D, I)),
            'w2': dense(k2, D, (D, I)),
            'w3': dense(k3, I, (I, D)),
        }

    def attn_block(key):
        H, Dh = cfg.num_attention_heads, cfg.head_dim
        k_qkv, k_o, k_mlp = jax.random.split(key, 3)
        attn = {
            # TP-first layouts: streams/heads explicit (layers/attention.py)
            'wqkv': dense(k_qkv, D, (D, 3, H, Dh)),
            'wo': dense(k_o, D, (H, Dh, D)),
        }
        if cfg.qkv_proj_bias:
            attn['bqkv'] = jnp.zeros((3, H, Dh), pd)
        if cfg.mha_out_proj_bias:
            attn['bo'] = jnp.zeros((D,), pd)
        return {
            'pre_norm': jnp.ones((D,), pd),
            'post_norm': jnp.ones((D,), pd),
            'attn': attn,
            'mlp': mlp_block(k_mlp),
        }

    def hyena_block(key):
        k_in, k_fir, k_pole, k_res, k_ang, k_out, k_mlp = \
            jax.random.split(key, 7)
        # poles inside the unit disk: log-uniform magnitude, uniform phase
        mag = jax.random.uniform(k_pole, (D, S), jnp.float32, 0.6, 0.99)
        ang = jax.random.uniform(k_ang, (D, S), jnp.float32,
                                 -3.14159, 3.14159)
        poles = jnp.stack([mag * jnp.cos(ang), mag * jnp.sin(ang)], axis=-1)
        hy = {
            # (D, 3, C): streams axis explicit (layers/hyena.py)
            'w_in': dense(k_in, D, (D, 3, D)),
            'fir_w': (jax.random.normal(k_fir, (3, D, K), jnp.float32)
                      / jnp.sqrt(jnp.float32(K))).astype(pd),
            'poles': poles,          # float32 always
            'residues': (jax.random.normal(k_res, (D, S, 2), jnp.float32)
                         / S),       # float32 always
            'd_skip': jnp.ones((D,), pd),
            'w_out': dense(k_out, D, (D, D)),
        }
        if cfg.hyena_proj_bias:
            hy['b_in'] = jnp.zeros((3, D), pd)
        if cfg.short_filter_bias:
            hy['fir_b'] = jnp.zeros((3, D), pd)
        if cfg.hyena_out_proj_bias:
            hy['b_out'] = jnp.zeros((D,), pd)
        return {
            'pre_norm': jnp.ones((D,), pd),
            'post_norm': jnp.ones((D,), pd),
            'hyena': hy,
            'mlp': mlp_block(k_mlp),
        }

    segments = []
    for kind, idxs in cfg.layer_segments():
        if kind == 'attn':
            segments.append(attn_block(layer_keys[idxs[0]]))
        else:
            # stacked run: leading axis = layers in the run, so the whole
            # run executes as one lax.scan (compile time O(1) in depth)
            stack = jax.tree_util.tree_map(
                lambda *xs: jnp.stack(xs),
                *[hyena_block(layer_keys[li]) for li in idxs])
            segments.append({'stack': stack})
    params['segments'] = segments
    return params


def layer_blocks(params: Params, cfg: ModelConfig):
    """Per-layer (unstacked) view of the segment param tree, in layer order.

    Hyena runs are stored stacked (leading scan axis); this slices them back
    out for tooling/tests that want the reference's per-layer structure.
    """
    out = [None] * cfg.num_layers
    for (kind, idxs), seg in zip(cfg.layer_segments(), params['segments']):
        if kind == 'attn':
            out[idxs[0]] = seg
        else:
            for j, li in enumerate(idxs):
                out[li] = jax.tree_util.tree_map(lambda x, _j=j: x[_j],
                                                 seg['stack'])
    return out


def param_count(params: Params) -> int:
    return sum(x.size for x in jax.tree_util.tree_leaves(params))


# ---------------------------------------------------------------------------
# Decode cache
# ---------------------------------------------------------------------------

def init_cache(cfg: ModelConfig, batch: int, max_len: int,
               dtype: Optional[str] = None) -> Params:
    """Allocate the decode-state pytree.

    Mirrors reference `initialize_inference_params()`
    (`evo/generation.py:105-120`): KV buffers for attention layers, FIR tail
    + modal state for Hyena layers, and one scalar `offset` standing in for
    both `seqlen_offset`s.
    """
    cd = _dtype(dtype or cfg.compute_dtype)
    D = cfg.hidden_size
    H, Dh = cfg.num_attention_heads, cfg.head_dim
    K, S = cfg.short_filter_length, cfg.state_size
    layers = []
    for kind, idxs in cfg.layer_segments():
        if kind == 'attn':
            if cfg.kv_quant == 'int8':
                # int8 KV + per-(position, head) f32 scales
                # (layers/attention.py:kv_quantize): halves the
                # long-context cache bytes AND the per-decode-step cache
                # reads (opt-in; docs/serving.md). DECODE-OPTIMIZED
                # (B, H, T, Dh) layout — time axis 2, not 1: decode is
                # DMA-bound and streams each head's (T, Dh) slab
                # contiguously (the (B, T, H, Dh) layout's per-head reads
                # are 128-byte strided and measured ~2x slower end-to-end
                # on the 123k-offset decode bench).
                layers.append({
                    'k': jnp.zeros((batch, H, max_len, Dh), jnp.int8),
                    'v': jnp.zeros((batch, H, max_len, Dh), jnp.int8),
                    'ks': jnp.zeros((batch, H, max_len), jnp.float32),
                    'vs': jnp.zeros((batch, H, max_len), jnp.float32),
                })
            else:
                layers.append({
                    'k': jnp.zeros((batch, max_len, H, Dh), cd),
                    'v': jnp.zeros((batch, max_len, H, Dh), cd),
                })
        else:
            # stacked run: leading axis = layers in the run (matches the
            # params['segments'][i]['stack'] layout / lax.scan xs)
            n = len(idxs)
            layers.append(HyenaState(
                fir=jnp.zeros((n, batch, 3, D, K - 1), cd),
                iir=jnp.zeros((n, batch, D, S, 2), jnp.float32),
            ))
    return {'offset': jnp.zeros((), jnp.int32), 'layers': layers}


# ---------------------------------------------------------------------------
# Forward passes
# ---------------------------------------------------------------------------

def _embed(params: Params, cfg: ModelConfig, ids: jax.Array) -> jax.Array:
    """Token embedding as a one-hot matmul.

    TPU-idiomatic: with a 512-row table the one-hot contraction rides the
    MXU, is exact (a single 1.0 per row), and — unlike a gather — has
    unambiguous GSPMD sharding propagation under (dp, tp) meshes.
    """
    cd = _dtype(cfg.compute_dtype)
    w = params['embedding']
    onehot = jax.nn.one_hot(ids, w.shape[0], dtype=cd)
    return onehot @ w.astype(cd)


def _norm(x: jax.Array, w: jax.Array, cfg: ModelConfig,
          mesh=None) -> jax.Array:
    """RMSNorm dispatch: Pallas fused kernel on single-chip TPU long-row
    paths, jnp `rmsnorm` everywhere else.

    The norms sit on the SERIAL critical path (residual -> norm -> matmul:
    nothing for XLA to overlap them with), so the fused single-VMEM-pass
    kernel is the one elementwise Pallas win that survives at model level:
    measured -18.6 ms on the 7B B=1 L=8192 prefill step (809.1 -> 790.5
    ms, +2.3% tokens/s, interleaved A/B 2026-08-20) where the isolated
    mixer/prefix kernels were step-neutral. Gated off under a mesh
    (pallas_call has no GSPMD partitioning rule) and for short rows
    (decode: launch overhead beats the saved HBM pass; the `rmsnorm`
    f32-stats numerics are identical up to rsqrt rounding, inside the
    1e-3 parity budget). Follows `use_pallas` exactly like the flash
    attention kernel — so training configs (which need VJPs) keep
    setting use_pallas='never' and are unaffected.
    """
    rows = 1
    for s in x.shape[:-1]:
        rows *= s
    if _use_pallas(cfg) and mesh is None and rows >= 256:
        from evo_tpu.ops.pallas_rmsnorm import rmsnorm_pallas
        return rmsnorm_pallas(x, w, cfg.eps)
    return rmsnorm(x, w, cfg.eps)


def _unembed(params: Params, cfg: ModelConfig, x: jax.Array,
             mesh=None) -> jax.Array:
    if cfg.final_norm:
        x = _norm(x, params['final_norm'], cfg, mesh)
    w = params.get('unembed', params['embedding'])
    # vocab is tiny (512): do the logit matmul in float32 for parity
    logits = x.astype(jnp.float32) @ w.astype(jnp.float32).T
    return logits[..., :cfg.vocab_size]


def _attn_block_full(blk: Params, x: jax.Array, *, cfg: ModelConfig,
                     up: bool, mesh=None) -> jax.Array:
    """One pre-norm residual attention block, full-sequence path."""
    h = _norm(x, blk['pre_norm'], cfg, mesh)
    mix, _ = mha_full(blk['attn'], cfg, h, use_pallas=up, mesh=mesh)
    x = x + mix
    return x + gated_mlp(blk['mlp'], _norm(x, blk['post_norm'], cfg, mesh),
                         cfg.mlp_activation,
                         act_quant=cfg.act_quant == 'int8')


def _hyena_block_full(lp: Params, x: jax.Array, *, cfg: ModelConfig,
                      mesh=None) -> jax.Array:
    h = _norm(x, lp['pre_norm'], cfg, mesh)
    mix, _ = hyena_full(lp['hyena'], cfg, h, mesh=mesh)
    x = x + mix
    return x + gated_mlp(lp['mlp'], _norm(x, lp['post_norm'], cfg, mesh),
                         cfg.mlp_activation,
                         act_quant=cfg.act_quant == 'int8')


def forward(params: Params, cfg: ModelConfig, ids: jax.Array,
            mesh=None) -> jax.Array:
    """Plain batched forward: ids (B, L) int32 -> logits (B, L, vocab) f32.

    Matches reference `model(input_ids)` -> logits (`evo/scoring.py:81`).
    No padding mask, by design: the reference feeds right-padded batches with
    no mask and slices outputs afterwards (`evo/scoring.py:22-31, 93-96`) —
    replicated exactly (SURVEY.md §7 hard part #6).

    Hyena runs execute as `lax.scan` over the stacked segment params, so
    XLA compiles one Hyena block body per run (not one per layer).

    With `cfg.remat` each block is rematerialized on the backward pass
    (activation memory O(sqrt) for training / long-context scoring grads).
    """
    from evo_tpu.parallel.sharding import residual_constraint
    up = _use_pallas(cfg)
    # context parallelism: the residual stream lives seq-sharded on the cp
    # mesh axis (no-op on (dp, tp)-only meshes); mixers reshard internally
    x = residual_constraint(_embed(params, cfg, ids), mesh)
    for (kind, _idxs), seg in zip(cfg.layer_segments(), params['segments']):
        if kind == 'attn':
            block = functools.partial(_attn_block_full, cfg=cfg, up=up,
                                      mesh=mesh)
            if cfg.remat:
                block = jax.checkpoint(block)
            x = block(seg, x)
        else:
            def body(y, lp):
                return _hyena_block_full(lp, y, cfg=cfg, mesh=mesh), None
            if cfg.remat:
                body = jax.checkpoint(body)
            x, _ = jax.lax.scan(body, x, seg['stack'])
    return residual_constraint(_unembed(params, cfg, x, mesh), mesh)


def prefill(params: Params, cfg: ModelConfig, ids: jax.Array,
            cache: Params, mesh=None,
            resume: bool = False) -> Tuple[jax.Array, Params]:
    """Consume a full prompt, filling the decode cache.

    ids: (B, L). Returns (logits (B, L, vocab) f32, cache with offset
    advanced by L). Hyena layers run the chunked-conv prefill and hand off
    modal/FIR state (`prefill_style: fft`, config:37; SURVEY.md §7 hard
    part #1).

    resume=True continues from a non-empty cache (the reference's
    resumable `inference_params_dict` contract, `evo/generation.py:105-114`):
    attention attends over cached + new positions, rotary positions shift
    by the cache offset, and the Hyena conv is seeded with the carried
    FIR/modal state (exact, via the chunked conv's state carry).
    """
    from evo_tpu.parallel.sharding import residual_constraint
    up = _use_pallas(cfg)
    B, L = ids.shape
    offset = cache['offset'] if resume else 0
    x = residual_constraint(_embed(params, cfg, ids), mesh)
    new_layers = []
    for si, ((kind, _idxs), seg) in enumerate(
            zip(cfg.layer_segments(), params['segments'])):
        st = cache['layers'][si]
        if kind == 'attn':
            h = _norm(x, seg['pre_norm'], cfg, mesh)
            mix, kv = mha_full(seg['attn'], cfg, h, mesh=mesh,
                               offset=offset,
                               kv_buffers=st,
                               use_pallas=up, attend_buffer=resume)
            new_layers.append(kv)
            x = x + mix
            x = x + gated_mlp(seg['mlp'],
                              _norm(x, seg['post_norm'], cfg, mesh),
                              cfg.mlp_activation,
                         act_quant=cfg.act_quant == 'int8')
        else:
            def body(y, inp, _resume=resume):
                lp, s = inp
                h = _norm(y, lp['pre_norm'], cfg, mesh)
                mix, hst = hyena_full(
                    lp['hyena'], cfg, h, collect_state=True,
                    state=s if _resume else None, mesh=mesh)
                y = y + mix
                y = y + gated_mlp(lp['mlp'],
                                  _norm(y, lp['post_norm'], cfg, mesh),
                                  cfg.mlp_activation,
                         act_quant=cfg.act_quant == 'int8')
                return y, hst
            x, hst = jax.lax.scan(body, x, (seg['stack'], st))
            new_layers.append(hst)
    logits = residual_constraint(_unembed(params, cfg, x, mesh), mesh)
    return logits, {'offset': offset + jnp.asarray(L, jnp.int32),
                    'layers': new_layers}


def decode_step(params: Params, cfg: ModelConfig, token: jax.Array,
                cache: Params, mesh=None) -> Tuple[jax.Array, Params]:
    """One autoregressive step. token: (B,) or (B, 1) int32.

    Returns (logits (B, vocab) f32, updated cache). Reference semantics:
    feed only the last token, `seqlen_offset += 1` per step
    (`evo/generation.py:137-155`).

    mesh: only needed under `kv_quant` on a device mesh — the int8-KV
    decode attention runs a Pallas kernel that must be shard_mapped
    (no GSPMD rule); everything else decodes fine with GSPMD alone.
    """
    if token.ndim == 1:
        token = token[:, None]
    up = _use_pallas(cfg)
    offset = cache['offset']
    x = _embed(params, cfg, token)           # (B, 1, D)
    new_layers = []
    for si, ((kind, _idxs), seg) in enumerate(
            zip(cfg.layer_segments(), params['segments'])):
        st = cache['layers'][si]
        if kind == 'attn':
            h = _norm(x, seg['pre_norm'], cfg, mesh)
            mix, kv = mha_step(seg['attn'], cfg, h, st, offset,
                               use_pallas=up, mesh=mesh)
            new_layers.append(kv)
            x = x + mix
            x = x + gated_mlp(seg['mlp'],
                              _norm(x, seg['post_norm'], cfg, mesh),
                              cfg.mlp_activation,
                         act_quant=cfg.act_quant == 'int8')
        else:
            # Unrolled (static slices of the stack), NOT lax.scan: a
            # weight-scan nested inside the generation time-scan makes XLA
            # materialize padded copies of every stacked weight (~GBs,
            # OOM); static x[j] slices read the stack in place, and the
            # per-token bodies are small enough that 29 copies compile
            # quickly.
            new_states = []
            for j in range(len(_idxs)):
                lp = jax.tree_util.tree_map(lambda a, _j=j: a[_j],
                                            seg['stack'])
                s = jax.tree_util.tree_map(lambda a, _j=j: a[_j], st)
                h = _norm(x, lp['pre_norm'], cfg, mesh)
                mix, hst = hyena_step(lp['hyena'], cfg, h, s)
                x = x + mix
                x = x + gated_mlp(lp['mlp'],
                                  _norm(x, lp['post_norm'], cfg, mesh),
                                  cfg.mlp_activation,
                         act_quant=cfg.act_quant == 'int8')
                new_states.append(hst)
            new_layers.append(jax.tree_util.tree_map(
                lambda *xs: jnp.stack(xs), *new_states))
    logits = _unembed(params, cfg, x, mesh)[:, 0]
    return logits, {'offset': offset + 1, 'layers': new_layers}
