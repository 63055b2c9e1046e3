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


def _use_pallas(cfg: ModelConfig) -> bool:
    if cfg.use_pallas == 'never':
        return False
    if cfg.use_pallas == 'always':
        return True
    return jax.default_backend() == 'tpu'


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

    keys = iter(jax.random.split(rng, 16 + 16 * cfg.num_layers))

    def dense(key, fan_in, shape):
        return (jax.random.normal(key, shape, jnp.float32) /
                jnp.sqrt(jnp.float32(fan_in))).astype(pd)

    params: Params = {
        'embedding': (jax.random.normal(next(keys), (V, D), jnp.float32)
                      * 0.02).astype(pd),
    }
    if cfg.final_norm:
        params['final_norm'] = jnp.ones((D,), pd)
    if not cfg.tie_embeddings:
        params['unembed'] = (jax.random.normal(next(keys), (V, D),
                                               jnp.float32) * 0.02).astype(pd)

    blocks = []
    for li in range(cfg.num_layers):
        blk: Params = {
            'pre_norm': jnp.ones((D,), pd),
            'post_norm': jnp.ones((D,), pd),
            'mlp': {
                'w1': dense(next(keys), D, (D, I)),
                'w2': dense(next(keys), D, (D, I)),
                'w3': dense(next(keys), I, (I, D)),
            },
        }
        if cfg.is_attn_layer(li):
            H, Dh = cfg.num_attention_heads, cfg.head_dim
            attn = {
                # TP-first layouts: streams/heads explicit (layers/attention.py)
                'wqkv': dense(next(keys), D, (D, 3, H, Dh)),
                'wo': dense(next(keys), D, (H, Dh, D)),
            }
            if cfg.qkv_proj_bias:
                attn['bqkv'] = jnp.zeros((3, H, Dh), pd)
            if cfg.mha_out_proj_bias:
                attn['bo'] = jnp.zeros((D,), pd)
            blk['attn'] = attn
        else:
            k_pole, k_res, k_ang = jax.random.split(next(keys), 3)
            # poles inside the unit disk: log-uniform magnitude, uniform phase
            mag = jax.random.uniform(k_pole, (D, S), jnp.float32, 0.6, 0.99)
            ang = jax.random.uniform(k_ang, (D, S), jnp.float32,
                                     -3.14159, 3.14159)
            poles = jnp.stack([mag * jnp.cos(ang), mag * jnp.sin(ang)],
                              axis=-1)
            residues = (jax.random.normal(k_res, (D, S, 2), jnp.float32)
                        / S)
            hy = {
                # (D, 3, C): streams axis explicit (layers/hyena.py)
                'w_in': dense(next(keys), D, (D, 3, D)),
                'fir_w': (jax.random.normal(next(keys), (3, D, K),
                                            jnp.float32) / jnp.sqrt(
                    jnp.float32(K))).astype(pd),
                'poles': poles,          # float32 always
                'residues': residues,    # float32 always
                'd_skip': jnp.ones((D,), pd),
                'w_out': dense(next(keys), D, (D, D)),
            }
            if cfg.hyena_proj_bias:
                hy['b_in'] = jnp.zeros((3, D), pd)
            if cfg.short_filter_bias:
                hy['fir_b'] = jnp.zeros((3, D), pd)
            if cfg.hyena_out_proj_bias:
                hy['b_out'] = jnp.zeros((D,), pd)
            blk['hyena'] = hy
        blocks.append(blk)
    params['blocks'] = blocks
    return params


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
    for li in range(cfg.num_layers):
        if cfg.is_attn_layer(li):
            layers.append({
                'k': jnp.zeros((batch, max_len, H, Dh), cd),
                'v': jnp.zeros((batch, max_len, H, Dh), cd),
            })
        else:
            layers.append(HyenaState(
                fir=jnp.zeros((batch, 3, D, K - 1), cd),
                iir=jnp.zeros((batch, D, S, 2), jnp.float32),
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


def _unembed(params: Params, cfg: ModelConfig, x: jax.Array) -> jax.Array:
    if cfg.final_norm:
        x = rmsnorm(x, params['final_norm'], cfg.eps)
    w = params.get('unembed', params['embedding'])
    # vocab is tiny (512): do the logit matmul in float32 for parity
    logits = x.astype(jnp.float32) @ w.astype(jnp.float32).T
    return logits[..., :cfg.vocab_size]


def _block_full(blk: Params, x: jax.Array, *, cfg: ModelConfig, li: int,
                up: bool, mesh=None) -> jax.Array:
    """One pre-norm residual block, full-sequence path."""
    h = rmsnorm(x, blk['pre_norm'], cfg.eps)
    if cfg.is_attn_layer(li):
        mix, _ = mha_full(blk['attn'], cfg, h, use_pallas=up)
    else:
        mix, _ = hyena_full(blk['hyena'], cfg, h, mesh=mesh)
    x = x + mix
    return x + gated_mlp(blk['mlp'], rmsnorm(x, blk['post_norm'], cfg.eps),
                         cfg.mlp_activation)


def forward(params: Params, cfg: ModelConfig, ids: jax.Array,
            mesh=None) -> jax.Array:
    """Plain batched forward: ids (B, L) int32 -> logits (B, L, vocab) f32.

    Matches reference `model(input_ids)` -> logits (`evo/scoring.py:81`).
    No padding mask, by design: the reference feeds right-padded batches with
    no mask and slices outputs afterwards (`evo/scoring.py:22-31, 93-96`) —
    replicated exactly (SURVEY.md §7 hard part #6).

    With `cfg.remat` each block is rematerialized on the backward pass
    (activation memory O(sqrt) for training / long-context scoring grads).
    """
    up = _use_pallas(cfg)
    x = _embed(params, cfg, ids)
    for li, blk in enumerate(params['blocks']):
        def block(b, y, _li=li):
            return _block_full(b, y, cfg=cfg, li=_li, up=up, mesh=mesh)
        if cfg.remat:
            block = jax.checkpoint(block)
        x = block(blk, x)
    return _unembed(params, cfg, x)


def prefill(params: Params, cfg: ModelConfig, ids: jax.Array,
            cache: Params, mesh=None,
            resume: bool = False) -> Tuple[jax.Array, Params]:
    """Consume a full prompt, filling the decode cache.

    ids: (B, L). Returns (logits (B, L, vocab) f32, cache with offset
    advanced by L). Hyena layers run the FFT path and hand off modal/FIR
    state (`prefill_style: fft`, config:37; SURVEY.md §7 hard part #1).

    resume=True continues from a non-empty cache (the reference's
    resumable `inference_params_dict` contract, `evo/generation.py:105-114`):
    attention attends over cached + new positions, rotary positions shift
    by the cache offset, and the Hyena conv is seeded with the carried
    FIR/modal state (exact, via the chunked conv's state carry).
    """
    up = _use_pallas(cfg)
    B, L = ids.shape
    offset = cache['offset'] if resume else 0
    x = _embed(params, cfg, ids)
    new_layers = []
    for li, blk in enumerate(params['blocks']):
        h = rmsnorm(x, blk['pre_norm'], cfg.eps)
        if cfg.is_attn_layer(li):
            st = cache['layers'][li]
            mix, kv = mha_full(blk['attn'], cfg, h, offset=offset,
                               kv_buffers=(st['k'], st['v']),
                               use_pallas=up, attend_buffer=resume)
            new_layers.append({'k': kv[0], 'v': kv[1]})
        else:
            mix, hst = hyena_full(
                blk['hyena'], cfg, h, collect_state=True, mesh=mesh,
                state=cache['layers'][li] if resume else None)
            new_layers.append(hst)
        x = x + mix
        x = x + gated_mlp(blk['mlp'], rmsnorm(x, blk['post_norm'], cfg.eps),
                          cfg.mlp_activation)
    logits = _unembed(params, cfg, x)
    return logits, {'offset': offset + jnp.asarray(L, jnp.int32),
                    'layers': new_layers}


def decode_step(params: Params, cfg: ModelConfig, token: jax.Array,
                cache: Params) -> Tuple[jax.Array, Params]:
    """One autoregressive step. token: (B,) or (B, 1) int32.

    Returns (logits (B, vocab) f32, updated cache). Reference semantics:
    feed only the last token, `seqlen_offset += 1` per step
    (`evo/generation.py:137-155`).
    """
    if token.ndim == 1:
        token = token[:, None]
    offset = cache['offset']
    x = _embed(params, cfg, token)           # (B, 1, D)
    new_layers = []
    for li, blk in enumerate(params['blocks']):
        h = rmsnorm(x, blk['pre_norm'], cfg.eps)
        if cfg.is_attn_layer(li):
            st = cache['layers'][li]
            mix, kv = mha_step(blk['attn'], cfg, h, (st['k'], st['v']),
                               offset)
            new_layers.append({'k': kv[0], 'v': kv[1]})
        else:
            mix, hst = hyena_step(blk['hyena'], cfg, h, cache['layers'][li])
            new_layers.append(hst)
        x = x + mix
        x = x + gated_mlp(blk['mlp'], rmsnorm(x, blk['post_norm'], cfg.eps),
                          cfg.mlp_activation)
    logits = _unembed(params, cfg, x)[:, 0]
    return logits, {'offset': offset + 1, 'layers': new_layers}
