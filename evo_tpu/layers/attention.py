"""Rotary multi-head attention (the 3 of 32 layers at `attn_layer_idxs:
[8, 16, 24]`, `evo/configs/evo-1-8k-base_inference.yml:5`).

Reference: flash_attn MHA with rotary, qkv_proj_bias / mha_out_proj_bias True
(config:26-27), 32 heads x head_dim 128, causal. Here: fused QKV projection,
NeoX rotary (with linear interpolation for 131k), causal SDPA with float32
softmax. The Pallas flash-attention kernel (evo_tpu.ops.pallas_attention)
replaces the naive core on TPU behind `sdpa_causal`'s dispatch.

KV cache protocol (mirrors reference `inference_params_dict['mha']`,
`evo/generation.py:105-148`): preallocated (B, T_max, H, Dh) key/value
buffers written at `offset`; decode attends over the full buffer with a
position mask so shapes stay static under jit.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from evo_tpu.config import ModelConfig
from evo_tpu.layers.rotary import apply_rotary, rotary_cos_sin
from evo_tpu.quant import is_int4, qdot, wcast


def _qkv(p, cfg: ModelConfig, x):
    """Fused QKV projection.

    Weight layout is (D, 3, H, Dh) — the three streams and the head axis are
    explicit so TP sharding along H (`parallel/sharding.py`) is a pure
    Megatron column split with no stream-boundary crossings. (Checkpoint
    layout (3D, D) is re-shaped at conversion, checkpoint.py.)
    """
    if cfg.act_quant == 'int8' or is_int4(p['wqkv']):
        qkv = qdot(x, p['wqkv'])
    else:
        qkv = jnp.einsum('bld,dthe->blthe', x,
                         wcast(p['wqkv'], x.dtype))
    if 'bqkv' in p:
        qkv = qkv + p['bqkv'].astype(x.dtype)
    if 'lora_wqkv' in p:
        # LoRA side path (evo_tpu/lora.py): (x @ A) @ B lands directly in
        # the (B, L, 3, H, Dh) layout
        from evo_tpu.lora import delta1
        qkv = qkv + delta1(x, p['lora_wqkv']).astype(qkv.dtype)
    return qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]


def _rotate(cfg: ModelConfig, q, k, offset):
    """offset: scalar (shared across the batch) or (B,) per-row offsets
    (continuous-batching decode, evo_tpu.serving)."""
    L = q.shape[1]
    pos = jnp.arange(L, dtype=jnp.int32)
    if getattr(offset, 'ndim', 0) == 1:
        positions = pos[None, :] + offset[:, None]     # (B, L)
    else:
        positions = pos + offset
    scaling = (cfg.rotary_emb_scaling_factor
               if cfg.use_interpolated_rotary_pos_emb else 1.0)
    cos, sin = rotary_cos_sin(positions, cfg.head_dim, cfg.rotary_base,
                              scaling)
    return apply_rotary(q, cos, sin), apply_rotary(k, cos, sin)


def sdpa_causal(q, k, v, *, use_pallas: bool = False, mesh=None):
    """Causal self-attention. q,k,v: (B, L, H, Dh). float32 softmax.

    With a mesh, the Pallas kernel runs inside `shard_map` (batch on dp,
    heads on tp) — pallas_call has no GSPMD partitioning rule, so leaving
    it to the SPMD partitioner would replicate the full attention input.
    """
    if use_pallas:
        from evo_tpu.ops.pallas_attention import flash_attention_causal
        if mesh is None:
            return flash_attention_causal(q, k, v)
        from jax.sharding import PartitionSpec as P

        from evo_tpu.parallel.mesh import channel_axes
        spec = P('dp', None, channel_axes(mesh), None)
        fn = jax.shard_map(
            lambda a, b, c: flash_attention_causal(a, b, c),
            mesh=mesh, in_specs=(spec, spec, spec), out_specs=spec,
            check_vma=False)
        return fn(q, k, v)
    B, L, H, Dh = q.shape
    if L > _DENSE_ATTN_MAX:
        # the dense (L, L) score matrix is quadratic in L (131k would be
        # terabytes); past this size the flash-style chunked core is the
        # only feasible non-Pallas form. Same f32-softmax numerics.
        return chunked_sdpa_causal(q, k, v)
    scale = 1.0 / jnp.sqrt(jnp.float32(Dh))
    s = jnp.einsum('blhd,bmhd->bhlm', q.astype(jnp.float32),
                   k.astype(jnp.float32),
                   preferred_element_type=jnp.float32) * scale
    mask = jnp.tril(jnp.ones((L, L), dtype=bool))
    s = jnp.where(mask[None, None], s, -jnp.inf)
    a = jax.nn.softmax(s, axis=-1)
    y = jnp.einsum('bhlm,bmhd->blhd', a, v.astype(jnp.float32),
                   preferred_element_type=jnp.float32)
    return y.astype(q.dtype)


# largest L the dense O(L^2) score materialization is allowed for; above
# this `sdpa_causal` dispatches to the chunked flash-style core (at 7B
# H=32 the dense f32 scores are 0.5 GB at L=2048 but 8.6 GB at L=8192)
_DENSE_ATTN_MAX = 2048
_KVQ_FALLBACK_WARNED: list = []
# python float, NOT jnp.float32(...): a module-level jnp constant would
# initialize the XLA backend at import time, which breaks
# jax.distributed.initialize ordering for every CLI entry point
_NEG = -1e30


def chunked_sdpa_causal(q, k, v, *, block: int = 512):
    """Causal self-attention with flash-style online softmax in pure lax:
    O(L * block) memory instead of the dense O(L^2) score matrix.

    This is the long-context attention core for every context where the
    Pallas kernel is unavailable — CPU / virtual-mesh runs, and the local
    per-device body of Ulysses context parallelism at 131k (the all_to_all
    hands each device the FULL sequence for its head group; a dense core
    there needs L^2 * H_local * 4 bytes, which is what pushed the r3
    131k-config compile to 15 GB/device temps). Key blocks strictly above
    the causal diagonal are skipped with `lax.cond`, so compute is
    near-causal-optimal, not 2x. Matches `sdpa_causal` dense numerics
    (f32 accumulation; tests/test_pallas_attention.py).
    """
    B, L, H, Dh = q.shape
    pad = (-L) % block
    if pad:
        zw = ((0, 0), (0, pad), (0, 0), (0, 0))
        q = jnp.pad(q, zw)
        k = jnp.pad(k, zw)
        v = jnp.pad(v, zw)
    Lp = L + pad
    n = Lp // block
    scale = 1.0 / (Dh ** 0.5)
    # (n, B, block, H, Dh) — scan-major block axes
    qb = jnp.moveaxis(q.reshape(B, n, block, H, Dh), 1, 0)
    kb = jnp.moveaxis(k.reshape(B, n, block, H, Dh), 1, 0)
    vb = jnp.moveaxis(v.reshape(B, n, block, H, Dh), 1, 0)
    kv_valid = (jnp.arange(Lp) < L).reshape(n, block)
    rng = jnp.arange(block, dtype=jnp.int32)

    def q_block(qi, q_i):
        q32 = q_i.astype(jnp.float32) * scale

        def body(carry, inp):
            kj, k_j, v_j, valid_j = inp

            def compute(carry):
                m, l, acc = carry
                s = jnp.einsum('blhd,bmhd->bhlm', q32,
                               k_j.astype(jnp.float32),
                               preferred_element_type=jnp.float32)
                mask = ((kj * block + rng)[None, :]
                        <= (qi * block + rng)[:, None]) & valid_j[None, :]
                s = jnp.where(mask[None, None], s, _NEG)
                m_new = jnp.maximum(m, jnp.max(s, axis=-1))
                p = jnp.exp(s - m_new[..., None])
                alpha = jnp.exp(m - m_new)
                l_new = l * alpha + jnp.sum(p, axis=-1)
                acc_new = acc * alpha[..., None] + jnp.einsum(
                    'bhlm,bmhd->bhld', p, v_j.astype(jnp.float32),
                    preferred_element_type=jnp.float32)
                return m_new, l_new, acc_new

            return jax.lax.cond(kj <= qi, compute, lambda c: c, carry), ()

        init = (jnp.full((B, H, block), -jnp.inf, jnp.float32),
                jnp.zeros((B, H, block), jnp.float32),
                jnp.zeros((B, H, block, Dh), jnp.float32))
        (m, l, acc), _ = jax.lax.scan(
            body, init, (jnp.arange(n, dtype=jnp.int32), kb, vb, kv_valid))
        out = acc / jnp.maximum(l[..., None], 1e-30)
        return jnp.swapaxes(out, 1, 2)          # (B, block, H, Dh)

    def outer(_, inp):
        qi, q_i = inp
        return None, q_block(qi, q_i)

    _, ob = jax.lax.scan(outer, None,
                         (jnp.arange(n, dtype=jnp.int32), qb))
    out = jnp.moveaxis(ob, 0, 1).reshape(B, Lp, H, Dh)[:, :L]
    return out.astype(q.dtype)


def _out(p, x_dtype, y, mesh=None, act_quant: bool = False):
    # wo: (H, Dh, D) — head axis explicit for TP row sharding
    if act_quant or is_int4(p['wo']):
        o = qdot(y, p['wo'], nc=2)
    else:
        o = jnp.einsum('blhe,hed->bld', y, wcast(p['wo'], x_dtype))
    if 'bo' in p:
        o = o + p['bo'].astype(x_dtype)
    if 'lora_wo' in p:
        from evo_tpu.lora import delta2
        o = o + delta2(y, p['lora_wo']).astype(o.dtype)
    from evo_tpu.parallel.mesh import has_cp
    if has_cp(mesh):
        from evo_tpu.parallel.sharding import residual_constraint
        o = residual_constraint(o, mesh)
    return o


def _kv_norm(kv):
    """Normalize a KV-cache argument to the dict form.

    Accepts the layer cache dict ({'k','v'[, 'ks','vs']}) or the legacy
    (k_buf, v_buf) tuple. Returns (dict, was_tuple)."""
    if kv is None:
        return None, False
    if isinstance(kv, dict):
        return kv, False
    return {'k': kv[0], 'v': kv[1]}, True


def _kv_denorm(st, was_tuple):
    return (st['k'], st['v']) if was_tuple else st


def kv_quantize(x):
    """Symmetric int8 KV quantization, per (batch, position, head):
    x (..., Dh) -> (q int8 same shape, scales f32 (...,)).

    The opt-in `kv_quant: int8` cache mode (docs/serving.md): at 131k
    context the bf16 attention KV is 6.4 GB — comparable to the int8
    weight bytes — and decode reads all of it every step, so halving KV
    bytes moves the long-context decode roofline the same way int8
    weights move the short-context one. Scales are per-position/head so
    a single outlier position cannot poison the whole buffer."""
    x32 = x.astype(jnp.float32)
    s = jnp.maximum(jnp.max(jnp.abs(x32), axis=-1) / 127.0,
                    jnp.float32(1e-12))
    q = jnp.clip(jnp.round(x32 / s[..., None]), -127, 127).astype(jnp.int8)
    return q, s


def _kvq_write(buf, new, offset):
    """Write position-major new values ((B, L, H, Dh) data or (B, L, H)
    scales, fresh from `kv_quantize`) into a HEAD-MAJOR quantized cache
    buffer ((B, H, T, Dh) / (B, H, T); time axis 2 — decode streams each
    head's slab contiguously) at `offset` along time. Scalar or (B,)
    per-slot offsets."""
    new = jnp.swapaxes(new, 1, 2).astype(buf.dtype)
    if getattr(offset, 'ndim', 0) == 1:
        return jax.vmap(
            lambda b, n, o: jax.lax.dynamic_update_slice(
                b, n, (0, o) + (0,) * (b.ndim - 2)))(buf, new, offset)
    return jax.lax.dynamic_update_slice(
        buf, new, (0, 0, offset) + (0,) * (buf.ndim - 3))


def _cp_reshard_qkv(cfg: ModelConfig, mesh, q, k, v):
    """Pin q/k/v to the context-parallel attention layout: sequence on cp,
    heads on tp (all modes). This is the layout the QKV einsum produces
    naturally from a seq-sharded residual (x on cp, wqkv head-sharded on
    tp), so the constraint inserts no collective; the cp ops then move
    data explicitly (all_to_all for Ulysses, ppermute for ring/zigzag).
    """
    from jax.sharding import NamedSharding, PartitionSpec as P

    s = NamedSharding(mesh, P('dp', 'cp', 'tp', None))
    return (jax.lax.with_sharding_constraint(q, s),
            jax.lax.with_sharding_constraint(k, s),
            jax.lax.with_sharding_constraint(v, s))


def _cp_attend(cfg: ModelConfig, mesh, q, k, v, use_pallas: bool):
    if cfg.cp_attn == 'ulysses':
        from evo_tpu.ops.ulysses_attention import ulysses_attention
        cp, tp = mesh.shape['cp'], mesh.shape['tp']
        B, L, H, Dh = q.shape
        if H % tp == 0 and (H // tp) % cp == 0 and L % cp == 0:
            return ulysses_attention(q, k, v, mesh, axis_name='cp',
                                     batch_axis='dp', head_axis='tp',
                                     use_pallas=use_pallas)
        # indivisible heads/length: dense GSPMD fallback (gathers seq)
        return sdpa_causal(q, k, v, use_pallas=use_pallas, mesh=mesh)
    from evo_tpu.ops.ring_attention import (ring_attention,
                                            zigzag_ring_attention)
    fn = (zigzag_ring_attention if cfg.cp_attn == 'zigzag'
          else ring_attention)
    return fn(q, k, v, mesh, axis_name='cp', batch_axis='dp',
              head_axis='tp', use_pallas=use_pallas)


def mha_full(p, cfg: ModelConfig, x, *, mesh=None, offset=0,
             kv_buffers=None,
             use_pallas: bool = False, attend_buffer: bool = False):
    """Full-sequence causal attention (prefill / scoring path).

    kv_buffers: the layer's KV cache — either the cache dict
    ({'k','v'} bf16, or {'k','v','ks','vs'} for the int8 `kv_quant`
    mode) or the legacy (k_buf, v_buf) tuple. Returns (y, cache') with
    k/v written at [offset, offset+L) when buffers were provided (else
    None), in the same form they came in.

    attend_buffer=True is the *continued*-prefill path (offset may be a
    traced value): queries attend over the whole static buffer with the
    mask `key_pos <= offset + query_pos`, covering all previously cached
    positions plus the causal prefix of the new block (the unwritten tail
    is masked out). The default path attends only within the new block
    (fresh prefill; flash kernel eligible) — under `kv_quant` the fresh
    block attends over the UNQUANTIZED k/v, so fresh-prefill numerics are
    untouched and quantization error enters only on buffer readback.
    """
    from evo_tpu.parallel.mesh import has_cp
    q, k, v = _qkv(p, cfg, x)
    q, k = _rotate(cfg, q, k, offset)
    if has_cp(mesh):
        q, k, v = _cp_reshard_qkv(cfg, mesh, q, k, v)

    def attend(q, k, v):
        if has_cp(mesh):
            return _cp_attend(cfg, mesh, q, k, v, use_pallas)
        return sdpa_causal(q, k, v, use_pallas=use_pallas, mesh=mesh)

    if kv_buffers is None:
        return _out(p, x.dtype, attend(q, k, v), mesh,
                    act_quant=cfg.act_quant == 'int8'), None

    st, was_tuple = _kv_norm(kv_buffers)
    quantized = 'ks' in st
    if quantized:
        kq, ksn = kv_quantize(k)
        vq, vsn = kv_quantize(v)
        st = {'k': _kvq_write(st['k'], kq, offset),
              'v': _kvq_write(st['v'], vq, offset),
              'ks': _kvq_write(st['ks'], ksn, offset),
              'vs': _kvq_write(st['vs'], vsn, offset)}
    else:
        st = {'k': _kv_write(st['k'], k, offset),
              'v': _kv_write(st['v'], v, offset)}
    k_buf, v_buf = st['k'], st['v']
    if not attend_buffer:
        return _out(p, x.dtype, attend(q, k, v), mesh,
                    act_quant=cfg.act_quant == 'int8'), \
            _kv_denorm(st, was_tuple)

    B, L, H, Dh = q.shape
    T = k_buf.shape[2] if quantized else k_buf.shape[1]
    if use_pallas and not has_cp(mesh):
        from evo_tpu.ops.pallas_attention import (flash_attention_buffer,
                                                  flash_buffer_supported)
        if flash_buffer_supported(T):
            # Pallas segment-vs-buffer flash kernel: MXU dots + block-skip
            # on the traced offset. Needs a 1024-aligned buffer (the
            # segmented scorers allocate one); otherwise the jnp online
            # softmax below is the exact fallback. Under a (dp, tp) mesh
            # the kernel runs inside shard_map (batch on dp, heads on tp —
            # pallas_call has no GSPMD rule), same as sdpa_causal.
            # kv_quant buffers go through the int8 kernel variant
            # (in-VMEM dequant; HBM reads stay 1 byte/elem).
            ks_b = st.get('ks')
            vs_b = st.get('vs')
            if mesh is None:
                y = flash_attention_buffer(q, k_buf, v_buf, offset,
                                           ks_b, vs_b)
            else:
                from jax.sharding import PartitionSpec as P

                from evo_tpu.parallel.mesh import channel_axes
                ch = channel_axes(mesh)
                spec = P('dp', None, ch, None)
                if quantized:
                    qspec = P('dp', ch, None, None)   # head-major int8
                    sspec = P('dp', ch, None)
                    y = jax.shard_map(
                        lambda a, kk, vv, kss, vss, off:
                            flash_attention_buffer(a, kk, vv, off,
                                                   kss, vss),
                        mesh=mesh,
                        in_specs=(spec, qspec, qspec, sspec, sspec, P()),
                        out_specs=spec, check_vma=False,
                    )(q, k_buf, v_buf, ks_b, vs_b,
                      jnp.asarray(offset, jnp.int32))
                else:
                    y = jax.shard_map(
                        lambda a, kk, vv, off: flash_attention_buffer(
                            a, kk, vv, off),
                        mesh=mesh,
                        in_specs=(spec, spec, spec, P()),
                        out_specs=spec, check_vma=False,
                    )(q, k_buf, v_buf, jnp.asarray(offset, jnp.int32))
            return _out(p, x.dtype, y, mesh,
                        act_quant=cfg.act_quant == 'int8'), \
                _kv_denorm(st, was_tuple)
    scale = 1.0 / jnp.sqrt(jnp.float32(Dh))
    # online softmax over KV-buffer chunks: materializing the full
    # (B, H, L, T) score tensor is ~137 GB at T=131k — the exact workload
    # this resumed-prefill path exists for. The chunk size is bounded so
    # the per-chunk f32 score tensor stays ~128 MB: at 131k serving the
    # weights + KV buffers leave only ~2 GB of HBM headroom, and the
    # original C=2048 chunk (2.1 GB of scores at L=8192 segments) OOMed
    # a 16 GB chip. Dots run in the compute dtype with f32 accumulation
    # (bf16 on TPU — the same numerics as the flash kernel on the
    # fresh-prefill path; f32 under the CPU test configs).
    C = int(min(2048, max(256, (32 << 20) // max(1, B * H * L))))
    C = min(C, T)
    pad_t = (-T) % C
    t_axis = 2 if quantized else 1        # head-major quantized layout

    def padt(x):
        if not pad_t:
            return x
        pads = [(0, 0)] * x.ndim
        pads[t_axis] = (0, pad_t)
        return jnp.pad(x, pads)

    k_buf2, v_buf2 = padt(k_buf), padt(v_buf)
    if quantized:
        ks_buf2, vs_buf2 = padt(st['ks']), padt(st['vs'])
    n_chunks = (T + pad_t) // C
    row = jnp.arange(L)[:, None]

    def body(ci, carry):
        m_prev, l_prev, acc = carry
        ks = jax.lax.dynamic_slice_in_dim(k_buf2, ci * C, C, axis=t_axis)
        vs = jax.lax.dynamic_slice_in_dim(v_buf2, ci * C, C, axis=t_axis)
        if quantized:
            # in-chunk dequantize: HBM reads stay int8; the f32 chunk
            # temps are bounded by C like the score tensor below.
            # (B, H, C, Dh) -> position-major (B, C, H, Dh) to share the
            # einsums below (chunk-local transpose, C-bounded temps)
            kss = jax.lax.dynamic_slice_in_dim(ks_buf2, ci * C, C, axis=2)
            vss = jax.lax.dynamic_slice_in_dim(vs_buf2, ci * C, C, axis=2)
            ks = jnp.swapaxes(ks.astype(q.dtype)
                              * kss[..., None].astype(q.dtype), 1, 2)
            vs = jnp.swapaxes(vs.astype(q.dtype)
                              * vss[..., None].astype(q.dtype), 1, 2)
        s = jnp.einsum('blhd,bthd->bhlt', q, ks.astype(q.dtype),
                       preferred_element_type=jnp.float32) * scale
        col = ci * C + jnp.arange(C)[None, :]
        s = jnp.where((col <= offset + row)[None, None], s, -jnp.inf)
        m_new = jnp.maximum(m_prev, jnp.max(s, axis=-1))
        finite = jnp.isfinite(m_new)
        m_safe = jnp.where(finite, m_new, 0.0)
        pexp = jnp.where(finite[..., None],
                         jnp.exp(s - m_safe[..., None]), 0.0)
        alpha = jnp.where(finite, jnp.exp(m_prev - m_safe), 1.0)
        l_new = l_prev * alpha + jnp.sum(pexp, axis=-1)
        acc_new = acc * alpha[..., None] + jnp.einsum(
            'bhlt,bthd->bhld', pexp.astype(q.dtype), vs.astype(q.dtype),
            preferred_element_type=jnp.float32)
        return (jnp.where(finite, m_new, m_prev), l_new, acc_new)

    init = (jnp.full((B, H, L), -jnp.inf, jnp.float32),
            jnp.zeros((B, H, L), jnp.float32),
            jnp.zeros((B, H, L, Dh), jnp.float32))
    # chunks past offset + L are fully masked — skip them (offset is
    # traced, so a dynamic-trip-count fori_loop, not a static scan; at
    # 131k this halves the early segments' attention work)
    n_live = jnp.minimum(
        (offset + L + C - 1) // C, jnp.int32(n_chunks))
    m_f, l_f, acc = jax.lax.fori_loop(0, n_live, body, init)
    y = jnp.swapaxes(acc / jnp.maximum(l_f, 1e-30)[..., None],
                     1, 2).astype(q.dtype)
    return _out(p, x.dtype, y, mesh,
                act_quant=cfg.act_quant == 'int8'), \
        _kv_denorm(st, was_tuple)


def _kv_write(buf, new, offset):
    """Write new (B, L, ...) into buf at `offset` along time (axis 1): one
    dynamic_update_slice for a shared scalar offset, a vmapped per-row
    write (scatter) for (B,) per-slot offsets. Rank-generic so the int8
    KV data buffers (B, T, H, Dh) and their scale buffers (B, T, H) share
    one path."""
    if getattr(offset, 'ndim', 0) == 1:
        return jax.vmap(
            lambda b, n, o: jax.lax.dynamic_update_slice(
                b, n, (o,) + (0,) * (b.ndim - 1))
        )(buf, new.astype(buf.dtype), offset)
    return jax.lax.dynamic_update_slice(
        buf, new.astype(buf.dtype), (0, offset) + (0,) * (buf.ndim - 2))


def mha_step(p, cfg: ModelConfig, x_t, kv_buffers, offset,
             use_pallas: bool = False, mesh=None):
    """Single-token decode step.

    x_t: (B, 1, D); kv_buffers: the layer cache dict ({'k','v'} bf16 or
    {'k','v','ks','vs'} int8 `kv_quant` mode) or the legacy
    ((B, T, H, Dh), ...) tuple; offset: tokens already in the cache — a
    shared scalar, or a (B,) vector of per-slot offsets (continuous
    batching, evo_tpu.serving). Attends over positions [0, offset] with a
    static-shape mask.
    """
    st, was_tuple = _kv_norm(kv_buffers)
    quantized = 'ks' in st
    if quantized:
        B, H, T, Dh = st['k'].shape       # head-major decode layout
    else:
        B, T, H, Dh = st['k'].shape
    q, k, v = _qkv(p, cfg, x_t)
    q, k = _rotate(cfg, q, k, offset)
    if quantized:
        kq, ksn = kv_quantize(k)
        vq, vsn = kv_quantize(v)
        st = {'k': _kvq_write(st['k'], kq, offset),
              'v': _kvq_write(st['v'], vq, offset),
              'ks': _kvq_write(st['ks'], ksn, offset),
              'vs': _kvq_write(st['vs'], vsn, offset)}
    else:
        st = {'k': _kv_write(st['k'], k, offset),
              'v': _kv_write(st['v'], v, offset)}
    k_buf, v_buf = st['k'], st['v']
    scale = 1.0 / jnp.sqrt(jnp.float32(Dh))
    if quantized and use_pallas:
        from evo_tpu.ops.pallas_attention import (flash_attention_buffer,
                                                  flash_buffer_supported)
        if flash_buffer_supported(T):
            # int8-KV decode MUST go through the Pallas buffer kernel on
            # TPU: the XLA lowering of the int8 x int8 jnp dots below
            # CONVERTS the whole s8 buffer to s32 first (observed in the
            # compiled HLO — 4 bytes/elem of reads, 2x WORSE than bf16;
            # measured 39.7 vs 52.3 tok/s at a 123k offset). The kernel
            # dequantizes blocks in VMEM so HBM traffic is the 1 byte/elem
            # the mode promises, and its offset-based block skip bounds
            # reads to the live prefix. Per-slot (B,) offsets supported.
            from evo_tpu.parallel.mesh import has_cp
            if mesh is None:
                y = flash_attention_buffer(q, k_buf, v_buf, offset,
                                           st['ks'], st['vs'])
            elif not has_cp(mesh):
                from jax.sharding import PartitionSpec as P

                from evo_tpu.parallel.mesh import channel_axes
                ch = channel_axes(mesh)
                spec = P('dp', None, ch, None)
                qspec = P('dp', ch, None, None)       # head-major int8
                sspec = P('dp', ch, None)
                off_spec = P('dp') if getattr(offset, 'ndim', 0) == 1 \
                    else P()
                y = jax.shard_map(
                    lambda a, kk, vv, kss, vss, off:
                        flash_attention_buffer(a, kk, vv, off, kss, vss),
                    mesh=mesh,
                    in_specs=(spec, qspec, qspec, sspec, sspec, off_spec),
                    out_specs=spec, check_vma=False,
                )(q, k_buf, v_buf, st['ks'], st['vs'],
                  jnp.asarray(offset, jnp.int32))
            else:
                y = None
            if y is not None:
                return _out(p, x_t.dtype, y,
                            act_quant=cfg.act_quant == 'int8'), \
                    _kv_denorm(st, was_tuple)
    if quantized and use_pallas and jax.default_backend() == 'tpu' \
            and not _KVQ_FALLBACK_WARNED:
        # reaching here on TPU means the Pallas int8-KV kernel was
        # ineligible (cache length not 4096-divisible, or a cp mesh) and
        # decode will take the jnp int8 path below — measured SLOWER than
        # a plain bf16 cache (39.7 vs 52.3 tok/s at a 123k offset), so the
        # opt-in speed mode is silently a pessimization. Warn once at
        # trace time (ADVICE r3).
        _KVQ_FALLBACK_WARNED.append(True)
        import warnings
        warnings.warn(
            f'kv_quant int8 decode fell back to the jnp int8 path '
            f'(cache length {T} not kernel-eligible, or context-parallel '
            f'mesh); this is slower than a bf16 cache. Align the cache '
            f'length to 4096 (scoring/generation/serving do this '
            f'automatically) or disable kv_quant.', stacklevel=2)
    if quantized:
        # int8 x int8 decode attention: decode is cache-bandwidth-bound at
        # long context, so the dots must READ int8 — a dequantizing
        # .astype() on the buffers would materialize a full-size bf16 copy
        # (XLA does not fuse converts into dot operands; see the bf16
        # branch note below). Q is dynamically quantized per (b, h) and
        # Q@K rescaled by both scale vectors; the softmax weights fold the
        # V scales in and are themselves quantized per (b, h) so A@V also
        # contracts int8 on the MXU. Numerics: one extra int8 rounding of
        # q and of the (probability x v-scale) rows — inside this opt-in
        # mode's error budget (composes with weight_quant int8; the
        # default bf16 cache keeps the 1e-3 parity contract).
        q1 = q[:, 0].astype(jnp.float32)                        # (B, H, Dh)
        qs = jnp.maximum(jnp.max(jnp.abs(q1), axis=-1) / 127.0,
                         jnp.float32(1e-12))                    # (B, H)
        qq = jnp.clip(jnp.round(q1 / qs[..., None]), -127,
                      127).astype(jnp.int8)
        s_i32 = jnp.einsum('bhd,bhtd->bht', qq, k_buf,
                           preferred_element_type=jnp.int32)
        s = (s_i32.astype(jnp.float32)
             * (qs[..., None] * scale)
             * st['ks'])
    else:
        # dots run in the buffer dtype with f32 accumulation: an
        # .astype(f32) on the buffers would MATERIALIZE an f32 KV copy
        # (12.9 GB at 131k — XLA does not fuse converts into dot
        # operands), doubling decode bandwidth and breaking long-context
        # memory. Softmax stays f32.
        s = jnp.einsum('bhd,bmhd->bhm', q[:, 0].astype(k_buf.dtype), k_buf,
                       preferred_element_type=jnp.float32) * scale
    if getattr(offset, 'ndim', 0) == 1:
        valid = jnp.arange(T)[None, :] <= offset[:, None]    # (B, T)
        s = jnp.where(valid[:, None, :], s, -jnp.inf)
    else:
        valid = jnp.arange(T) <= offset
        s = jnp.where(valid[None, None], s, -jnp.inf)
    a = jax.nn.softmax(s, axis=-1)
    if quantized:
        av = a * st['vs']                                    # (B, H, T) f32
        avs = jnp.maximum(jnp.max(av, axis=-1) / 127.0,
                          jnp.float32(1e-12))                # av >= 0
        avq = jnp.clip(jnp.round(av / avs[..., None]), -127,
                       127).astype(jnp.int8)
        # A@V contracted in T-chunks with f32 partial sums: a single int32
        # accumulation saturates at |sum| = 127*127*T > INT32_MAX once T
        # exceeds ~133k (near-uniform attention over same-sign v) — inside
        # the context range this mode targets. Per-chunk int32 is exact
        # (127*127*32768 << 2^31); the cross-chunk sum is f32.
        Tc = next((c for c in (32768, 16384, 8192, 4096, 2048, 1024)
                   if T % c == 0), None)
        if Tc is not None and T > Tc:
            y_i32 = jnp.einsum(
                'bhct,bhctd->bhcd', avq.reshape(B, H, T // Tc, Tc),
                v_buf.reshape(B, H, T // Tc, Tc, Dh),
                preferred_element_type=jnp.int32)
            y = jnp.sum(y_i32.astype(jnp.float32), axis=2) * avs[..., None]
        else:
            y_i32 = jnp.einsum('bht,bhtd->bhd', avq, v_buf,
                               preferred_element_type=jnp.int32)
            y = y_i32.astype(jnp.float32) * avs[..., None]
    else:
        y = jnp.einsum('bhm,bmhd->bhd', a.astype(v_buf.dtype), v_buf,
                       preferred_element_type=jnp.float32)
    y = y.astype(x_t.dtype)[:, None]  # (B, 1, H, Dh)
    return _out(p, x_t.dtype, y,
                act_quant=cfg.act_quant == 'int8'), _kv_denorm(st, was_tuple)
