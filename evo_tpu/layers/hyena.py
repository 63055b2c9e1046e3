"""Hyena gated long-convolution mixer (29 of 32 layers).

Block anatomy (SURVEY.md §2.A "[inferred] Block anatomy", validated against
the config schema and cache structure of `evo/generation.py:105-148`):

    z = in_proj(x)                      # (B, L, 3D) dense
    z = short_fir(z)                    # depthwise causal FIR, length 3
    x2, x1, v = split(z)                # three (B, L, D) streams
    u = x1 * v                          # pre-gate
    y = longconv(u) + D_skip * u        # implicit modal filter (FFT / recurrence)
    y = x2 * y                          # post-gate
    out = out_proj(y)

Channel dimension is embarrassingly parallel across the long conv — under TP
each chip owns hidden_size/tp channels and runs full-length FFTs locally
(SURVEY.md §5 long-context plan).

Parameter layout is TP-first: the input projection is stored (D, 3, C) and
the FIR taps (3, C, K) with the three streams (x2, x1, v) as an explicit
axis, so sharding the channel axis C across the `tp` mesh axis
(`parallel/sharding.py`) never crosses a stream boundary — the GSPMD
equivalent of the engine's `column_split: True` TP hint (config:34).

Decode state (mirrors reference `inference_params_dict['hyena']`):
  fir:  (B, 3, C, K-1) trailing pre-FIR inputs
  iir:  (B, C, S, 2) float32 modal state
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from evo_tpu.config import ModelConfig
from evo_tpu.ops import fftconv
from evo_tpu.quant import is_int4, qdot, wcast


def _pallas_enabled(cfg: ModelConfig) -> bool:
    if cfg.use_pallas == 'never':
        return False
    if cfg.use_pallas == 'always':
        return True
    return jax.default_backend() == 'tpu'


class HyenaState(NamedTuple):
    fir: jax.Array   # (B, 3, C, K-1)
    iir: jax.Array   # (B, C, S, 2) float32


def _out_proj(p, y, act_quant: bool = False):
    """y: (B, L, C) -> (B, L, D)."""
    if act_quant or is_int4(p['w_out']):
        o = qdot(y, p['w_out'])
    else:
        o = y @ wcast(p['w_out'], y.dtype)
    if 'b_out' in p:
        o = o + p['b_out'].astype(y.dtype)
    if 'lora_w_out' in p:
        from evo_tpu.lora import delta1
        o = o + delta1(y, p['lora_w_out']).astype(o.dtype)
    return o


def hyena_full(p, cfg: ModelConfig, x, *, collect_state: bool = False,
               state: Optional[HyenaState] = None, mesh=None):
    """Full-sequence forward (prefill / scoring).

    x: (B, L, D). Returns (y, HyenaState | None). When `state` is given its
    fir/iir contents seed the convolution (segment continuation); state
    collection computes the post-sequence fir/iir state for decode handoff.
    """
    B, L, D = x.shape
    aq = cfg.act_quant == 'int8'
    # (B, 3, C, L): streams axis explicit, length last for the convs
    if aq or is_int4(p['w_in']):
        z = jnp.transpose(qdot(x, p['w_in']), (0, 2, 3, 1))
    else:
        z = jnp.einsum('bld,dtc->btcl', x, wcast(p['w_in'], x.dtype))
    if 'b_in' in p:
        z = z + p['b_in'].astype(x.dtype)[None, :, :, None]
    if 'lora_w_in' in p:
        # LoRA side path (evo_tpu/lora.py): delta arrives (B, L, 3, C),
        # moveaxis matches the (B, 3, C, L) stream layout
        from evo_tpu.lora import delta1
        z = z + jnp.moveaxis(delta1(x, p['lora_w_in']), 1, -1
                             ).astype(z.dtype)
    from evo_tpu.parallel.mesh import channel_axes, has_cp
    ch = channel_axes(mesh)
    if has_cp(mesh):
        # context parallelism: the residual stream arrives seq-sharded on
        # cp. Reshard to channel-sharded/full-sequence (channels over
        # tp x cp) — one all_to_all within each cp group — and the whole
        # mixer body below (FIR, gating, long conv, d_skip) is then
        # channel-local with zero sequence-axis communication
        # (SURVEY.md §5 long-context plan).
        from jax.sharding import NamedSharding, PartitionSpec as P
        z = jax.lax.with_sharding_constraint(
            z, NamedSharding(mesh, P('dp', None, ch, None)))
    # fully-fused mixer core: FIR + gates + Toeplitz conv + modal carry in
    # one Pallas kernel (ops/pallas_hyena.py) — no full-size intermediate
    # ever touches HBM. Falls through to the unfused kernels when the
    # shape has no feasible blocking (e.g. ragged scoring lengths).
    from evo_tpu.ops.pallas_hyena import (hyena_mixer_pallas,
                                          hyena_mixer_supported)
    C = z.shape[2]
    shards = 1
    if mesh is not None:
        for a in (ch if isinstance(ch, tuple) else (ch,)):
            shards *= mesh.shape[a]
    if (cfg.hyena_fused_mixer and _pallas_enabled(cfg)
            and cfg.hyena_conv_backend == 'matmul' and C % shards == 0
            # short prefills (resume tails) can be narrower than the FIR
            # window: the fused kernel would return a truncated fir state
            # (width min(L, K-1)), corrupting the next decode step
            and L >= cfg.short_filter_length
            and hyena_mixer_supported((B, 3, C // shards, L),
                                      cfg.hyena_matmul_chunk)):
        st = (state.fir, state.iir) if state is not None else None
        if mesh is None:
            y_g, iir, fir_state = hyena_mixer_pallas(
                z, p['fir_w'], p.get('fir_b'), p['poles'], p['residues'],
                p['d_skip'], chunk=cfg.hyena_matmul_chunk, state=st)
        else:
            from jax.sharding import PartitionSpec as P
            fir_b = p.get('fir_b')
            if fir_b is None:
                fir_b = jnp.zeros(p['fir_w'].shape[:-1], z.dtype)
            if st is None:
                S = p['poles'].shape[1]
                st = (jnp.zeros((B, 3, C, cfg.short_filter_length - 1),
                                z.dtype),
                      jnp.zeros((B, C, S, 2), jnp.float32))
            y_g, iir, fir_state = jax.shard_map(
                lambda zz, fw, fb, pp, rr, dd, f0, s0: hyena_mixer_pallas(
                    zz, fw, fb, pp, rr, dd, chunk=cfg.hyena_matmul_chunk,
                    state=(f0, s0)),
                mesh=mesh,
                in_specs=(P('dp', None, ch, None), P(None, ch, None),
                          P(None, ch), P(ch, None, None),
                          P(ch, None, None), P(ch,),
                          P('dp', None, ch, None), P('dp', ch, None, None)),
                out_specs=(P('dp', ch, None), P('dp', ch, None, None),
                           P('dp', None, ch, None)),
                check_vma=False)(z, p['fir_w'], fir_b, p['poles'],
                                 p['residues'], p['d_skip'], st[0], st[1])
        out = _out_proj(p, jnp.swapaxes(y_g, 1, 2), act_quant=aq)
        if has_cp(mesh):
            from evo_tpu.parallel.sharding import residual_constraint
            out = residual_constraint(out, mesh)
        new_state = HyenaState(fir=fir_state, iir=iir) if collect_state \
            else None
        return out, new_state
    from evo_tpu.ops.pallas_fir import fir_gate_pallas, fir_gate_supported
    if (state is None and _pallas_enabled(cfg)
            and L >= cfg.short_filter_length
            and fir_gate_supported(z.shape, z.dtype)):
        # fused FIR+gate kernel (N2, `use_flash_depthwise` slot): emits
        # (x2, u) without round-tripping the FIR output through HBM
        if mesh is None:
            x2, u = fir_gate_pallas(z, p['fir_w'], p.get('fir_b'))
        else:
            # channel-parallel under TP: run the kernel per shard inside
            # shard_map (pallas_call has no GSPMD partitioning rule)
            from jax.sharding import PartitionSpec as P
            fir_b = p.get('fir_b')
            if fir_b is None:
                fir_b = jnp.zeros(p['fir_w'].shape[:-1], z.dtype)
            x2, u = jax.shard_map(
                lambda zz, ww, bb: fir_gate_pallas(zz, ww, bb),
                mesh=mesh,
                in_specs=(P('dp', None, ch, None), P(None, ch, None),
                          P(None, ch)),
                out_specs=(P('dp', ch, None), P('dp', ch, None)),
                check_vma=False)(z, p['fir_w'], fir_b)
        fir_state = z[..., L - (cfg.short_filter_length - 1):]
    else:
        fir_in_state = state.fir if state is not None else None
        z, fir_state = fftconv.fir_causal_conv(
            z, p['fir_w'], p.get('fir_b'), fir_in_state)
        x2, x1, v = z[:, 0], z[:, 1], z[:, 2]   # (B, C, L) each
        u = x1 * v
    skip_done = False
    chunked = (cfg.hyena_fft_chunk and L > cfg.hyena_fft_chunk)
    if cfg.hyena_conv_backend == 'matmul':
        # MXU path: chunked Toeplitz matmuls, exact modal cross-chunk carry.
        # Handles fresh prefill, segment continuation, and state collection
        # uniformly (the final state falls out of the chunk prefix for free).
        chunk = cfg.hyena_matmul_chunk
        if state is not None and L > chunk and L % chunk:
            # continuation requires chunk | L: run the aligned prefix
            # chunked, then the short remainder seeded with the carried
            # state (falling back to chunk=L would build a (D, L, L)
            # Toeplitz — OOM at realistic segment lengths)
            split = (L // chunk) * chunk
            y1, s_mid = fftconv.conv_matmul_chunked(
                u[..., :split], p['poles'], p['residues'], chunk,
                state=state.iir, d_skip=p['d_skip'])
            y2, iir = fftconv.conv_matmul_chunked(
                u[..., split:], p['poles'], p['residues'], chunk,
                state=s_mid, d_skip=p['d_skip'])
            y = jnp.concatenate([y1, y2], axis=-1)
        else:
            y, iir = fftconv.conv_matmul_chunked(
                u, p['poles'], p['residues'], chunk,
                state=state.iir if state is not None else None,
                d_skip=p['d_skip'],
                # opt-in VMEM cross-chunk prefix (see config.py: measured
                # step-neutral at 7B/8k, default off); single-chip only —
                # pallas has no GSPMD partitioning rule, and under a mesh
                # the jnp Hillis-Steele shards with zero communication
                pallas_prefix=(cfg.hyena_pallas_prefix
                               and _pallas_enabled(cfg) and mesh is None))
        skip_done = True
    elif state is not None:
        # segment continuation: the chunked conv consumes the carried modal
        # state exactly (chunk must divide L; fall back to one L-chunk)
        chunk = (cfg.hyena_fft_chunk
                 if chunked and L % cfg.hyena_fft_chunk == 0 else L)
        y, iir = fftconv.fft_causal_conv_chunked(
            u, p['poles'], p['residues'], chunk, state=state.iir,
            mesh=mesh)
    elif chunked:
        y, iir = fftconv.fft_causal_conv_chunked(
            u, p['poles'], p['residues'], cfg.hyena_fft_chunk, mesh=mesh)
    else:
        h = fftconv.materialize_filter(p['poles'], p['residues'], L)
        # Tie the (input-independent) filter to this layer's activations so
        # XLA cannot hoist all 29 layers' (C, L) filters to program start —
        # at 7B/8k that is ~4 GB of simultaneously-live filter buffers
        # (OOM on v5e).
        h, u = jax.lax.optimization_barrier((h, u))
        y = fftconv.fft_causal_conv(u, h, mesh=mesh)
        iir = None
    if not skip_done:
        y = y + p['d_skip'].astype(jnp.float32)[None, :, None] * \
            u.astype(jnp.float32)
    y = x2 * y.astype(x.dtype)
    out = _out_proj(p, jnp.swapaxes(y, 1, 2), act_quant=aq)
    if has_cp(mesh):
        # back to the seq-sharded residual layout (reduce-scatter over cp
        # fused with the out-proj's channel-contraction psum)
        from evo_tpu.parallel.sharding import residual_constraint
        out = residual_constraint(out, mesh)
    new_state = None
    if collect_state:
        if iir is None:
            iir = fftconv.modal_prefill_state(u, p['poles'],
                                              cfg.state_prefill_chunk)
        new_state = HyenaState(fir=fir_state, iir=iir)
    return out, new_state


def hyena_step(p, cfg: ModelConfig, x_t, state: HyenaState):
    """Single-token decode step. x_t: (B, 1, D)."""
    aq = cfg.act_quant == 'int8'
    if aq or is_int4(p['w_in']):
        z_t = qdot(x_t[:, 0], p['w_in'])
    else:
        z_t = jnp.einsum('bd,dtc->btc', x_t[:, 0],
                         wcast(p['w_in'], x_t.dtype))
    if 'b_in' in p:
        z_t = z_t + p['b_in'].astype(x_t.dtype)[None]
    z_t, fir_state = fftconv.fir_step(z_t, p['fir_w'], p.get('fir_b'),
                                      state.fir)
    x2, x1, v = z_t[:, 0], z_t[:, 1], z_t[:, 2]        # (B, C)
    u = x1 * v
    y, iir = fftconv.modal_step(u, p['poles'], p['residues'], p['d_skip'],
                                state.iir)
    y = x2 * y.astype(x_t.dtype)
    out = _out_proj(p, y[:, None], act_quant=aq)     # (B, 1, D)
    return out, HyenaState(fir=fir_state, iir=iir)
