"""Pallas fully-fused Hyena mixer core (short FIR + gates + modal long conv).

One VMEM-resident kernel covering everything between the Hyena block's two
dense projections (reference block anatomy, SURVEY.md §2.A; the engine's
`use_flash_depthwise` / `use_flashfft` kernel slots,
`evo/configs/evo-1-8k-base_inference.yml:32-33`):

    z' = depthwise causal FIR(z)          (length-3 taps)
    x2, x1, v = z'; u = x1 * v            (pre-gate)
    y = Toeplitz-chunk conv(u) + d_skip*u (modal implicit filter)
    out = x2 * y                          (post-gate)

The unfused pipeline (ops/pallas_fir.py + ops/fftconv.py:conv_matmul_chunked)
round-trips five full-size intermediates through HBM per layer — x2, u in the
activation dtype plus y_local, y_state, y in float32 (~0.6 GB of traffic at
7B/8k vs ~0.27 GB essential) — which made the ~0.2%-of-FLOPs conv the
largest non-matmul cost of the prefill step (docs/performance.md ledger).
Here every intermediate lives in VMEM; HBM sees only z in and the gated
output out.

Math is identical to `conv_matmul_chunked` (same chunk decomposition, same
Hillis-Steele cross-chunk modal prefix, float32 accumulation) evaluated
tile-by-tile: the grid walks length-tiles sequentially (TPU grids iterate
the last axis innermost on one core) carrying the modal state and the FIR
tail in VMEM scratch, so arbitrarily long sequences stream at O(tile)
memory. The final modal + FIR states fall out for free, giving decode
handoff (`collect_state`) and segment continuation (`state=`) without the
separate `modal_prefill_state` pass.

The jnp composition in ops/fftconv.py is the oracle (tests/test_pallas_hyena.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from evo_tpu.ops import fftconv


def _shift_chunks(x, step, T):
    """Shift (bc, T, S) right along the chunk axis, zero-filling."""
    bc, _, S = x.shape
    z = jnp.zeros((bc, step, S), x.dtype)
    return jnp.concatenate([z, x[:, :T - step]], axis=1)


def _mixer_kernel(z_ref, wt_ref, bb_ref, toep_ref, pw_r_ref, pw_i_ref,
                  tab_r_ref, tab_i_ref, pcq_r_ref, pcq_i_ref,
                  st0_ref, fir0_ref,
                  y_ref, iir_ref, firout_ref,
                  st_r_scr, st_i_scr, firc_scr, *, Kf: int, bc: int,
                  Ct: int, T: int):
    k = pl.program_id(2)
    Lt = T * Ct

    @pl.when(k == 0)
    def _():
        st_r_scr[:] = st0_ref[0, :, :, 0]
        st_i_scr[:] = st0_ref[0, :, :, 1]
        firc_scr[:] = fir0_ref[0].astype(jnp.float32)

    # ---- short FIR + pre-gate (semantics of ops/pallas_fir.py, plus the
    # cross-tile carry: the previous tile's last Kf-1 raw-z columns) ----
    w = wt_ref[0].astype(jnp.float32)                    # (3*Kf, bc)
    b = bb_ref[0].astype(jnp.float32)                    # (3, bc)
    streams = []
    for s in range(3):
        zf = z_ref[0, s].astype(jnp.float32)             # (bc, Lt)
        zcat = jnp.concatenate([firc_scr[s], zf], axis=1)  # (bc, Lt+Kf-1)
        acc = jnp.zeros((bc, Lt), jnp.float32)
        for j in range(Kf):
            acc = acc + w[s * Kf + j][:, None] * zcat[:, j:j + Lt]
        acc = acc + b[s][:, None]
        # round to the activation dtype BEFORE gating — bit-matching the
        # jnp composition (fir_causal_conv casts, then the gate multiplies
        # in that dtype)
        streams.append(acc.astype(y_ref.dtype))
    x2, x1, v = streams
    u = x1 * v                                           # (bc, Lt)
    for s in range(3):
        firc_scr[s] = z_ref[0, s].astype(jnp.float32)[:, Lt - (Kf - 1):]

    # ---- chunked Toeplitz conv (math of fftconv.conv_matmul_chunked) ----
    u32 = u.astype(jnp.float32).reshape(bc, T, Ct)
    # y_local[d, q, t] = sum_c toep[d, t, c] u[d, q, c]   (d_skip on the
    # Toeplitz diagonal, folded by the host wrapper)
    y_local = jax.lax.dot_general(
        u32, toep_ref[:], (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)              # (bc, T, Ct)
    # per-chunk injected state: inj[d, q, s] = sum_c p^(Ct-1-c) u[d, q, c]
    inj_r = jax.lax.dot_general(
        u32, pw_r_ref[:], (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)              # (bc, T, S)
    inj_i = jax.lax.dot_general(
        u32, pw_i_ref[:], (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)

    # inclusive decayed prefix over the tile's chunks (Hillis-Steele,
    # A = p^Ct): incl[q] = sum_{j<=q} A^(q-j) inj[j]; pcq[q] tabulates A^q
    sr, si = inj_r, inj_i
    step = 1
    while step < T:
        ar = pcq_r_ref[:, step][:, None, :]              # (bc, 1, S)
        ai = pcq_i_ref[:, step][:, None, :]
        srs = _shift_chunks(sr, step, T)
        sis = _shift_chunks(si, step, T)
        sr = sr + ar * srs - ai * sis
        si = si + ar * sis + ai * srs
        step *= 2
    # state entering chunk q: A^q (x) st0 + incl[q-1]
    st0r = st_r_scr[:][:, None, :]                       # (bc, 1, S)
    st0i = st_i_scr[:][:, None, :]
    aqr = pcq_r_ref[:, :T]                               # (bc, T, S)
    aqi = pcq_i_ref[:, :T]
    ent_r = _shift_chunks(sr, 1, T) + aqr * st0r - aqi * st0i
    ent_i = _shift_chunks(si, 1, T) + aqr * st0i + aqi * st0r
    # carry out of the tile: A^T (x) st0 + incl[T-1]
    aTr = pcq_r_ref[:, T]                                # (bc, S)
    aTi = pcq_i_ref[:, T]
    fr = aTr * st_r_scr[:] - aTi * st_i_scr[:] + sr[:, T - 1]
    fi = aTr * st_i_scr[:] + aTi * st_r_scr[:] + si[:, T - 1]
    st_r_scr[:] = fr
    st_i_scr[:] = fi

    # in-chunk decay of the entering state: y_state[t] = Re(ent . R p^(t+1))
    y_state = (jax.lax.dot_general(
                   ent_r, tab_r_ref[:], (((2,), (1,)), ((0,), (0,))),
                   preferred_element_type=jnp.float32)
               - jax.lax.dot_general(
                   ent_i, tab_i_ref[:], (((2,), (1,)), ((0,), (0,))),
                   preferred_element_type=jnp.float32))  # (bc, T, Ct)

    y = (y_local + y_state).reshape(bc, Lt).astype(y_ref.dtype)
    y_ref[0] = x2 * y                                    # post-gate

    @pl.when(k == pl.num_programs(2) - 1)
    def _():
        iir_ref[0] = jnp.stack([fr, fi], axis=-1)
        firout_ref[0] = z_ref[0, :, :, Lt - (Kf - 1):]


def _pick_blocks(shape, chunk):
    """(bc, Lt) or None: channel block + length tile for this shape."""
    B, three, C, L = shape
    Ct = min(chunk, L)
    if L % Ct:
        return None
    # length tile: largest power-of-two multiple of Ct dividing L, <= 2048
    Lt = Ct
    while Lt * 2 <= min(L, 2048) and L % (Lt * 2) == 0:
        Lt *= 2
    if L % Lt:
        return None
    # channel block: VMEM cost is dominated by the (bc, Ct, Ct) float32
    # Toeplitz slab + ~6 (bc, Lt) float32 temporaries
    bc = 64
    while bc >= 8 and C % bc:
        bc -= 8
    if bc < 8:
        return None
    return bc, Lt


def hyena_mixer_supported(shape, chunk: int) -> bool:
    """True when the fused kernel has a feasible blocking for z `shape`."""
    return _pick_blocks(shape, chunk) is not None


def hyena_mixer_pallas(z, fir_w, fir_b, poles, residues, d_skip, *,
                       chunk: int = 64, state=None, interpret: bool = False):
    """z: (B, 3, C, L); fir_w: (3, C, Kf); fir_b: (3, C) or None;
    poles/residues: (C, S, 2) float32; d_skip: (C,).

    Returns (y (B, C, L) z.dtype, iir (B, C, S, 2) float32,
    fir_state (B, 3, C, Kf-1) z.dtype) where y is the fully-gated mixer
    core output (ready for out_proj) and the states are the decode-handoff
    values after position L — exactly the (y, state) contract of the
    unfused fir_causal_conv + conv_matmul_chunked composition.

    `state`, when given, is a (fir, iir) pair seeding the kernel for
    segment continuation (fir: (B, 3, C, Kf-1) raw-z tail, iir:
    (B, C, S, 2) modal state), matching `HyenaState`.
    """
    B, three, C, L = z.shape
    assert three == 3
    Kf = fir_w.shape[-1]
    S = poles.shape[1]
    blocks = _pick_blocks(z.shape, chunk)
    if blocks is None:
        raise ValueError(
            f'hyena_mixer_pallas: no feasible blocking for shape {z.shape} '
            f'chunk={chunk} — gate with hyena_mixer_supported() first')
    bc, Lt = blocks
    Ct = min(chunk, L)
    T = Lt // Ct

    # ---- host-side tables (all float32) ----
    p32 = poles.astype(jnp.float32)
    r32 = residues.astype(jnp.float32)
    logmag, theta = fftconv._pole_log(p32)
    rr, ri = r32[..., 0], r32[..., 1]
    h_local = fftconv.materialize_filter(p32, r32, Ct)        # (C, Ct)
    t_idx = jnp.arange(Ct)
    delta = t_idx[:, None] - t_idx[None, :]
    toep = jnp.take(h_local, jnp.maximum(delta, 0), axis=1) * \
        (delta >= 0).astype(jnp.float32)[None]                # (C, Ct, Ct)
    toep = toep + d_skip.astype(jnp.float32)[:, None, None] * \
        jnp.eye(Ct, dtype=jnp.float32)[None]
    pw_r, pw_i = fftconv._pole_pow_tables(
        logmag, theta, jnp.arange(Ct - 1, -1, -1))            # (C, S, Ct)
    dec_r, dec_i = fftconv._pole_pow_tables(
        logmag, theta, jnp.arange(1, Ct + 1))
    tab_r = rr[..., None] * dec_r - ri[..., None] * dec_i     # (C, S, Ct)
    tab_i = rr[..., None] * dec_i + ri[..., None] * dec_r
    pcq_r, pcq_i = fftconv._pole_pow_tables(
        logmag, theta, Ct * jnp.arange(T + 1))                # (C, S, T+1)
    pcq_r = jnp.moveaxis(pcq_r, -1, 1)                        # (C, T+1, S)
    pcq_i = jnp.moveaxis(pcq_i, -1, 1)
    # tie the (input-independent) tables to this layer's activations so XLA
    # cannot hoist all 29 layers' slabs to program start (memory rule,
    # docs/performance.md)
    toep, z = jax.lax.optimization_barrier((toep, z))

    # FIR tap/bias slabs in the pallas_fir blocked layout
    wt = jnp.swapaxes(
        fir_w.reshape(3, C // bc, bc, Kf), 2, 3).reshape(3, C // bc, Kf * bc)
    wt = jnp.swapaxes(wt, 0, 1).reshape(C // bc, 3 * Kf, bc)
    if fir_b is None:
        fir_b = jnp.zeros((3, C), z.dtype)
    bb = jnp.swapaxes(fir_b.reshape(3, C // bc, bc), 0, 1)    # (C//bc, 3, bc)

    if state is None:
        st0 = jnp.zeros((B, C, S, 2), jnp.float32)
        fir0 = jnp.zeros((B, 3, C, Kf - 1), z.dtype)
    else:
        fir0, st0 = state
        fir0 = fir0.astype(z.dtype)
        st0 = st0.astype(jnp.float32)

    grid = (B, C // bc, L // Lt)
    y, iir, fir_state = pl.pallas_call(
        functools.partial(_mixer_kernel, Kf=Kf, bc=bc, Ct=Ct, T=T),
        out_shape=(jax.ShapeDtypeStruct((B, C, L), z.dtype),
                   jax.ShapeDtypeStruct((B, C, S, 2), jnp.float32),
                   jax.ShapeDtypeStruct((B, 3, C, Kf - 1), z.dtype)),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 3, bc, Lt), lambda b, c, k: (b, 0, c, k),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3 * Kf, bc), lambda b, c, k: (c, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3, bc), lambda b, c, k: (c, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bc, Ct, Ct), lambda b, c, k: (c, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bc, S, Ct), lambda b, c, k: (c, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bc, S, Ct), lambda b, c, k: (c, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bc, S, Ct), lambda b, c, k: (c, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bc, S, Ct), lambda b, c, k: (c, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bc, T + 1, S), lambda b, c, k: (c, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bc, T + 1, S), lambda b, c, k: (c, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bc, S, 2), lambda b, c, k: (b, c, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3, bc, Kf - 1), lambda b, c, k: (b, 0, c, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, bc, Lt), lambda b, c, k: (b, c, k),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bc, S, 2), lambda b, c, k: (b, c, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3, bc, Kf - 1), lambda b, c, k: (b, 0, c, 0),
                         memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((bc, S), jnp.float32),
            pltpu.VMEM((bc, S), jnp.float32),
            pltpu.VMEM((3, bc, Kf - 1), jnp.float32),
        ],
        interpret=interpret,
    )(z, wt, bb, toep, pw_r, pw_i, tab_r, tab_i, pcq_r, pcq_i, st0, fir0)
    return y, iir, fir_state
