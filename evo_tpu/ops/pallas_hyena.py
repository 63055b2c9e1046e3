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
7B/8k vs ~0.27 GB essential). Fusing was expected to claw that back, but an
on-chip sweep at production shape (C=4096, L=8192, bf16; 11 blockings)
measured the fused kernel at 6.49 ms/mixer best (chunk=128, bc=128,
Lt=1024) vs 5.98 ms for the unfused pair: the chunked (bc, T, Ct) layout
leaves lanes idle in every elementwise op (Ct<=128 of 128 lanes; the modal
prefix runs at S=8-16 lanes) and the per-channel (T, Ct)x(Ct, Ct) matmuls
are too small for the MXU, which together cost more than the ~0.4 ms/mixer
of recovered HBM traffic. `hyena_fused_mixer` therefore defaults to OFF;
the kernel stays maintained (oracle-tested in CI and in `bench.py
--verify`) because it is the O(tile)-memory streaming path: arbitrarily
long sequences at fixed VMEM with modal + FIR states falling out for free,
which the unfused pipeline cannot do without materializing (B, C, L)
float32 intermediates.

Math is identical to `conv_matmul_chunked` (same chunk decomposition, same
Hillis-Steele cross-chunk modal prefix, float32 accumulation) evaluated
tile-by-tile: the grid walks length-tiles sequentially (TPU grids iterate
the last axis innermost on one core) carrying the modal state and the FIR
tail in VMEM scratch, so arbitrarily long sequences stream at O(tile)
memory. The final modal + FIR states fall out for free, giving decode
handoff (`collect_state`) and segment continuation (`state=`) without the
separate `modal_prefill_state` pass.

Mosaic layout rules shape the code: vector lane-splitting reshapes and
1D->3D broadcasts are unsupported, so (a) the host reshapes (C, L) ->
(C, K, Ct) before the call (layout-preserving, free) and the whole kernel
works in the chunked (bc, T, Ct) layout, (b) per-channel FIR taps/biases
arrive pre-broadcast as (.., bc, 1, 1) slabs, and (c) the complex modal
state is carried as separate re/im planes rather than a trailing size-2
axis.

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


def _mixer_kernel(z_ref, heads_ref, wt_ref, bb_ref, toep_ref,
                  pw_r_ref, pw_i_ref, tab_r_ref, tab_i_ref,
                  pcq_r_ref, pcq_i_ref, st0_r_ref, st0_i_ref,
                  y_ref, iir_r_ref, iir_i_ref,
                  st_r_scr, st_i_scr, *, Kf: int, bc: int,
                  Ct: int, T: int):
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        st_r_scr[:] = st0_r_ref[0]                       # (bc, 1, S)
        st_i_scr[:] = st0_i_ref[0]

    # ---- short FIR + pre-gate (semantics of ops/pallas_fir.py). A global
    # time-shift by d in chunked layout is a static lane slice of
    # [prev-chunk tail | chunk]; the host precomputes the (.., T, Kf-1)
    # prev-chunk tails (`heads`) so the kernel never shifts sublanes.
    # Taps/bias arrive pre-broadcast to (.., bc, 1, Ct): the in-kernel
    # multiply then broadcasts sublanes only (Mosaic single-axis rule) ----
    w = wt_ref[0].astype(jnp.float32)                    # (3*Kf, bc, 1, Ct)
    b = bb_ref[0].astype(jnp.float32)                    # (3, bc, 1, Ct)
    streams = []
    for s in range(3):
        # x stays in the activation dtype: multiplying by the float32 taps
        # promotes exactly (upcast), and skipping the explicit casts keeps
        # three (bc, T, Ct) float32 temporaries out of scoped VMEM
        x = z_ref[0, s]                                  # (bc, T, Ct)
        tcat = jnp.concatenate(
            [heads_ref[0, s], x], axis=2)                # (bc, T, Ct+Kf-1)
        acc = w[s * Kf + Kf - 1] * x                     # shift-0 tap
        for d in range(1, Kf):
            shifted = tcat[:, :, Kf - 1 - d:Kf - 1 - d + Ct]
            acc = acc + w[s * Kf + Kf - 1 - d] * shifted
        acc = acc + b[s]
        # round to the activation dtype BEFORE gating — bit-matching the
        # jnp composition (fir_causal_conv casts, then the gate multiplies
        # in that dtype)
        streams.append(acc.astype(y_ref.dtype))
    x2, x1, v = streams
    u = x1 * v                                           # (bc, T, Ct)

    # ---- chunked Toeplitz conv (math of fftconv.conv_matmul_chunked) ----
    u32 = u.astype(jnp.float32)                          # (bc, T, Ct)
    # y_local[d, q, t] = sum_c toep[d, t, c] u[d, q, c]   (d_skip on the
    # Toeplitz diagonal, folded by the host wrapper)
    # HIGHEST precision on every f32 dot: the MXU's DEFAULT f32 dot is a
    # single bf16-multiply pass (~1e-3 relative error), which diverges from
    # the unfused oracle's HIGHEST-precision conv (fftconv.py) — caught
    # on-chip by bench.py --verify at f32 tolerances
    hi = jax.lax.Precision.HIGHEST
    y_local = jax.lax.dot_general(
        u32, toep_ref[:], (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
        precision=hi)                                    # (bc, T, Ct)
    # per-chunk injected state: inj[d, q, s] = sum_c p^(Ct-1-c) u[d, q, c]
    inj_r = jax.lax.dot_general(
        u32, pw_r_ref[:], (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
        precision=hi)                                    # (bc, T, S)
    inj_i = jax.lax.dot_general(
        u32, pw_i_ref[:], (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32, precision=hi)

    # inclusive decayed prefix over the tile's chunks (Hillis-Steele,
    # A = p^Ct): incl[q] = sum_{j<=q} A^(q-j) inj[j]; pcq[q] tabulates A^q
    sr, si = inj_r, inj_i
    step = 1
    while step < T:
        ar = pcq_r_ref[:, step:step + 1, :]              # (bc, 1, S)
        ai = pcq_i_ref[:, step:step + 1, :]
        srs = _shift_chunks(sr, step, T)
        sis = _shift_chunks(si, step, T)
        sr = sr + ar * srs - ai * sis
        si = si + ar * sis + ai * srs
        step *= 2
    # state entering chunk q: A^q (x) st0 + incl[q-1]
    st0r = st_r_scr[:]                                   # (bc, 1, S)
    st0i = st_i_scr[:]
    aqr = pcq_r_ref[:, :T, :]                            # (bc, T, S)
    aqi = pcq_i_ref[:, :T, :]
    ent_r = _shift_chunks(sr, 1, T) + aqr * st0r - aqi * st0i
    ent_i = _shift_chunks(si, 1, T) + aqr * st0i + aqi * st0r
    # carry out of the tile: A^T (x) st0 + incl[T-1]
    aTr = pcq_r_ref[:, T:T + 1, :]                       # (bc, 1, S)
    aTi = pcq_i_ref[:, T:T + 1, :]
    fr = aTr * st0r - aTi * st0i + sr[:, T - 1:T, :]
    fi = aTr * st0i + aTi * st0r + si[:, T - 1:T, :]
    st_r_scr[:] = fr
    st_i_scr[:] = fi

    # in-chunk decay of the entering state: y_state[t] = Re(ent . R p^(t+1))
    y_state = (jax.lax.dot_general(
                   ent_r, tab_r_ref[:], (((2,), (1,)), ((0,), (0,))),
                   preferred_element_type=jnp.float32, precision=hi)
               - jax.lax.dot_general(
                   ent_i, tab_i_ref[:], (((2,), (1,)), ((0,), (0,))),
                   preferred_element_type=jnp.float32,
                   precision=hi))                        # (bc, T, Ct)

    y = (y_local + y_state).astype(y_ref.dtype)          # (bc, T, Ct)
    y_ref[0] = x2 * y                                    # post-gate

    @pl.when(k == pl.num_programs(2) - 1)
    def _():
        iir_r_ref[0] = fr                                # (bc, 1, S)
        iir_i_ref[0] = fi


def _pick_blocks(shape, chunk, *, bc_cap: int | None = None,
                 lt_cap: int = 1024):
    """(bc, Lt) or None: channel block + length tile for this shape."""
    B, three, C, L = shape
    Ct = min(chunk, L)
    if L % Ct:
        return None
    if bc_cap is None:
        # on-chip sweep (C=4096, L=8192, bf16): chunk=128/bc=128/Lt=1024
        # is the kernel's best point (6.49 ms); wider channel blocks only
        # pay off once the chunk fills the 128 lanes
        bc_cap = 128 if Ct >= 128 else 64
    # length tile: largest power-of-two multiple of Ct dividing L, <= lt_cap
    # (Lt=2048 at bc=64 peaks ~18.8 MB of scoped VMEM — over the 16 MB
    # budget once pipeline double-buffering is counted)
    Lt = Ct
    while Lt * 2 <= min(L, lt_cap) and L % (Lt * 2) == 0:
        Lt *= 2
    if L % Lt:
        return None
    # channel block: VMEM cost is dominated by the (bc, Ct, Ct) float32
    # Toeplitz slab + ~6 (bc, Lt) float32 temporaries
    bc = bc_cap
    while bc >= 8 and C % bc:
        bc -= 8
    if bc < 8:
        return None
    return bc, Lt


def hyena_mixer_supported(shape, chunk: int) -> bool:
    """True when the fused kernel has a feasible blocking for z `shape`."""
    return _pick_blocks(shape, chunk) is not None


def hyena_mixer_pallas(z, fir_w, fir_b, poles, residues, d_skip, *,
                       chunk: int = 64, state=None, interpret: bool = False,
                       block_override=None):
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
    blocks = block_override or _pick_blocks(z.shape, chunk)
    if blocks is None:
        raise ValueError(
            f'hyena_mixer_pallas: no feasible blocking for shape {z.shape} '
            f'chunk={chunk} — gate with hyena_mixer_supported() first')
    bc, Lt = blocks
    Ct = min(chunk, L)
    T = Lt // Ct

    # ---- host-side tables (all float32; log-doubling power ranges) ----
    p32 = poles.astype(jnp.float32)
    logmag, theta = fftconv._pole_log(p32)
    h_local, pw_r, pw_i, tab_r, tab_i, _, _ = \
        fftconv._conv_chunk_tables(poles, residues, Ct)
    toep = fftconv._toeplitz_from_taps(h_local, Ct, d_skip)   # (C, Ct, Ct)
    pcq_r, pcq_i = fftconv._pole_pow_range(
        Ct * logmag, Ct * theta, T + 1)                       # (C, S, T+1)
    pcq_r = jnp.moveaxis(pcq_r, -1, 1)                        # (C, T+1, S)
    pcq_i = jnp.moveaxis(pcq_i, -1, 1)
    # FIR tap/bias slabs, pre-broadcast to (.., bc, 1, Ct) so the kernel's
    # tap multiplies broadcast sublanes only (Mosaic single-axis rule)
    wt = jnp.swapaxes(
        fir_w.reshape(3, C // bc, bc, Kf), 2, 3).reshape(3, C // bc, Kf * bc)
    wt = jnp.swapaxes(wt, 0, 1).reshape(C // bc, 3 * Kf, bc, 1, 1)
    wt = jnp.broadcast_to(wt, (C // bc, 3 * Kf, bc, 1, Ct))
    if fir_b is None:
        fir_b = jnp.zeros((3, C), z.dtype)
    bb = jnp.swapaxes(fir_b.reshape(3, C // bc, bc), 0, 1)
    bb = jnp.broadcast_to(bb.reshape(C // bc, 3, bc, 1, 1),
                          (C // bc, 3, bc, 1, Ct))
    # tie the (input-independent) tables to this layer's activations so XLA
    # cannot hoist all 29 layers' slabs to program start (memory rule,
    # docs/performance.md)
    (toep, wt, bb, z) = jax.lax.optimization_barrier((toep, wt, bb, z))

    if state is None:
        st0_r = jnp.zeros((B, C, 1, S), jnp.float32)
        st0_i = jnp.zeros((B, C, 1, S), jnp.float32)
        fir0 = jnp.zeros((B, 3, C, 1, Kf - 1), z.dtype)
    else:
        fir0, st0 = state
        fir0 = fir0.astype(z.dtype).reshape(B, 3, C, 1, Kf - 1)
        st0 = st0.astype(jnp.float32)
        st0_r = st0[..., 0].reshape(B, C, 1, S)
        st0_i = st0[..., 1].reshape(B, C, 1, S)

    # chunked view: (C, L) -> (C, K, Ct) is layout-preserving in XLA (the
    # trailing dim stays contiguous), so the kernel receives pre-chunked
    # blocks and never lane-splits a vector (unsupported in Mosaic)
    K = L // Ct
    z5 = z.reshape(B, 3, C, K, Ct)
    # per-chunk FIR context: the previous chunk's last Kf-1 samples (chunk
    # 0 seeded by the carried fir state / zeros) — precomputed here so the
    # kernel's FIR is pure lane slices (no cross-chunk sublane shifts)
    heads = jnp.concatenate([fir0, z5[:, :, :, :-1, Ct - (Kf - 1):]],
                            axis=3)                       # (B,3,C,K,Kf-1)
    fir_state = z[..., L - (Kf - 1):]                     # (B, 3, C, Kf-1)
    grid = (B, C // bc, L // Lt)
    y4, iir_r, iir_i = pl.pallas_call(
        functools.partial(_mixer_kernel, Kf=Kf, bc=bc, Ct=Ct, T=T),
        out_shape=(jax.ShapeDtypeStruct((B, C, K, Ct), z.dtype),
                   jax.ShapeDtypeStruct((B, C, 1, S), jnp.float32),
                   jax.ShapeDtypeStruct((B, C, 1, S), jnp.float32)),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 3, bc, T, Ct), lambda b, c, k: (b, 0, c, k, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3, bc, T, Kf - 1),
                         lambda b, c, k: (b, 0, c, k, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3 * Kf, bc, 1, Ct),
                         lambda b, c, k: (c, 0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3, bc, 1, Ct), lambda b, c, k: (c, 0, 0, 0, 0),
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
            pl.BlockSpec((1, bc, 1, S), lambda b, c, k: (b, c, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bc, 1, S), lambda b, c, k: (b, c, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, bc, T, Ct), lambda b, c, k: (b, c, k, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bc, 1, S), lambda b, c, k: (b, c, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bc, 1, S), lambda b, c, k: (b, c, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((bc, 1, S), jnp.float32),
            pltpu.VMEM((bc, 1, S), jnp.float32),
        ],
        # the default scoped-vmem limit (16 MB) undercounts lane padding on
        # the sub-128-lane tables; physical VMEM is larger — raise the cap
        # like jax's own flash-attention kernel does
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=32 * 1024 * 1024),
        interpret=interpret,
    )(z5, heads, wt, bb, toep, pw_r, pw_i, tab_r, tab_i, pcq_r, pcq_i,
      st0_r, st0_i)
    iir = jnp.stack([iir_r[:, :, 0, :], iir_i[:, :, 0, :]], axis=-1)
    return y4.reshape(B, C, L), iir, fir_state
