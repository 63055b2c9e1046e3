"""Hyena long-convolution primitives.

The reference engine evaluates the Hyena implicit long filter two ways
(SURVEY.md §2.A: `prefill_style: fft`, `state_size: 8`):

  * prefill: causal convolution of the full sequence with the materialized
    filter, via FFT (reference: cuFFT through torch.fft; here: XLA TPU FFT,
    with a Pallas blockwise path layered on later);
  * decode: an O(1)-state linear recurrence in the filter's modal
    (diagonal/canonical) form — `state_size` complex modes per channel.

Parametrization (canonical form owned by this framework; the checkpoint
converter maps the reference's stored `poles`/`residues` tensors into it):

  filter    h[d, t] = Re( sum_s R[d,s] * p[d,s]^t ),  t = 0..L-1
  output    y[d, t] = sum_{tau<=t} h[d, t-tau] * u[d, tau] + D[d] * u[d, t]
  state     s[d,k](t) = p[d,k] * s[d,k](t-1) + u[d, t]       (complex)
            y[d, t]  = Re( sum_k R[d,k] * s[d,k](t) ) + D[d] * u[d, t]

Poles/residues stay float32 (reference precision policy:
`to_bfloat16_except_poles_residues`, `evo/models.py:148`); they are stored as
real/imag pairs in the trailing axis: shape (channels, state_size, 2).

All functions are pure and jit/grad/vmap-safe.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

_MIN_MAG = 1e-20


def _pole_log(poles: jax.Array):
    """Return (log|p|, arg p) as float32 arrays of shape (D, S)."""
    pr, pi = poles[..., 0], poles[..., 1]
    mag = jnp.sqrt(pr * pr + pi * pi)
    logmag = jnp.log(jnp.maximum(mag, _MIN_MAG))
    theta = jnp.arctan2(pi, pr)
    return logmag, theta


def materialize_filter(poles: jax.Array, residues: jax.Array,
                       length: int, block: int = 128) -> jax.Array:
    """Materialize h[d, t] = Re(sum_s R p^t) for t in [0, length).

    poles, residues: (D, S, 2) float32. Returns (D, length) float32.

    Factored power tables: with t = q*block + r,
        R p^t = (R p^(q*block)) * p^r,
    so only D*S*(L/block + block) transcendental evaluations are needed
    (~85x fewer than the naive per-t form at L=8k — measured 18% of the 7B
    prefill) and the remaining work is one small per-channel contraction
    over the S modes. Small trig arguments also improve accuracy vs
    cos(t*theta) at large t.
    """
    D, S, _ = poles.shape
    logmag, theta = _pole_log(poles.astype(jnp.float32))
    rr = residues[..., 0].astype(jnp.float32)
    ri = residues[..., 1].astype(jnp.float32)
    C = min(block, length)
    Q = -(-length // C)
    r = jnp.arange(C, dtype=jnp.float32)[None, None, :]      # (1, 1, C)
    q = jnp.arange(Q, dtype=jnp.float32)[None, None, :] * C  # (1, 1, Q)
    # p^r
    sm = jnp.exp(r * logmag[..., None])
    s_re = sm * jnp.cos(r * theta[..., None])                # (D, S, C)
    s_im = sm * jnp.sin(r * theta[..., None])
    # R * p^(qC)
    bm = jnp.exp(q * logmag[..., None])
    ang = q * theta[..., None]
    cos_a, sin_a = jnp.cos(ang), jnp.sin(ang)
    b_re = bm * (rr[..., None] * cos_a - ri[..., None] * sin_a)  # (D, S, Q)
    b_im = bm * (rr[..., None] * sin_a + ri[..., None] * cos_a)
    # h[d, q, r] = sum_s Re((b_re + i b_im)(s_re + i s_im))
    h = (jnp.einsum('dsq,dsc->dqc', b_re, s_re,
                    preferred_element_type=jnp.float32)
         - jnp.einsum('dsq,dsc->dqc', b_im, s_im,
                      preferred_element_type=jnp.float32))
    return h.reshape(D, Q * C)[:, :length]


def materialize_filter_direct(poles: jax.Array, residues: jax.Array,
                              length: int) -> jax.Array:
    """Naive per-t materialization (oracle for tests)."""
    D, S, _ = poles.shape
    logmag, theta = _pole_log(poles.astype(jnp.float32))
    rr, ri = residues[..., 0], residues[..., 1]
    rmag = jnp.sqrt(rr * rr + ri * ri)
    rphase = jnp.arctan2(ri, rr)
    t = jnp.arange(length, dtype=jnp.float32)[None, :]  # (1, L)
    h = jnp.zeros((D, length), dtype=jnp.float32)
    for s in range(S):
        # Re(R p^t) = |R| |p|^t cos(t*theta + phase)
        h = h + rmag[:, s:s + 1] * jnp.exp(t * logmag[:, s:s + 1]) * \
            jnp.cos(t * theta[:, s:s + 1] + rphase[:, s:s + 1])
    return h


def _fft_causal_conv_local(u: jax.Array, h: jax.Array) -> jax.Array:
    """Single-shard FFT conv body (see fft_causal_conv)."""
    L = u.shape[-1]
    fft_len = max(2, int(2 ** np.ceil(np.log2(2 * L))))
    u_f = jnp.fft.rfft(u.astype(jnp.float32), n=fft_len, axis=-1)
    h_f = jnp.fft.rfft(h.astype(jnp.float32), n=fft_len, axis=-1)
    return jnp.fft.irfft(u_f * h_f, n=fft_len, axis=-1)[..., :L]


def fft_causal_conv(u: jax.Array, h: jax.Array, mesh=None) -> jax.Array:
    """Causal convolution along the last axis via real FFT.

    u: (B, D, L) any float dtype; h: (D, L) float32.
    Returns (B, D, L) float32:  y[b, d, t] = sum_{tau<=t} h[d,t-tau] u[b,d,tau]

    FFT length is the next power of two >= 2L (linear, not circular, conv);
    computation in float32 regardless of input dtype (parity requirement,
    SURVEY.md §7 hard part #2).

    With a (dp, tp) `mesh`, the conv runs inside `jax.shard_map`: batch on
    dp, channels on tp, full length per shard. The long conv is depthwise,
    so this is communication-free by construction — each chip FFTs its own
    D/tp channels (SURVEY.md §5 long-context plan) — and it keeps the SPMD
    partitioner out of the FFT (whose partitioned lowering XLA:CPU cannot
    execute: fft_thunk layout RET_CHECK).
    """
    if mesh is None:
        return _fft_causal_conv_local(u, h)
    from jax.sharding import PartitionSpec as P
    # check_vma=False: the fft transpose rule mis-tags cotangent varying-axes
    # under shard_map (jax 0.9); replication checking is unnecessary here -
    # the body is elementwise-per-(channel, batch) shard by construction.
    conv = jax.shard_map(
        _fft_causal_conv_local, mesh=mesh,
        in_specs=(P('dp', 'tp', None), P('tp', None)),
        out_specs=P('dp', 'tp', None), check_vma=False)
    return conv(u, h)


def fft_causal_conv_chunked(u: jax.Array, poles: jax.Array,
                            residues: jax.Array, chunk: int,
                            state: jax.Array | None = None,
                            mesh=None):
    """Chunked causal conv with the modal filter: O(L*chunk) memory.

    Exact block decomposition of the L-long implicit-filter convolution
    using the filter's state-space form (the same math that powers O(1)
    decode): within a chunk of length C the output is a *local* FFT conv
    with the first C filter taps, plus the incoming recurrent state decayed
    through the chunk:

        y_i[t] = (h[0:C] * u_i)[t] + Re( sum_s R_s p_s^(t+1) state_{i-1,s} )
        state_i = p^C state_{i-1} + sum_j p^(C-1-j) u_i[j]

    This bounds FFT buffers to (B, D, 2C) instead of (B, D, 2L) — the
    memory path to 131k-context prefill on a 16 GB chip (SURVEY.md §7 hard
    part #3). Returns (y (B, D, L) float32, state (B, D, S, 2) float32
    after the last chunk) so segments can be streamed.

    u: (B, D, L); poles/residues: (D, S, 2) float32. L is LEFT-padded to a
    multiple of `chunk` internally — leading zeros convolve to zero and
    inject nothing into the state, so the returned state is exactly the
    state at position L. (Right-padding would decay the state by p^pad
    past L — do not "simplify" this.)
    """
    B, D, L = u.shape
    S = poles.shape[1]
    C = min(chunk, L)
    pad = (-L) % C
    if state is not None and pad:
        raise ValueError(
            'segment continuation (state != None) requires L to be a '
            f'multiple of chunk (L={L}, chunk={C}): left-padding would '
            'mis-align the incoming state decay')
    u32 = u.astype(jnp.float32)
    if pad:
        # LEFT-pad: leading zeros convolve to zero (outputs unchanged after
        # slicing) and inject nothing into the state, so the returned state
        # is exactly the state at position L
        u32 = jnp.concatenate(
            [jnp.zeros((B, D, pad), jnp.float32), u32], axis=-1)
    K = (L + pad) // C

    # all per-layer tables from ONE log-doubling power range
    # (_conv_chunk_tables: the direct per-element transcendental form
    # measured ~5 ms/layer at 7B)
    h_local, pw_r, pw_i, tab_r, tab_i, pc_r, pc_i = \
        _conv_chunk_tables(poles, residues, C)

    if state is None:
        sr0 = jnp.zeros((B, D, S), jnp.float32)
        si0 = jnp.zeros((B, D, S), jnp.float32)
    else:
        sr0, si0 = state[..., 0], state[..., 1]

    chunks = jnp.moveaxis(u32.reshape(B, D, K, C), 2, 0)       # (K, B, D, C)

    def body(carry, uc):
        sr, si = carry                                          # (B, D, S)
        y_local = fft_causal_conv(uc, h_local, mesh=mesh)       # (B, D, C)
        # incoming-state tail: Re(sum_s state_s * R p^(t+1))
        y_state = (jnp.einsum('bds,dsc->bdc', sr, tab_r,
                              preferred_element_type=jnp.float32)
                   - jnp.einsum('bds,dsc->bdc', si, tab_i,
                                preferred_element_type=jnp.float32))
        inj_r = jnp.einsum('bdc,dsc->bds', uc, pw_r,
                           preferred_element_type=jnp.float32)
        inj_i = jnp.einsum('bdc,dsc->bds', uc, pw_i,
                           preferred_element_type=jnp.float32)
        nsr = pc_r[None] * sr - pc_i[None] * si + inj_r
        nsi = pc_i[None] * sr + pc_r[None] * si + inj_i
        return (nsr, nsi), y_local + y_state

    (sr, si), ys = jax.lax.scan(body, (sr0, si0), chunks)
    y = jnp.moveaxis(ys, 0, 2).reshape(B, D, L + pad)[..., pad:]
    return y, jnp.stack([sr, si], axis=-1)


def _pole_pow_tables(logmag, theta, exps):
    """Re/Im of p^e for a vector of exponents. Returns (D, S, E) pairs."""
    e = jnp.asarray(exps, jnp.float32)[None, None, :]
    mag = jnp.exp(e * logmag[..., None])
    return mag * jnp.cos(e * theta[..., None]), \
        mag * jnp.sin(e * theta[..., None])


def _pole_pow_range(logmag, theta, n: int):
    """{p^0 .. p^(n-1)} re/im as (D, S, n) float32 by log-doubling.

    The direct form (`_pole_pow_tables` over arange(n)) pays one
    exp+cos+sin PER TABLE ELEMENT — D*S*n transcendentals, which measured
    ~5 ms/layer at 7B (the single largest non-matmul cost of the conv).
    Here only the log2(n) block-step powers p^(2^j) are transcendental
    (D*S*log2 n evals); each further entry is one complex multiply of
    exact lower powers, accumulating ~log2(n) ulp of relative error at the
    top exponent — orders of magnitude inside the 1e-3 parity budget
    (oracle-tested against the direct form in tests/test_fftconv.py).
    """
    rng_r = jnp.ones_like(logmag)[..., None]                  # (D, S, 1)
    rng_i = jnp.zeros_like(logmag)[..., None]
    m = 1
    while m < n:
        k = min(m, n - m)
        e = jnp.float32(m)
        mag = jnp.exp(e * logmag[..., None])
        ar = mag * jnp.cos(e * theta[..., None])              # (D, S, 1)
        ai = mag * jnp.sin(e * theta[..., None])
        new_r = ar * rng_r[..., :k] - ai * rng_i[..., :k]
        new_i = ar * rng_i[..., :k] + ai * rng_r[..., :k]
        rng_r = jnp.concatenate([rng_r, new_r], axis=-1)
        rng_i = jnp.concatenate([rng_i, new_i], axis=-1)
        m += k
    return rng_r, rng_i


def _toeplitz_from_taps(h_local, C: int, d_skip=None):
    """(D, C, C) lower-triangular causal Toeplitz of the first C taps.

    toep[d, t, c] = h[d, t-c] for t >= c (+ d_skip[d] on the diagonal).
    Expressed as a matmul against a constant one-hot (C+1, C*C) selector:
    the equivalent jnp.take gather measured ~3 ms/layer at 7B while the
    MXU runs this contraction in ~0.1 ms (2 GFLOP; bf16x3 products with a
    one-hot are exact in float32). d_skip rides along as an extra "tap"
    row hitting the diagonal, saving a (D, C, C) elementwise pass.
    """
    t, c = np.meshgrid(np.arange(C), np.arange(C), indexing='ij')
    mask = t >= c
    oh = np.zeros((C + 1, C * C), np.float32)
    oh[(t - c)[mask], (t * C + c)[mask]] = 1.0
    oh[C, np.arange(C) * C + np.arange(C)] = 1.0              # diagonal row
    if d_skip is None:
        d_skip = jnp.zeros(h_local.shape[:-1], jnp.float32)
    ht = jnp.concatenate(
        [h_local, d_skip.astype(jnp.float32)[..., None]], axis=-1)
    toep = jax.lax.dot_general(
        ht, jnp.asarray(oh), (((ht.ndim - 1,), (0,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32)
    return toep.reshape(*h_local.shape[:-1], C, C)


def _conv_chunk_tables(poles, residues, C: int):
    """Shared per-layer tables for the chunked conv, all from ONE
    log-doubling power range {p^0..p^(C-1)}:

      h_local (D, C)      first C filter taps   sum_s Re(R p^t)
      pw_r/pw_i (D, S, C) injection weights     p^(C-1-j)   (range reversed)
      tab_r/tab_i (D,S,C) state decay           R p^(t+1)   (p * range, R-folded)
      pc_r/pc_i (D, S)    chunk decay           p^C         (= dec[.., -1])
    """
    p32 = poles.astype(jnp.float32)
    logmag, theta = _pole_log(p32)
    rr = residues[..., 0].astype(jnp.float32)
    ri = residues[..., 1].astype(jnp.float32)
    rng_r, rng_i = _pole_pow_range(logmag, theta, C)
    h_local = jnp.sum(rr[..., None] * rng_r - ri[..., None] * rng_i,
                      axis=1)                                 # (D, C)
    pw_r, pw_i = rng_r[..., ::-1], rng_i[..., ::-1]
    p1m = jnp.exp(logmag)
    p1r = (p1m * jnp.cos(theta))[..., None]                   # (D, S, 1)
    p1i = (p1m * jnp.sin(theta))[..., None]
    dec_r = p1r * rng_r - p1i * rng_i                         # p^(t+1)
    dec_i = p1r * rng_i + p1i * rng_r
    tab_r = rr[..., None] * dec_r - ri[..., None] * dec_i
    tab_i = rr[..., None] * dec_i + ri[..., None] * dec_r
    return h_local, pw_r, pw_i, tab_r, tab_i, dec_r[..., -1], dec_i[..., -1]


def conv_matmul_chunked(u: jax.Array, poles: jax.Array, residues: jax.Array,
                        chunk: int = 128, state: jax.Array | None = None,
                        mesh=None, d_skip: jax.Array | None = None,
                        pallas_prefix: bool = False):
    """Fully-parallel chunked causal conv recast as MXU matmuls.

    Same contract as `fft_causal_conv_chunked` (returns (y (B, D, L) f32,
    modal state (B, D, S, 2) f32 at position L)) but with no sequential
    scan and no FFT:

      * within-chunk: y_i = T_d @ u_i where T_d is the (C, C) lower-
        triangular Toeplitz matrix of the first C filter taps — a batched
        (K, C) @ (C, C) matmul per channel, MXU-resident (the FlashFFTConv
        insight — conv as matmul — applied directly since C is small;
        reference extension point `use_flashfft`,
        `evo/configs/evo-1-8k-base_inference.yml:33`);
      * cross-chunk: the filter's modal form makes the tail exactly
        low-rank — per-chunk injected states via one einsum, combined with
        a Hillis-Steele weighted prefix over the K chunks (log2 K
        elementwise steps, no scan), then decayed into each chunk via a
        second einsum.

    Replaces the XLA-FFT path that measured ~60% of 7B prefill step time
    (BASELINE.md 2026-08-17 decomposition). `mesh` is accepted for
    interface parity and ignored: every op is batched over channels, so
    GSPMD shards it with zero communication.

    `d_skip` (D,), when given, is folded into the Toeplitz diagonal so the
    returned y already includes the skip term d_skip * u — one fewer
    full-size float32 elementwise pass than adding it outside.
    """
    del mesh
    B, D, L = u.shape
    S = poles.shape[1]
    C = min(chunk, L)
    pad = (-L) % C
    if state is not None and pad:
        raise ValueError(
            'segment continuation (state != None) requires L to be a '
            f'multiple of chunk (L={L}, chunk={C})')
    # keep u in its input dtype: the einsums below accumulate in float32
    # (preferred_element_type), so pre-casting bf16 inputs to f32 changes
    # nothing numerically while materializing an extra full-size buffer
    uc_in = u
    if pad:
        # leading zeros convolve to zero and inject nothing into the state
        uc_in = jnp.concatenate(
            [jnp.zeros((B, D, pad), u.dtype), uc_in], axis=-1)
    K = (L + pad) // C

    p32 = poles.astype(jnp.float32)
    logmag, theta = _pole_log(p32)

    # (D, C, C) lower-triangular Toeplitz of the first C taps. Tie the
    # (input-independent) taps to this layer's activations so XLA cannot
    # hoist all 29 layers' (D, C, C) Toeplitz tensors (~270 MB each at 7B)
    # to program start, which would OOM next to the resident weights.
    h_local, pw_r, pw_i, tab_r, tab_i, _, _ = \
        _conv_chunk_tables(poles, residues, C)
    h_local, uc_in = jax.lax.optimization_barrier((h_local, uc_in))
    toep = _toeplitz_from_taps(h_local, C, d_skip)            # (D, C, C)

    uc = uc_in.reshape(B, D, K, C)
    # HIGH = bf16_3x on TPU (~1e-6 rel): ample for 1e-3 parity,
    # ~40% faster compile than HIGHEST at these batched shapes
    hi = jax.lax.Precision.HIGH
    y_local = jnp.einsum('dtc,bdkc->bdkt', toep, uc, precision=hi,
                         preferred_element_type=jnp.float32)

    # per-chunk injected state: sum_j p^(C-1-j) u_i[j]
    inj_r = jnp.einsum('bdkc,dsc->bdks', uc, pw_r, precision=hi,
                       preferred_element_type=jnp.float32)
    inj_i = jnp.einsum('bdkc,dsc->bdks', uc, pw_i, precision=hi,
                       preferred_element_type=jnp.float32)

    # inclusive weighted prefix over chunks: s_k = sum_{j<=k} a^(k-j) inj_j,
    # a = p^C. Fast path: one VMEM Pallas pass (ops/pallas_prefix.py);
    # fallback: Hillis-Steele doubling, log2(K) full elementwise passes.
    use_kernel = False
    if pallas_prefix and state is None:
        from evo_tpu.ops.pallas_prefix import (modal_prefix_pallas,
                                               modal_prefix_supported)
        use_kernel = modal_prefix_supported((B, D, K, S))
    if use_kernel:
        br, bi, fr, fi = modal_prefix_pallas(inj_r, inj_i, logmag, theta, C)
        sr = si = None
    else:
        sr, si = inj_r, inj_i                                 # (B, D, K, S)
        step = 1
        while step < K:
            ar, ai = _pole_pow_tables(logmag, theta,
                                      [C * step])             # (D, S, 1)
            ar = ar[None, :, :, 0][:, :, None, :]             # (1, D, 1, S)
            ai = ai[None, :, :, 0][:, :, None, :]
            z = jnp.zeros((B, D, step, S), jnp.float32)
            sr_sh = jnp.concatenate([z, sr[:, :, :-step]], axis=2)
            si_sh = jnp.concatenate([z, si[:, :, :-step]], axis=2)
            sr, si = sr + ar * sr_sh - ai * si_sh, \
                si + ar * si_sh + ai * sr_sh
            step *= 2

        # state entering chunk k: a^k s0 + incl_{k-1}
        z1 = jnp.zeros((B, D, 1, S), jnp.float32)
        br = jnp.concatenate([z1, sr[:, :, :-1]], axis=2)     # (B, D, K, S)
        bi = jnp.concatenate([z1, si[:, :, :-1]], axis=2)
    if state is not None:
        s0r, s0i = state[..., 0], state[..., 1]               # (B, D, S)
        # (p^C)^k via the doubling range on the scaled log/angle
        ak_r, ak_i = _pole_pow_range(C * logmag, C * theta,
                                     K + 1)                   # (D, S, K+1)
        ak_r = jnp.moveaxis(ak_r, -1, 1)[None]                # (1, D, K+1, S)
        ak_i = jnp.moveaxis(ak_i, -1, 1)[None]
        br = br + ak_r[:, :, :K] * s0r[:, :, None] - \
            ak_i[:, :, :K] * s0i[:, :, None]
        bi = bi + ak_r[:, :, :K] * s0i[:, :, None] + \
            ak_i[:, :, :K] * s0r[:, :, None]
        fr = ak_r[:, :, K] * s0r - ak_i[:, :, K] * s0i + sr[:, :, -1]
        fi = ak_r[:, :, K] * s0i + ak_i[:, :, K] * s0r + si[:, :, -1]
    elif not use_kernel:
        fr, fi = sr[:, :, -1], si[:, :, -1]

    # in-chunk decay of the entering state: y_state[t] = Re(s . R p^(t+1))
    y_state = (jnp.einsum('bdks,dsc->bdkc', br, tab_r, precision=hi,
                          preferred_element_type=jnp.float32)
               - jnp.einsum('bdks,dsc->bdkc', bi, tab_i, precision=hi,
                            preferred_element_type=jnp.float32))

    y = (y_local + y_state).reshape(B, D, L + pad)[..., pad:]
    return y, jnp.stack([fr, fi], axis=-1)


def direct_causal_conv(u: jax.Array, h: jax.Array) -> jax.Array:
    """O(L^2) reference oracle for tests: same contract as fft_causal_conv."""
    L = u.shape[-1]
    u32 = u.astype(jnp.float32)
    h32 = h.astype(jnp.float32)
    # y[t] = sum_k h[k] u[t-k]
    cols = []
    for t in range(L):
        k = jnp.arange(t + 1)
        cols.append(jnp.sum(h32[..., k[::-1]] * u32[..., :t + 1], axis=-1))
    return jnp.stack(cols, axis=-1)


def fir_causal_conv(z: jax.Array, w: jax.Array, b: jax.Array | None,
                    state: jax.Array | None = None):
    """Depthwise causal FIR (short filter, length `K`, reference K=3).

    z: (B, *C, L); w: (*C, K) taps ordered [oldest .. newest] so that
        y[c, t] = sum_j w[c, j] * z[c, t - (K-1-j)]  (+ b[c])
    state: (B, *C, K-1) trailing inputs from a previous segment (None = zeros,
        i.e. left zero-padding). `*C` is any number of channel axes (the
    Hyena layer uses (3, C) so TP can shard C without touching streams).

    Returns (y, new_state) with y: (B, *C, L) in z.dtype and new_state the
    last K-1 inputs of the concatenated stream.
    """
    L = z.shape[-1]
    K = w.shape[-1]
    if state is None:
        state = jnp.zeros(z.shape[:-1] + (K - 1,), dtype=z.dtype)
    zc = jnp.concatenate([state.astype(z.dtype), z], axis=-1)  # (B,*C,L+K-1)
    y = jnp.zeros(z.shape, dtype=jnp.float32)
    for j in range(K):
        y = y + w[None, ..., j, None].astype(jnp.float32) * \
            zc[..., j:j + L].astype(jnp.float32)
    if b is not None:
        y = y + b[None, ..., None].astype(jnp.float32)
    new_state = zc[..., L:]
    return y.astype(z.dtype), new_state


def fir_step(z_t: jax.Array, w: jax.Array, b: jax.Array | None,
             state: jax.Array):
    """Single-token FIR step. z_t: (B, *C); state: (B, *C, K-1)."""
    zc = jnp.concatenate([state, z_t[..., None]], axis=-1)  # (B, *C, K)
    y = jnp.sum(zc.astype(jnp.float32) * w.astype(jnp.float32)[None], axis=-1)
    if b is not None:
        y = y + b.astype(jnp.float32)[None]
    return y.astype(z_t.dtype), zc[..., 1:]


def modal_state_init(batch: int, channels: int, state_size: int) -> jax.Array:
    """Zero modal state, stored as (B, D, S, 2) float32 (real, imag)."""
    return jnp.zeros((batch, channels, state_size, 2), dtype=jnp.float32)


def modal_step(u_t: jax.Array, poles: jax.Array, residues: jax.Array,
               d_skip: jax.Array, state: jax.Array):
    """One decode step of the modal recurrence.

    u_t: (B, D) input sample; state: (B, D, S, 2) float32.
    Returns (y_t (B, D) float32, new_state).
    """
    pr, pi = poles[..., 0], poles[..., 1]          # (D, S)
    sr, si = state[..., 0], state[..., 1]          # (B, D, S)
    u32 = u_t.astype(jnp.float32)
    # s' = p * s + u
    nsr = pr[None] * sr - pi[None] * si + u32[..., None]
    nsi = pi[None] * sr + pr[None] * si
    rr, ri = residues[..., 0], residues[..., 1]
    # y = Re(sum_s R * s') + D * u
    y = jnp.sum(rr[None] * nsr - ri[None] * nsi, axis=-1) + \
        d_skip.astype(jnp.float32)[None] * u32
    return y, jnp.stack([nsr, nsi], axis=-1)


def modal_prefill_state(u: jax.Array, poles: jax.Array,
                        chunk: int = 128) -> jax.Array:
    """Modal state after consuming u[..., 0:L] (so decode can continue at L).

    u: (B, D, L); poles: (D, S, 2) float32. Returns (B, D, S, 2) float32 with
      s[d,k] = sum_{tau=0}^{L-1} p[d,k]^(L-1-tau) * u[d, tau]

    Evaluated as a chunked scan: per chunk of C samples,
      s <- p^C * s + sum_j p^(C-1-j) u_j
    which streams (B, D, C)x(D, S, C) contractions onto the MXU and keeps the
    pole-power tables at (D, S, C) instead of (D, S, L).
    """
    B, D, L = u.shape
    S = poles.shape[1]
    C = min(chunk, L)
    pad = (-L) % C
    if pad:
        # left-pad with zeros: prepending zeros doesn't change the state
        u = jnp.concatenate(
            [jnp.zeros((B, D, pad), dtype=u.dtype), u], axis=-1)
        L = L + pad
    K = L // C

    logmag, theta = _pole_log(poles.astype(jnp.float32))
    # p^(C-1-j) injection weights and p^C from ONE log-doubling range
    rng_r, rng_i = _pole_pow_range(logmag, theta, C)
    pw_r, pw_i = rng_r[..., ::-1], rng_i[..., ::-1]     # (D, S, C)
    p1m = jnp.exp(logmag)
    pc_r = p1m * jnp.cos(theta) * rng_r[..., -1] \
        - p1m * jnp.sin(theta) * rng_i[..., -1]         # p * p^(C-1)
    pc_i = p1m * jnp.cos(theta) * rng_i[..., -1] \
        + p1m * jnp.sin(theta) * rng_r[..., -1]

    u32 = u.astype(jnp.float32).reshape(B, D, K, C)

    def body(carry, uc):
        sr, si = carry                                  # (B, D, S)
        # uc: (B, D, C)
        inj_r = jnp.einsum('bdc,dsc->bds', uc, pw_r,
                           preferred_element_type=jnp.float32)
        inj_i = jnp.einsum('bdc,dsc->bds', uc, pw_i,
                           preferred_element_type=jnp.float32)
        nsr = pc_r[None] * sr - pc_i[None] * si + inj_r
        nsi = pc_i[None] * sr + pc_r[None] * si + inj_i
        return (nsr, nsi), None

    init = (jnp.zeros((B, D, S), jnp.float32), jnp.zeros((B, D, S),
                                                         jnp.float32))
    (sr, si), _ = jax.lax.scan(body, init,
                               jnp.moveaxis(u32, 2, 0))  # scan over K chunks
    return jnp.stack([sr, si], axis=-1)
