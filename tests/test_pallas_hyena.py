"""Fused Hyena-mixer-core Pallas kernel vs the jnp composition oracle
(interpret mode on CPU; the real TPU lowering runs in bench/production
and is re-verified on-chip by `bench.py --verify`)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from evo_tpu.ops import fftconv
from evo_tpu.ops.pallas_hyena import (hyena_mixer_pallas,
                                      hyena_mixer_supported)


def _random_modal(key, C, S):
    """Stable random poles + residues, (C, S, 2) float32."""
    k1, k2, k3 = jax.random.split(key, 3)
    mag = jax.random.uniform(k1, (C, S), minval=0.5, maxval=0.98)
    ang = jax.random.uniform(k2, (C, S), minval=-np.pi, maxval=np.pi)
    poles = jnp.stack([mag * jnp.cos(ang), mag * jnp.sin(ang)], axis=-1)
    residues = jax.random.normal(k3, (C, S, 2)) * 0.3
    return poles.astype(jnp.float32), residues.astype(jnp.float32)


def _oracle(z, fir_w, fir_b, poles, residues, d_skip, chunk, state=None):
    """The unfused composition from layers/hyena.py (jnp path)."""
    fir_in = state[0] if state is not None else None
    zp, fir_state = fftconv.fir_causal_conv(z, fir_w, fir_b, fir_in)
    x2, x1, v = zp[:, 0], zp[:, 1], zp[:, 2]
    u = x1 * v
    y, iir = fftconv.conv_matmul_chunked(
        u, poles, residues, chunk,
        state=state[1] if state is not None else None, d_skip=d_skip)
    return x2 * y.astype(z.dtype), iir, fir_state


@pytest.mark.parametrize('B,C,L,chunk,bias', [
    (2, 8, 32, 8, True),
    (1, 16, 64, 16, False),
    (1, 8, 128, 8, True),     # multi-tile would need L > 2048; this still
                              # exercises T=16 chunks in one tile
])
def test_fused_mixer_matches_oracle(B, C, L, chunk, bias):
    S = 4
    ks = jax.random.split(jax.random.PRNGKey(0), 6)
    z = jax.random.normal(ks[0], (B, 3, C, L), jnp.float32)
    fir_w = jax.random.normal(ks[1], (3, C, 3), jnp.float32) * 0.5
    fir_b = (jax.random.normal(ks[2], (3, C), jnp.float32) * 0.1
             if bias else None)
    poles, residues = _random_modal(ks[3], C, S)
    d_skip = jax.random.normal(ks[4], (C,), jnp.float32)

    y_want, iir_want, fir_want = _oracle(z, fir_w, fir_b, poles, residues,
                                         d_skip, chunk)
    assert hyena_mixer_supported(z.shape, chunk)
    y, iir, fir_state = hyena_mixer_pallas(
        z, fir_w, fir_b, poles, residues, d_skip, chunk=chunk,
        interpret=True)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_want),
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(iir), np.asarray(iir_want),
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(fir_state), np.asarray(fir_want),
                               rtol=1e-6, atol=1e-6)


def test_fused_mixer_multi_tile_carry():
    """L large enough for several length-tiles: the VMEM modal/FIR carry
    across sequential grid steps must reproduce the single-pass answer.
    Uses a small chunk so Lt caps below L (Lt max = 2048 but tile choice
    is the largest pow2*chunk <= 2048 dividing L; with chunk=8, L=64 and
    a hand-shrunk tile this exercises >1 tile)."""
    B, C, L, chunk, S = 1, 8, 4096, 64, 4
    ks = jax.random.split(jax.random.PRNGKey(1), 5)
    z = (jax.random.normal(ks[0], (B, 3, C, L), jnp.float32) * 0.5)
    fir_w = jax.random.normal(ks[1], (3, C, 3), jnp.float32) * 0.5
    poles, residues = _random_modal(ks[2], C, S)
    d_skip = jax.random.normal(ks[3], (C,), jnp.float32)

    y_want, iir_want, _ = _oracle(z, fir_w, None, poles, residues, d_skip,
                                  chunk)
    # L=4096 -> Lt=2048 -> 2 sequential tiles with carried state
    y, iir, _ = hyena_mixer_pallas(z, fir_w, None, poles, residues, d_skip,
                                   chunk=chunk, interpret=True)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_want),
                               rtol=5e-4, atol=5e-4)
    np.testing.assert_allclose(np.asarray(iir), np.asarray(iir_want),
                               rtol=5e-4, atol=5e-4)


def test_fused_mixer_segment_continuation():
    """Running two half-sequences with carried (fir, iir) state equals one
    full-sequence run — the segmented-scoring contract."""
    B, C, L, chunk, S = 1, 8, 64, 8, 4
    ks = jax.random.split(jax.random.PRNGKey(2), 5)
    z = jax.random.normal(ks[0], (B, 3, C, L), jnp.float32)
    fir_w = jax.random.normal(ks[1], (3, C, 3), jnp.float32) * 0.5
    fir_b = jax.random.normal(ks[2], (3, C), jnp.float32) * 0.1
    poles, residues = _random_modal(ks[3], C, S)
    d_skip = jax.random.normal(ks[4], (C,), jnp.float32)

    y_full, iir_full, fir_full = hyena_mixer_pallas(
        z, fir_w, fir_b, poles, residues, d_skip, chunk=chunk,
        interpret=True)
    h = L // 2
    y1, iir1, fir1 = hyena_mixer_pallas(
        z[..., :h], fir_w, fir_b, poles, residues, d_skip, chunk=chunk,
        interpret=True)
    y2, iir2, fir2 = hyena_mixer_pallas(
        z[..., h:], fir_w, fir_b, poles, residues, d_skip, chunk=chunk,
        state=(fir1, iir1), interpret=True)
    np.testing.assert_allclose(np.asarray(jnp.concatenate([y1, y2], -1)),
                               np.asarray(y_full), rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(iir2), np.asarray(iir_full),
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(fir2), np.asarray(fir_full),
                               rtol=1e-6, atol=1e-6)


def test_fused_mixer_bf16():
    """bfloat16 activations: kernel rounds at the same points as the jnp
    composition (FIR output, conv output) so results agree to bf16 noise."""
    B, C, L, chunk, S = 1, 16, 64, 16, 4
    ks = jax.random.split(jax.random.PRNGKey(3), 5)
    z = jax.random.normal(ks[0], (B, 3, C, L), jnp.bfloat16)
    fir_w = jax.random.normal(ks[1], (3, C, 3), jnp.float32) * 0.5
    poles, residues = _random_modal(ks[2], C, S)
    d_skip = jax.random.normal(ks[3], (C,), jnp.float32)

    y_want, iir_want, _ = _oracle(z, fir_w, None, poles, residues, d_skip,
                                  chunk)
    y, iir, _ = hyena_mixer_pallas(z, fir_w, None, poles, residues, d_skip,
                                   chunk=chunk, interpret=True)
    np.testing.assert_allclose(
        np.asarray(y, np.float32), np.asarray(y_want, np.float32),
        rtol=3e-2, atol=3e-2)
    np.testing.assert_allclose(np.asarray(iir), np.asarray(iir_want),
                               rtol=3e-2, atol=3e-2)


def test_fused_mixer_sharded_specs():
    """The shard_map composition used by hyena_full under a mesh (channel
    axis on tp) matches the unsharded kernel."""
    from jax.sharding import PartitionSpec as P
    from evo_tpu.parallel.mesh import make_mesh
    B, C, L, chunk, S = 2, 32, 32, 8, 4   # C/tp = 8 = the minimum block
    mesh = make_mesh(dp=2, tp=4)
    ks = jax.random.split(jax.random.PRNGKey(4), 5)
    z = jax.random.normal(ks[0], (B, 3, C, L), jnp.float32)
    fir_w = jax.random.normal(ks[1], (3, C, 3), jnp.float32) * 0.5
    fir_b = jax.random.normal(ks[2], (3, C), jnp.float32) * 0.1
    poles, residues = _random_modal(ks[3], C, S)
    d_skip = jax.random.normal(ks[4], (C,), jnp.float32)

    want = hyena_mixer_pallas(z, fir_w, fir_b, poles, residues, d_skip,
                              chunk=chunk, interpret=True)
    got = jax.shard_map(
        lambda zz, fw, fb, pp, rr, dd: hyena_mixer_pallas(
            zz, fw, fb, pp, rr, dd, chunk=chunk, interpret=True),
        mesh=mesh,
        in_specs=(P('dp', None, 'tp', None), P(None, 'tp', None),
                  P(None, 'tp'), P('tp', None, None), P('tp', None, None),
                  P('tp',)),
        out_specs=(P('dp', 'tp', None), P('dp', 'tp', None, None),
                   P('dp', None, 'tp', None)),
        check_vma=False)(z, fir_w, fir_b, poles, residues, d_skip)
    for g, w in zip(got, want):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w),
                                   rtol=1e-5, atol=1e-5)


def test_model_integration_fused(monkeypatch):
    """model.forward / prefill with the fused mixer active (use_pallas=
    'always', kernel forced to interpret mode) matches the jnp path —
    covers the hyena_full wiring, not just the kernel math."""
    import functools
    from evo_tpu import model as model_lib
    from evo_tpu.config import tiny_config
    import evo_tpu.ops.pallas_hyena as ph
    monkeypatch.setattr(
        ph, 'hyena_mixer_pallas',
        functools.partial(hyena_mixer_pallas, interpret=True))

    cfg_ref = tiny_config(attn_layer_idxs=())        # all-Hyena, no flash
    cfg_fused = cfg_ref.replace(use_pallas='always', hyena_fused_mixer=True)
    params = model_lib.init_params(jax.random.PRNGKey(0), cfg_ref)
    ids = jax.random.randint(jax.random.PRNGKey(1), (2, 64), 0, 512)

    lg_ref = model_lib.forward(params, cfg_ref, ids)
    lg_fused = model_lib.forward(params, cfg_fused, ids)
    np.testing.assert_allclose(np.asarray(lg_fused), np.asarray(lg_ref),
                               rtol=2e-4, atol=2e-4)

    # prefill -> decode seam: fused prefill's collected state must continue
    # bit-compatibly under the jnp decode step
    cache_ref = model_lib.init_cache(cfg_ref, 2, 80)
    cache_fused = model_lib.init_cache(cfg_fused, 2, 80)
    lg_p_ref, cache_ref = model_lib.prefill(params, cfg_ref, ids, cache_ref)
    lg_p_fused, cache_fused = model_lib.prefill(params, cfg_fused, ids,
                                                cache_fused)
    np.testing.assert_allclose(np.asarray(lg_p_fused), np.asarray(lg_p_ref),
                               rtol=2e-4, atol=2e-4)
    step_ids = jax.random.randint(jax.random.PRNGKey(2), (2, 1), 0, 512)
    lg_s_ref, _ = model_lib.decode_step(params, cfg_ref, step_ids, cache_ref)
    lg_s_fused, _ = model_lib.decode_step(params, cfg_fused, step_ids,
                                          cache_fused)
    np.testing.assert_allclose(np.asarray(lg_s_fused), np.asarray(lg_s_ref),
                               rtol=2e-4, atol=2e-4)
