"""Unit tests for the Hyena long-conv primitives: FFT conv vs direct-conv
oracle, modal recurrence vs convolution with the materialized filter, and
chunked prefill-state vs step-by-step state (SURVEY.md §4 prescription #1,
§7 hard part #1)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.smoke

from evo_tpu.ops import fftconv


def _random_modal(rng, D=8, S=4):
    k1, k2, k3 = jax.random.split(rng, 3)
    mag = jax.random.uniform(k1, (D, S), jnp.float32, 0.5, 0.98)
    ang = jax.random.uniform(k2, (D, S), jnp.float32, -3.1, 3.1)
    poles = jnp.stack([mag * jnp.cos(ang), mag * jnp.sin(ang)], axis=-1)
    residues = jax.random.normal(k3, (D, S, 2), jnp.float32) / S
    return poles, residues


def test_fft_conv_matches_direct():
    rng = jax.random.PRNGKey(0)
    u = jax.random.normal(rng, (2, 8, 37), jnp.float32)
    h = jax.random.normal(jax.random.PRNGKey(1), (8, 37), jnp.float32)
    got = fftconv.fft_causal_conv(u, h)
    want = fftconv.direct_causal_conv(u, h)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-4)


def test_materialized_filter_first_taps():
    poles, residues = _random_modal(jax.random.PRNGKey(2))
    h = fftconv.materialize_filter(poles, residues, 16)
    p = poles[..., 0] + 1j * poles[..., 1]
    r = residues[..., 0] + 1j * residues[..., 1]
    for t in [0, 1, 5, 15]:
        want = np.real(np.sum(np.asarray(r) * np.asarray(p) ** t, axis=-1))
        np.testing.assert_allclose(np.asarray(h[:, t]), want, rtol=1e-4,
                                   atol=1e-5)


def test_modal_recurrence_matches_convolution():
    """Step-by-step modal recurrence == causal conv with materialized h."""
    D, S, L, B = 8, 4, 24, 2
    poles, residues = _random_modal(jax.random.PRNGKey(3), D, S)
    d_skip = jax.random.normal(jax.random.PRNGKey(4), (D,), jnp.float32)
    u = jax.random.normal(jax.random.PRNGKey(5), (B, D, L), jnp.float32)

    h = fftconv.materialize_filter(poles, residues, L)
    want = fftconv.fft_causal_conv(u, h) + d_skip[None, :, None] * u

    state = fftconv.modal_state_init(B, D, S)
    got = []
    for t in range(L):
        y, state = fftconv.modal_step(u[..., t], poles, residues, d_skip,
                                      state)
        got.append(y)
    got = jnp.stack(got, axis=-1)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-3,
                               atol=1e-4)


@pytest.mark.parametrize('L,chunk', [(24, 8), (37, 16), (16, 16), (5, 8)])
def test_prefill_state_matches_stepwise(L, chunk):
    """Chunked-scan prefill state == state after L sequential modal steps."""
    D, S, B = 8, 4, 2
    poles, residues = _random_modal(jax.random.PRNGKey(6), D, S)
    d_skip = jnp.zeros((D,), jnp.float32)
    u = jax.random.normal(jax.random.PRNGKey(7), (B, D, L), jnp.float32)

    state = fftconv.modal_state_init(B, D, S)
    for t in range(L):
        _, state = fftconv.modal_step(u[..., t], poles, residues, d_skip,
                                      state)
    got = fftconv.modal_prefill_state(u, poles, chunk=chunk)
    np.testing.assert_allclose(np.asarray(got), np.asarray(state),
                               rtol=1e-3, atol=1e-4)


def test_fir_conv_and_step_agree():
    B, C, L, K = 2, 6, 19, 3
    rng = jax.random.PRNGKey(8)
    z = jax.random.normal(rng, (B, C, L), jnp.float32)
    w = jax.random.normal(jax.random.PRNGKey(9), (C, K), jnp.float32)
    b = jax.random.normal(jax.random.PRNGKey(10), (C,), jnp.float32)

    y_full, state_full = fftconv.fir_causal_conv(z, w, b)

    state = jnp.zeros((B, C, K - 1), jnp.float32)
    ys = []
    for t in range(L):
        y_t, state = fftconv.fir_step(z[..., t], w, b, state)
        ys.append(y_t)
    y_steps = jnp.stack(ys, axis=-1)
    np.testing.assert_allclose(np.asarray(y_steps), np.asarray(y_full),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(state), np.asarray(state_full),
                               rtol=1e-6, atol=1e-6)


def test_fir_conv_segment_continuation():
    """Splitting a sequence into two fir_causal_conv calls with carried
    state equals one full call."""
    B, C, L, K = 1, 4, 20, 3
    z = jax.random.normal(jax.random.PRNGKey(11), (B, C, L), jnp.float32)
    w = jax.random.normal(jax.random.PRNGKey(12), (C, K), jnp.float32)
    y_full, _ = fftconv.fir_causal_conv(z, w, None)
    y1, s1 = fftconv.fir_causal_conv(z[..., :7], w, None)
    y2, _ = fftconv.fir_causal_conv(z[..., 7:], w, None, state=s1)
    np.testing.assert_allclose(
        np.asarray(jnp.concatenate([y1, y2], axis=-1)), np.asarray(y_full),
        rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize('L,chunk', [(48, 16), (37, 16), (64, 64), (20, 8)])
def test_chunked_conv_matches_monolithic(L, chunk):
    """Chunk-local FFT + modal state carry == one full-length FFT conv."""
    D, S, B = 6, 4, 2
    poles, residues = _random_modal(jax.random.PRNGKey(20), D, S)
    u = jax.random.normal(jax.random.PRNGKey(21), (B, D, L), jnp.float32)
    h = fftconv.materialize_filter(poles, residues, L)
    want = fftconv.fft_causal_conv(u, h)
    got, state = fftconv.fft_causal_conv_chunked(u, poles, residues, chunk)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-4)
    # final state must equal the chunked-prefill state at position L
    want_state = fftconv.modal_prefill_state(u, poles, chunk=chunk)
    np.testing.assert_allclose(np.asarray(state), np.asarray(want_state),
                               rtol=1e-3, atol=1e-4)


def test_chunked_conv_segment_continuation():
    """Two chunked calls with carried state == one call over the full seq."""
    D, S, B, chunk = 4, 3, 1, 8
    poles, residues = _random_modal(jax.random.PRNGKey(22), D, S)
    u = jax.random.normal(jax.random.PRNGKey(23), (B, D, 32), jnp.float32)
    full, _ = fftconv.fft_causal_conv_chunked(u, poles, residues, chunk)
    y1, s1 = fftconv.fft_causal_conv_chunked(u[..., :16], poles, residues,
                                             chunk)
    y2, _ = fftconv.fft_causal_conv_chunked(u[..., 16:], poles, residues,
                                            chunk, state=s1)
    got = jnp.concatenate([y1, y2], axis=-1)
    np.testing.assert_allclose(np.asarray(got), np.asarray(full),
                               rtol=2e-4, atol=2e-4)


def test_chunked_conv_decode_handoff():
    """State from the chunked conv continues correctly into modal_step."""
    D, S, B, L = 4, 3, 1, 24
    poles, residues = _random_modal(jax.random.PRNGKey(24), D, S)
    d_skip = jax.random.normal(jax.random.PRNGKey(25), (D,), jnp.float32)
    u = jax.random.normal(jax.random.PRNGKey(26), (B, D, L + 1), jnp.float32)
    # oracle: full conv over L+1 samples
    h = fftconv.materialize_filter(poles, residues, L + 1)
    want = fftconv.fft_causal_conv(u, h) + d_skip[None, :, None] * u
    # chunked prefill over L, then one modal step
    _, state = fftconv.fft_causal_conv_chunked(u[..., :L], poles, residues,
                                               chunk=8)
    y_t, _ = fftconv.modal_step(u[..., L], poles, residues, d_skip, state)
    np.testing.assert_allclose(np.asarray(y_t), np.asarray(want[..., -1]),
                               rtol=1e-3, atol=1e-4)


@pytest.mark.parametrize('L,chunk', [(48, 16), (37, 16), (64, 64), (20, 8),
                                     (128, 16)])
def test_matmul_conv_matches_monolithic(L, chunk):
    """Toeplitz-matmul chunked conv == one full-length FFT conv."""
    D, S, B = 6, 4, 2
    poles, residues = _random_modal(jax.random.PRNGKey(40), D, S)
    u = jax.random.normal(jax.random.PRNGKey(41), (B, D, L), jnp.float32)
    h = fftconv.materialize_filter(poles, residues, L)
    want = fftconv.fft_causal_conv(u, h)
    got, state = fftconv.conv_matmul_chunked(u, poles, residues, chunk)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-4)
    want_state = fftconv.modal_prefill_state(u, poles, chunk=chunk)
    np.testing.assert_allclose(np.asarray(state), np.asarray(want_state),
                               rtol=1e-3, atol=1e-4)


def test_matmul_conv_segment_continuation():
    """Two matmul-conv calls with carried state == one full call."""
    D, S, B, chunk = 4, 3, 1, 8
    poles, residues = _random_modal(jax.random.PRNGKey(42), D, S)
    u = jax.random.normal(jax.random.PRNGKey(43), (B, D, 32), jnp.float32)
    full, full_state = fftconv.conv_matmul_chunked(u, poles, residues, chunk)
    y1, s1 = fftconv.conv_matmul_chunked(u[..., :16], poles, residues, chunk)
    y2, s2 = fftconv.conv_matmul_chunked(u[..., 16:], poles, residues,
                                         chunk, state=s1)
    got = jnp.concatenate([y1, y2], axis=-1)
    np.testing.assert_allclose(np.asarray(got), np.asarray(full),
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(s2), np.asarray(full_state),
                               rtol=1e-3, atol=1e-4)


def test_matmul_conv_decode_handoff():
    """State from the matmul conv continues correctly into modal_step."""
    D, S, B, L = 4, 3, 1, 24
    poles, residues = _random_modal(jax.random.PRNGKey(44), D, S)
    d_skip = jax.random.normal(jax.random.PRNGKey(45), (D,), jnp.float32)
    u = jax.random.normal(jax.random.PRNGKey(46), (B, D, L + 1), jnp.float32)
    h = fftconv.materialize_filter(poles, residues, L + 1)
    want = fftconv.fft_causal_conv(u, h) + d_skip[None, :, None] * u
    _, state = fftconv.conv_matmul_chunked(u[..., :L], poles, residues,
                                           chunk=8)
    y_t, _ = fftconv.modal_step(u[..., L], poles, residues, d_skip, state)
    np.testing.assert_allclose(np.asarray(y_t), np.asarray(want[..., -1]),
                               rtol=1e-3, atol=1e-4)


@pytest.mark.parametrize('L,block', [(16, 128), (37, 8), (300, 64)])
def test_factored_filter_matches_direct(L, block):
    """Factored-power materialization == naive per-t oracle."""
    poles, residues = _random_modal(jax.random.PRNGKey(30), D=6, S=5)
    got = fftconv.materialize_filter(poles, residues, L, block=block)
    want = fftconv.materialize_filter_direct(poles, residues, L)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=1e-5)
