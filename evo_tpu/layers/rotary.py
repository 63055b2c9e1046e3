"""Rotary position embeddings, GPT-NeoX style (non-interleaved rotate-half),
with optional linear position interpolation.

Reference behavior: the engine's MHA layers apply rotary embeddings over the
full head dim; the 131k checkpoints extend context by scaling positions with
`rotary_emb_scaling_factor: 16` when `use_interpolated_rotary_pos_emb: true`
(`evo/configs/evo-1-131k-base_inference.yml:39-40`) — positions t are mapped
to t / 16 so the 8k-trained frequencies cover 131k tokens.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def rotary_cos_sin(positions: jax.Array, head_dim: int,
                   base: float = 10000.0,
                   scaling_factor: float = 1.0):
    """cos/sin tables for given integer positions.

    positions: (L,) or (B, L) int32 (the batched form serves per-slot decode
    offsets in evo_tpu.serving). Returns (cos, sin) each
    (*positions.shape, head_dim//2) float32.
    """
    half = head_dim // 2
    inv_freq = 1.0 / (base ** (jnp.arange(0, half, dtype=jnp.float32) / half))
    t = positions.astype(jnp.float32) / scaling_factor
    freqs = t[..., None] * inv_freq  # (*positions.shape, half)
    return jnp.cos(freqs), jnp.sin(freqs)


def apply_rotary(x: jax.Array, cos: jax.Array, sin: jax.Array) -> jax.Array:
    """Apply NeoX-style rotary to x: (B, L, H, Dh).

    cos/sin: (L, Dh//2) shared across the batch, or (B, L, Dh//2) per-row
    positions (continuous-batching decode)."""
    half = x.shape[-1] // 2
    x1 = x[..., :half].astype(jnp.float32)
    x2 = x[..., half:].astype(jnp.float32)
    c = cos[..., :, None, :]
    s = sin[..., :, None, :]
    r1 = x1 * c - x2 * s
    r2 = x2 * c + x1 * s
    return jnp.concatenate([r1, r2], axis=-1).astype(x.dtype)
