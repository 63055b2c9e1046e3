"""On-device token sampling: temperature / top-k / top-p.

Reference contract: `stripedhyena.sample.sample(last_logits, top_k, top_p,
temperature) -> token ids` — the only sampling primitive the application
layer uses (`evo/generation.py:7, 162-167`).

Everything here is jit-safe with STATIC top_k, top_p, and temperature (Python branches select the filter composition; traced values raise) so the whole AR decode loop
— forward step + filter + categorical draw — compiles into one XLA program
(no host round-trip per token, unlike the reference's per-step torch
multinomial).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

NEG_INF = -1e10


def top_k_filter(logits: jax.Array, k: int) -> jax.Array:
    """Keep the k largest logits per row, mask the rest to -inf."""
    if k <= 0 or k >= logits.shape[-1]:
        return logits
    kth = jax.lax.top_k(logits, k)[0][..., -1:]
    return jnp.where(logits < kth, NEG_INF, logits)


def top_p_filter(logits: jax.Array, p: float) -> jax.Array:
    """Nucleus filter: keep the smallest prefix of the sorted distribution
    with cumulative probability >= p (the first token is always kept)."""
    if p >= 1.0:
        return logits
    sorted_logits = jnp.sort(logits, axis=-1)[..., ::-1]
    probs = jax.nn.softmax(sorted_logits.astype(jnp.float32), axis=-1)
    cum = jnp.cumsum(probs, axis=-1)
    # exclusive cumsum: mask tokens that start at/after mass p; the top
    # token is kept unconditionally (with p <= 0 the comparison alone
    # would mask everything and sampling would become uniform)
    keep_sorted = (cum - probs) < p
    keep_sorted = keep_sorted.at[..., 0].set(True)
    # threshold logit = smallest kept logit
    kth = jnp.min(jnp.where(keep_sorted, sorted_logits, jnp.inf), axis=-1,
                  keepdims=True)
    return jnp.where(logits < kth, NEG_INF, logits)


def sample(rng: jax.Array, logits: jax.Array, top_k: int = 0,
           top_p: float = 1.0, temperature: float = 1.0) -> jax.Array:
    """Draw token ids from (B, V) logits. temperature<=0 or top_k==1 = greedy."""
    if temperature <= 0.0 or top_k == 1:
        return jnp.argmax(logits, axis=-1).astype(jnp.int32)
    logits = logits.astype(jnp.float32) / temperature
    logits = top_k_filter(logits, top_k)
    logits = top_p_filter(logits, top_p)
    return jax.random.categorical(rng, logits, axis=-1).astype(jnp.int32)
