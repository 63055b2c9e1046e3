"""Gated MLP (reference: engine ParallelGatedMLP; `mlp_activation: gelu`,
config:38; inner width auto-derived, SURVEY.md §2.A).

    y = w3( act(x @ w1) * (x @ w2) )

w1/w2: (D, I) column-parallel under TP; w3: (I, D) row-parallel.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_ACTS = {
    'gelu': lambda x: jax.nn.gelu(x, approximate=False),
    'gelu_tanh': lambda x: jax.nn.gelu(x, approximate=True),
    'silu': jax.nn.silu,
    'relu': jax.nn.relu,
    'identity': lambda x: x,
}


def gated_mlp(p, x, activation: str = 'gelu'):
    act = _ACTS[activation]
    dt = x.dtype
    z1 = x @ p['w1'].astype(dt)
    z2 = x @ p['w2'].astype(dt)
    return (act(z1) * z2) @ p['w3'].astype(dt)
