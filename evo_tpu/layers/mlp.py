"""Gated MLP (reference: engine ParallelGatedMLP; `mlp_activation: gelu`,
config:38; inner width auto-derived, SURVEY.md §2.A).

    y = w3( act(x @ w1) * (x @ w2) )

w1/w2: (D, I) column-parallel under TP; w3: (I, D) row-parallel.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from evo_tpu.quant import is_int4, qdot, wcast

_ACTS = {
    'gelu': lambda x: jax.nn.gelu(x, approximate=False),
    'gelu_tanh': lambda x: jax.nn.gelu(x, approximate=True),
    'silu': jax.nn.silu,
    'relu': jax.nn.relu,
    'identity': lambda x: x,
}


def gated_mlp(p, x, activation: str = 'gelu', act_quant: bool = False):
    act = _ACTS[activation]
    dt = x.dtype
    if act_quant or is_int4(p['w1']):
        # int8 x int8 fast path, or weight-only int4 — qdot dispatches
        # per leaf (cfg.act_quant / weight_quant; evo_tpu/quant.py)
        z1 = qdot(x, p['w1'])
        z2 = qdot(x, p['w2'])
    else:
        z1 = x @ wcast(p['w1'], dt)
        z2 = x @ wcast(p['w2'], dt)
    if 'lora_w1' in p or 'lora_w2' in p:
        # LoRA side paths (evo_tpu/lora.py): rank-r corrections added to
        # the frozen matmuls' outputs, pre-activation
        from evo_tpu.lora import delta1
        if 'lora_w1' in p:
            z1 = z1 + delta1(x, p['lora_w1']).astype(z1.dtype)
        if 'lora_w2' in p:
            z2 = z2 + delta1(x, p['lora_w2']).astype(z2.dtype)
    g = act(z1) * z2
    if act_quant or is_int4(p['w3']):
        out = qdot(g, p['w3'])
    else:
        out = g @ wcast(p['w3'], dt)
    if 'lora_w3' in p:
        from evo_tpu.lora import delta1
        out = out + delta1(g, p['lora_w3']).astype(out.dtype)
    return out
