"""RMSNorm (reference: engine RMSNorm with eps from config, `eps: 1.0e-6`,
`evo/configs/evo-1-8k-base_inference.yml:13`).

Statistics in float32, output cast back to the input dtype — required for the
1e-3 parity budget under bf16 (SURVEY.md §7 hard part #2). A Pallas fused
variant (reference extension point `use_flash_rmsnorm`, config:31) plugs in
behind the same function signature in evo_tpu.ops.pallas_rmsnorm.
"""

from __future__ import annotations

import jax.numpy as jnp


def rmsnorm(x, scale, eps: float = 1e-6):
    x32 = x.astype(jnp.float32)
    var = jnp.mean(x32 * x32, axis=-1, keepdims=True)
    y = x32 * jnp.reciprocal(jnp.sqrt(var + eps))
    return (y * scale.astype(jnp.float32)).astype(x.dtype)
