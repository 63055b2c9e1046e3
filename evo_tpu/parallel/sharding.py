"""GSPMD sharding trees for the StripedHyena parameter/cache pytrees.

Megatron tensor-parallel layout over the `tp` mesh axis (the plan of
SURVEY.md §2.A "Parallelism strategy inventory"):

  * attention: QKV column-sharded by head (wqkv (D,3,H,Dh) sharded on H),
    out-proj row-sharded by head — the activation psum after `wo` is inserted
    by XLA;
  * Hyena: the channel axis C is sharded everywhere (in-proj columns, FIR
    taps, poles/residues/D, out-proj rows). The long conv is depthwise, so
    under this sharding each chip runs full-length FFTs over its own C/tp
    channels with zero sequence-axis communication — the property that makes
    Hyena exceptionally TP-friendly (SURVEY.md §5 long-context plan);
  * MLP: w1/w2 column-, w3 row-sharded;
  * embedding/unembed: replicated — the table is 512 x 4096 bf16 = 4 MB,
    so replication is free and keeps the token one-hot matmul and the
    tied-unembed logit contraction collective-free;
  * norms and biases-after-row-matmuls: replicated.

Decode caches shard batch on `dp` and heads/channels on `tp`, so a decode
step runs with no resharding of state.
"""

from __future__ import annotations

from typing import Any

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from evo_tpu.config import ModelConfig
from evo_tpu.layers.hyena import HyenaState

# Specs keyed by param name within each scope
_ATTN_SPECS = {
    'wqkv': P(None, None, 'tp', None),   # (D, 3, H, Dh)
    'bqkv': P(None, 'tp', None),         # (3, H, Dh)
    'wo': P('tp', None, None),           # (H, Dh, D) row-parallel
    'bo': P(None),
}
_HYENA_SPECS = {
    'w_in': P(None, None, 'tp'),         # (D, 3, C)
    'b_in': P(None, 'tp'),               # (3, C)
    'fir_w': P(None, 'tp', None),        # (3, C, K)
    'fir_b': P(None, 'tp'),
    'poles': P('tp', None, None),        # (C, S, 2)
    'residues': P('tp', None, None),
    'd_skip': P('tp'),
    'w_out': P('tp', None),              # (C, D) row-parallel
    'b_out': P(None),
}
_MLP_SPECS = {
    'w1': P(None, 'tp'),                 # (D, I)
    'w2': P(None, 'tp'),
    'w3': P('tp', None),                 # (I, D)
}
_TOP_SPECS = {
    # (V, D) = 512 x 4096 bf16 = 4 MB: replicating costs nothing and keeps
    # the token gather / tied-unembed matmul collective-free. (A vocab-
    # sharded layout only pays off for real vocabularies.)
    'embedding': P(None, None),
    'unembed': P(None, None),
    'final_norm': P(None),
    'pre_norm': P(None),
    'post_norm': P(None),
}


def _spec_for_path(path, shape=None) -> P:
    keys = [getattr(k, 'key', getattr(k, 'idx', None)) for k in path]
    name = keys[-1]
    if name in ('q', 's'):
        # weight-only int8 leaf (evo_tpu/quant.py): 'q' keeps the weight's
        # spec; 's' (per-output-channel scales, size-1 contraction axes)
        # drops the spec entries on its broadcast dims
        spec = _spec_for_path(path[:-1], shape)
        if name == 's' and shape is not None:
            spec = P(*[a if d > 1 else None for a, d in zip(spec, shape)])
        return spec
    if 'attn' in keys:
        spec = _ATTN_SPECS[name]
    elif 'hyena' in keys:
        spec = _HYENA_SPECS[name]
    elif 'mlp' in keys:
        spec = _MLP_SPECS[name]
    else:
        spec = _TOP_SPECS[name]
    if 'stack' in keys:
        # stacked hyena run (model.init_params): leading layer axis is the
        # lax.scan axis - never sharded
        spec = P(None, *spec)
    return spec


def param_specs(cfg: ModelConfig) -> Any:
    """PartitionSpec tree matching `model.init_params` (abstract; no mesh).

    When `cfg.weight_quant` is active, the tree matches the post-
    `quantize_params` layout ({'q','s'} leaves on the large projections).
    """
    from evo_tpu import model as model_lib

    def build(key):
        params = model_lib.init_params(key, cfg)
        if cfg.weight_quant == 'int8':
            from evo_tpu.quant import quantize_params
            params = quantize_params(params)
        elif cfg.weight_quant == 'int4':
            # int4 packs/flattens the TP axes and is single-chip only
            # (models.py rejects int4+mesh); fail here too rather than
            # silently returning the unquantized layout
            raise NotImplementedError(
                'param_specs: weight_quant int4 has no sharded layout '
                '(single-chip serving mode, evo_tpu/ops/pallas_int4.py)')
        return params

    shapes = jax.eval_shape(build, jax.random.PRNGKey(0))
    return jax.tree_util.tree_map_with_path(
        lambda path, leaf: _spec_for_path(path, leaf.shape), shapes)


def param_shardings(cfg: ModelConfig, mesh: Mesh) -> Any:
    """NamedSharding tree matching `model.init_params(cfg)`."""
    return jax.tree_util.tree_map(
        lambda spec: NamedSharding(mesh, spec), param_specs(cfg),
        is_leaf=lambda x: isinstance(x, P))


def cache_shardings(cfg: ModelConfig, mesh: Mesh) -> Any:
    """NamedSharding tree matching `model.init_cache(cfg, B, T)`.

    Under an active cp axis, heads/channels shard over the combined
    (tp, cp) axes: decode state is pointwise in the sequence, so the cp
    devices take extra channel shards instead of idling (and prefill's
    collected state lands in exactly this layout — see layers/hyena.py).
    """
    from evo_tpu.parallel.mesh import channel_axes
    ch = channel_axes(mesh)
    layers = []
    for kind, _idxs in cfg.layer_segments():
        if kind == 'attn':
            if cfg.kv_quant == 'int8':
                # head-major quantized layout (B, H, T, Dh) / (B, H, T):
                # heads on the channel axes, like the bf16 cache
                kv = NamedSharding(mesh, P('dp', ch, None, None))
                attn = {'k': kv, 'v': kv,
                        'ks': NamedSharding(mesh, P('dp', ch, None)),
                        'vs': NamedSharding(mesh, P('dp', ch, None))}
            else:
                kv = NamedSharding(mesh, P('dp', None, ch, None))
                attn = {'k': kv, 'v': kv}
            layers.append(attn)
        else:
            # leading axis = stacked layers in the run (scan axis, unsharded)
            layers.append(HyenaState(
                fir=NamedSharding(mesh, P(None, 'dp', None, ch, None)),
                iir=NamedSharding(mesh, P(None, 'dp', ch, None, None)),
            ))
    return {'offset': NamedSharding(mesh, P()), 'layers': layers}


def data_sharding(mesh: Mesh) -> NamedSharding:
    """Token-id batches: (B, L) sharded on batch across dp."""
    return NamedSharding(mesh, P('dp', None))


def residual_constraint(x, mesh):
    """Pin a (B, L, D) activation to the context-parallel residual layout
    (batch on dp, sequence on cp, model dim unsharded). No-op on meshes
    without an active cp axis — round-1 (dp, tp) behavior unchanged."""
    from evo_tpu.parallel.mesh import has_cp
    if not has_cp(mesh):
        return x
    return jax.lax.with_sharding_constraint(
        x, NamedSharding(mesh, P('dp', 'cp', None)))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_params(params: Any, cfg: ModelConfig, mesh: Mesh) -> Any:
    """Place an (unsharded or host-local) param tree onto the mesh."""
    return jax.device_put(params, param_shardings(cfg, mesh))
