"""LoRA (low-rank adaptation) fine-tuning for the 7B on small-HBM chips.

Why this exists: two of the reference's five checkpoints are full
fine-tunes (crispr/transposon, `/root/reference/evo/models.py:13-19`)
produced on large-HBM GPU clusters. The full-fine-tune path here
(`evo_tpu/training.py`) needs fp32 masters + two Adam moments = 12 bytes
per parameter (~84 GB at 7B) — a multi-chip job by construction. LoRA
makes the fine-tune story single-chip: the base weights stay frozen in
bf16 (12.9 GB resident, exactly the serving footprint) and only the
low-rank factors (rank 8 over the seven projection weights ≈ 0.1% of
model parameters) carry masters and optimizer state.

TPU-first design decisions:

  * **The adapted weight is never materialized.** Each projection site
    computes the side path `(x @ A) @ (alpha/r · B)` and adds it to the
    frozen matmul's output (layers/{mlp,hyena,attention}.py look for
    sibling `lora_<name>` keys in their param dict). Materializing
    `W + AB` per layer would put a second full weight tree in HBM next
    to the frozen one (2 x 12.9 GB — OOM on 16 GB chips); the side path
    costs O(r·(d_in+d_out)) FLOPs and bytes instead, which XLA fuses
    into the surrounding elementwise work.
  * **Adapters ride the layer-stacking scan.** Hyena runs execute as one
    `lax.scan` over stacked layer params (model.py `layer_segments`);
    adapters for a run are stacked along the same leading axis so they
    enter the scan as ordinary carried xs — compile time stays O(1) in
    depth.
  * **Scale folds at attach time.** `attach_lora` multiplies `alpha/r`
    into B once (B is tiny) so the per-layer sites are a bare pair of
    matmuls with no scalar bookkeeping inside the scan.
  * **Inference merges.** The decode paths (`hyena_step`, `mha_step`)
    deliberately do not read adapter keys — a per-token side path would
    add dispatch work to the bandwidth-bound decode loop for no benefit.
    `merge_lora` folds the adapters into the base weights once
    (`W + alpha/r · A @ B`, computed in fp32, cast back to the weight
    dtype) and the merged tree serves through every existing path
    (scoring, generation, serving, quantized modes) unchanged.

Adapted weights (names as in `model.init_params`):

    mlp.w1 (D,I)  mlp.w2 (D,I)  mlp.w3 (I,D)
    attn.wqkv (D,3,H,Dh)  attn.wo (H,Dh,D)
    hyena.w_in (D,3,C)    hyena.w_out (D,D)

For a weight of shape (*in_dims, *out_dims) the factors are
A: (*in_dims, r) and B: (r, *out_dims); `wo` is the one target with two
input dims (H, Dh). A is Kaiming-init, B zero — the adapted model is
exactly the base model at step 0 (standard LoRA init).
"""

from __future__ import annotations

from typing import Any, Callable, Dict, NamedTuple, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from evo_tpu.config import ModelConfig
from evo_tpu.training import next_token_loss

# target weight name -> number of leading input dims in its layout
_TARGET_IN_DIMS = {
    'w1': 1, 'w2': 1, 'w3': 1,        # mlp
    'wqkv': 1, 'wo': 2,               # attention
    'w_in': 1, 'w_out': 1,            # hyena projections
}
DEFAULT_TARGETS = tuple(_TARGET_IN_DIMS)


def init_lora(rng: jax.Array, params: Any, cfg: ModelConfig,
              rank: int = 8,
              targets: Sequence[str] = DEFAULT_TARGETS) -> Any:
    """Build the adapter tree mirroring `params['segments']`.

    Returns [{'attn': {'wqkv': {'a','b'}, ...}, 'mlp': {...}} |
             {'stack': {'hyena': {...}, 'mlp': {...}}}] — the same
    segment layout as the base tree, adapters in fp32 (they are the
    trained masters). Stacked segments get a matching leading run axis.
    """
    targets = set(targets)
    unknown = targets - set(_TARGET_IN_DIMS)
    if unknown:
        raise ValueError(f'unknown LoRA targets {sorted(unknown)}; '
                         f'choose from {sorted(_TARGET_IN_DIMS)}')
    keys = iter(jax.random.split(rng, 4096))

    def pair(w, name, stacked: bool):
        k_in = _TARGET_IN_DIMS[name]
        shape = w.shape[1:] if stacked else w.shape
        in_dims, out_dims = shape[:k_in], shape[k_in:]
        fan_in = int(np.prod(in_dims))
        lead = (w.shape[0],) if stacked else ()
        a = (jax.random.normal(next(keys), (*lead, *in_dims, rank),
                               jnp.float32) / np.sqrt(fan_in))
        b = jnp.zeros((*lead, rank, *out_dims), jnp.float32)
        return {'a': a, 'b': b}

    def block(src: Dict[str, Any], stacked: bool) -> Dict[str, Any]:
        return {n: pair(w, n, stacked) for n, w in src.items()
                if n in targets}

    out = []
    for seg in params['segments']:
        if 'stack' in seg:
            st = seg['stack']
            out.append({'stack': {'hyena': block(st['hyena'], True),
                                  'mlp': block(st['mlp'], True)}})
        else:
            out.append({'attn': block(seg['attn'], False),
                        'mlp': block(seg['mlp'], False)})
    return out


def lora_rank(lora: Any) -> int:
    """Rank r, read off the first A factor's trailing dim."""
    for seg in lora:
        d = seg.get('stack', seg)
        for blk in d.values():
            for pr in blk.values():
                return int(pr['a'].shape[-1])
    raise ValueError('empty adapter tree')


def attach_lora(params: Any, lora: Any, alpha: float = 16.0) -> Any:
    """Insert `lora_<name>` sibling keys into the target param dicts.

    Shallow dict rebuild — no base weight is copied. The alpha/r scale
    is folded into B here (see module docstring). The returned tree
    feeds `model.forward`/`prefill` directly; decode paths ignore the
    extra keys (use `merge_lora` for generation/serving).
    """
    s = alpha / lora_rank(lora)

    def adapt(dst: Dict[str, Any], add: Dict[str, Any]) -> Dict[str, Any]:
        new = dict(dst)
        for n, pr in add.items():
            new[f'lora_{n}'] = {'a': pr['a'], 'b': pr['b'] * s}
        return new

    out = dict(params)
    segs = []
    for seg, ls in zip(params['segments'], lora):
        if 'stack' in seg:
            st = seg['stack']
            segs.append({'stack': {
                **st,
                'hyena': adapt(st['hyena'], ls['stack']['hyena']),
                'mlp': adapt(st['mlp'], ls['stack']['mlp']),
            }})
        else:
            segs.append({**seg,
                         'attn': adapt(seg['attn'], ls['attn']),
                         'mlp': adapt(seg['mlp'], ls['mlp'])})
    out['segments'] = segs
    return out


def merge_lora(params: Any, lora: Any, alpha: float = 16.0,
               donate: bool = False) -> Any:
    """Fold adapters into the base weights: W + alpha/r * A @ B.

    The product runs in fp32 and casts back to each weight's dtype, so
    the merged tree is a drop-in for every inference path (including
    `quant.quantize_params` afterwards).

    donate=False (default): base tree is not mutated. donate=True folds
    leaf-at-a-time with buffer donation — each base weight's buffer is
    reused for its merged output and the base array INVALIDATED, so base
    and merged trees never coexist on the device. Required to merge a 7B
    tree on a 16 GB chip: the non-donating merge peaks at two full
    weight trees plus an fp32 temp and died RESOURCE_EXHAUSTED right
    after on-chip LoRA training (observed 2026-08-20, bench spec_lora).
    """
    s = alpha / lora_rank(lora)

    def _fold(w, a, b):
        b = b * s
        if b.ndim + a.ndim - 2 == w.ndim:          # unstacked
            delta = jnp.tensordot(a, b, axes=[[-1], [0]])
        else:                                       # stacked run
            delta = jax.vmap(
                lambda ai, bi: jnp.tensordot(ai, bi, axes=[[-1], [0]])
            )(a, b)
        return (w.astype(jnp.float32) + delta).astype(w.dtype)

    # one jitted program per distinct leaf shape; output shape/dtype ==
    # w's, so donation reuses the base buffer in place
    fold_leaf = jax.jit(_fold, donate_argnums=(0,)) if donate else _fold

    def fold_any(w, pr):
        # unstacked: A (*in, r) x B (r, *out); stacked hyena runs carry a
        # leading run axis on both factors -> contract per run via vmap
        return fold_leaf(w, pr['a'], pr['b'])

    def fold_block(dst: Dict[str, Any], add: Dict[str, Any]):
        return {n: (fold_any(w, add[n]) if n in add else w)
                for n, w in dst.items()}

    out = dict(params)
    segs = []
    for seg, ls in zip(params['segments'], lora):
        if 'stack' in seg:
            st = seg['stack']
            segs.append({'stack': {
                **st,
                'hyena': fold_block(st['hyena'], ls['stack']['hyena']),
                'mlp': fold_block(st['mlp'], ls['stack']['mlp']),
            }})
        else:
            segs.append({**seg,
                         'attn': fold_block(seg['attn'], ls['attn']),
                         'mlp': fold_block(seg['mlp'], ls['mlp'])})
    out['segments'] = segs
    return out


# ---------------------------------------------------------------------------
# Layer-site helpers (imported by layers/{mlp,hyena,attention}.py)
# ---------------------------------------------------------------------------

def delta1(x: jax.Array, pr: Dict[str, jax.Array]) -> jax.Array:
    """Side path for a single-input-dim weight: (x @ A) @ B.

    x: (..., d_in); A: (d_in, r); B: (r, *out_dims). Runs in x.dtype —
    rank-r intermediates are small enough that bf16 rounding here is
    far below the adapters' own training noise floor.
    """
    a = pr['a'].astype(x.dtype)
    b = pr['b'].astype(x.dtype)
    xa = x @ a                                   # (..., r)
    return jax.lax.dot_general(
        xa, b,
        (((xa.ndim - 1,), (0,)), ((), ())))      # (..., *out_dims)


def delta2(y: jax.Array, pr: Dict[str, jax.Array]) -> jax.Array:
    """Side path for the two-input-dim `wo` (H, Dh, D): y (B, L, H, Dh)."""
    a = pr['a'].astype(y.dtype)                  # (H, Dh, r)
    b = pr['b'].astype(y.dtype)                  # (r, D)
    return jnp.einsum('blhe,her->blr', y, a) @ b


# ---------------------------------------------------------------------------
# Train step
# ---------------------------------------------------------------------------

class LoraTrainState(NamedTuple):
    lora: Any          # fp32 adapter masters
    opt_state: Any
    step: jax.Array


def init_lora_train_state(lora: Any,
                          optimizer: optax.GradientTransformation
                          ) -> LoraTrainState:
    return LoraTrainState(lora=lora, opt_state=optimizer.init(lora),
                          step=jnp.zeros((), jnp.int32))


def make_lora_train_step(cfg: ModelConfig,
                         optimizer: optax.GradientTransformation,
                         alpha: float = 16.0, mesh=None
                         ) -> Callable[[LoraTrainState, Any, jax.Array,
                                        jax.Array],
                                       Tuple[LoraTrainState, jax.Array]]:
    """step(state, base_params, ids, loss_mask) -> (state', loss).

    `base_params` is an ordinary argument (not a closure constant) so the
    frozen tree is shared with the serving copy instead of being baked
    into the executable. Gradients flow only to the adapters; the base
    weights contribute constants to the backward pass. Set `cfg.remat`
    for long-sequence fine-tunes — the backward then recomputes each
    block instead of keeping 32 layers of activations live.
    """
    # Pallas inference kernels (flash attention, fused rmsnorm) have no
    # VJP; force the differentiable paths (same guard as
    # training.make_train_step)
    if cfg.use_pallas != 'never':
        cfg = cfg.replace(use_pallas='never')

    def train_step(state: LoraTrainState, base_params: Any,
                   ids: jax.Array, loss_mask: jax.Array
                   ) -> Tuple[LoraTrainState, jax.Array]:
        def loss_fn(lora):
            tree = attach_lora(base_params, lora, alpha)
            return next_token_loss(tree, cfg, ids, loss_mask, mesh)

        loss, grads = jax.value_and_grad(loss_fn)(state.lora)
        updates, opt_state = optimizer.update(grads, state.opt_state,
                                              state.lora)
        lora = optax.apply_updates(state.lora, updates)
        return LoraTrainState(lora, opt_state, state.step + 1), loss

    return train_step


# ---------------------------------------------------------------------------
# Adapter checkpoints (portable npz: adapters are small, ~tens of MB)
# ---------------------------------------------------------------------------

def save_lora(lora: Any, path: str, alpha: float = 16.0) -> None:
    flat = {}
    for kp, leaf in jax.tree_util.tree_flatten_with_path(lora)[0]:
        flat[jax.tree_util.keystr(kp)] = np.asarray(leaf)
    flat['__alpha__'] = np.float32(alpha)
    np.savez(path, **flat)


def load_lora(path: str, template: Any) -> Tuple[Any, float]:
    """Rebuild the adapter tree onto `template` (e.g. from `init_lora`
    with the same rank/targets). Returns (lora, alpha)."""
    with np.load(path) as z:
        alpha = float(z['__alpha__'])
        paths, treedef = jax.tree_util.tree_flatten_with_path(template)
        leaves = []
        for kp, tmpl in paths:
            arr = z[jax.tree_util.keystr(kp)]
            if arr.shape != tmpl.shape:
                raise ValueError(
                    f'adapter leaf {jax.tree_util.keystr(kp)} has shape '
                    f'{arr.shape}, template expects {tmpl.shape} '
                    '(rank/targets mismatch?)')
            leaves.append(jnp.asarray(arr, tmpl.dtype))
    return jax.tree_util.tree_unflatten(treedef, leaves), alpha
