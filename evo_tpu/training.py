"""Training / fine-tuning: next-token loss, optimizer step, sharded train step.

The reference ships no training code (inference-only, SURVEY.md §4) but two of
its five checkpoints are fine-tunes (crispr/transposon, `evo/models.py:13-19`),
so a complete framework needs the fine-tuning loop.  Everything here is pure
and composes with the `parallel` shardings: under a (dp, tp) mesh, batches
shard on dp, weights/optimizer state on tp (optimizer state inherits the
param shardings automatically because optax states mirror the param tree).

Precision: the TrainState holds FP32 MASTER params (mixed-precision
training's standard recipe); the forward/backward runs on a cast-down
copy in the original param dtypes, so grads, both Adam moments, and the
parameter update are all fp32. Without masters, bf16 params at
fine-tuning learning rates (~1e-4) round most updates to exactly zero
(ulp(w)/2 = |w| * 2^-9 > 1e-4 for any |w| > ~0.05 — every norm gain and
most projection weights), silently freezing those tensors.
`serving_params` casts a trained state back to the serving dtypes.
"""

from __future__ import annotations

import functools
from typing import Any, Callable, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from evo_tpu import model as model_lib
from evo_tpu.config import ModelConfig


def next_token_loss(params, cfg: ModelConfig, ids: jax.Array,
                    loss_mask: Optional[jax.Array] = None,
                    mesh=None) -> jax.Array:
    """Mean next-token cross-entropy.

    ids: (B, L) int32. Position t's logits predict ids[:, t+1].
    loss_mask: (B, L) {0,1} over *target* positions (mask[:, t] gates the
    prediction of ids[:, t]); None = all positions after the first count.
    Padding convention matches scoring: right-padded, no attention mask,
    correctness from masking the loss only.
    """
    logits = model_lib.forward(params, cfg, ids, mesh=mesh)  # (B, L, V) f32
    logp = jax.nn.log_softmax(logits[:, :-1].astype(jnp.float32), axis=-1)
    tgt = ids[:, 1:]
    nll = -jnp.take_along_axis(logp, tgt[..., None], axis=-1)[..., 0]
    if loss_mask is None:
        mask = jnp.ones_like(nll)
    else:
        mask = loss_mask[:, 1:].astype(jnp.float32)
    return jnp.sum(nll * mask) / jnp.maximum(jnp.sum(mask), 1.0)


class TrainState(NamedTuple):
    params: Any        # fp32 master copies (see module docstring)
    opt_state: Any
    step: jax.Array


def _decay_mask(params) -> Any:
    """AdamW decay mask: skip 1-D tensors (biases, norm gains) and the
    pretrained modal poles/residues — decaying the SSM dynamics toward
    zero corrupts the filters even with no gradient signal."""
    def keep(path, leaf):
        name = getattr(path[-1], 'key', None)
        return leaf.ndim >= 2 and name not in ('poles', 'residues')
    return jax.tree_util.tree_map_with_path(keep, params)


def warmup_cosine(peak_lr: float, total_steps: int,
                  warmup_steps: Optional[int] = None,
                  end_lr_frac: float = 0.1) -> optax.Schedule:
    """Linear warmup from 0 to `peak_lr` over `warmup_steps` (default:
    total_steps/10, capped at 100), then cosine decay to
    `end_lr_frac * peak_lr` at `total_steps` — the standard
    continued-pretraining schedule for the crispr/transposon-style
    finetunes the framework claims end-to-end (the reference's two
    finetuned checkpoints, `evo/models.py:39-45`; SURVEY.md §7 P5)."""
    if warmup_steps is None:
        warmup_steps = min(100, max(1, total_steps // 10))
    warmup_steps = min(warmup_steps, max(total_steps - 1, 1))
    return optax.warmup_cosine_decay_schedule(
        init_value=0.0, peak_value=peak_lr, warmup_steps=warmup_steps,
        decay_steps=total_steps, end_value=end_lr_frac * peak_lr)


def make_optimizer(learning_rate=1e-4, weight_decay: float = 0.01,
                   b1: float = 0.9, b2: float = 0.95,
                   grad_clip: float = 1.0) -> optax.GradientTransformation:
    """AdamW with global-norm clipping. Both moments are fp32 because the
    train step feeds fp32 master params/grads (optax stores nu in the
    grad dtype — mu_dtype alone would leave an 8-mantissa-bit second
    moment under bf16). Weight decay is masked to >=2-D tensors
    excluding poles/residues (standard AdamW practice).

    learning_rate: a float (constant LR) or an optax schedule — e.g.
    `warmup_cosine(...)` above; the step count for the schedule is
    tracked inside the optimizer state (optax injects it)."""
    return optax.chain(
        optax.clip_by_global_norm(grad_clip),
        optax.scale_by_adam(b1=b1, b2=b2, mu_dtype=jnp.float32),
        optax.add_decayed_weights(weight_decay, mask=_decay_mask),
        optax.scale_by_learning_rate(learning_rate),
    )


def serving_params(state: 'TrainState', dtype_tree) -> Any:
    """Cast fp32 masters back to the serving dtypes (dtype_tree: the
    original param tree or a tree of dtypes, e.g. from init_params)."""
    return jax.tree_util.tree_map(
        lambda p, ref: p.astype(getattr(ref, 'dtype', ref)),
        state.params, dtype_tree)


def init_train_state(params, optimizer: optax.GradientTransformation
                     ) -> TrainState:
    """Promotes `params` to fp32 masters (keep the original tree — or its
    eval_shape — around for `serving_params` / the train step's
    cast-down dtypes)."""
    masters = jax.tree_util.tree_map(
        lambda p: p.astype(jnp.float32), params)
    return TrainState(params=masters, opt_state=optimizer.init(masters),
                      step=jnp.zeros((), jnp.int32))


def make_train_step(cfg: ModelConfig,
                    optimizer: optax.GradientTransformation,
                    mesh=None,
                    ) -> Callable[[TrainState, jax.Array, jax.Array],
                                  Tuple[TrainState, jax.Array]]:
    """Build the (jittable, donation-ready) train step.

    step(state, ids, loss_mask) -> (state', loss). The state holds fp32
    masters; the forward/backward runs on a cast-down copy in the
    configured param/compute dtypes (grads land fp32 w.r.t. the masters
    through the cast), and the update applies exactly in fp32.
    """
    # the Pallas inference kernels (flash attention, fused rmsnorm) have
    # no VJP by design; force the differentiable lax/jnp paths here so
    # callers don't have to remember the use_pallas='never' override
    if cfg.use_pallas != 'never':
        cfg = cfg.replace(use_pallas='never')
    pd = jnp.dtype(cfg.param_dtype)

    def _down(path, p):
        name = getattr(path[-1], 'key', None)
        if name in ('poles', 'residues'):
            return p                      # fp32 policy, models.py:148
        return p.astype(pd)

    def train_step(state: TrainState, ids: jax.Array,
                   loss_mask: jax.Array) -> Tuple[TrainState, jax.Array]:
        def loss_fn(masters):
            fwd = jax.tree_util.tree_map_with_path(_down, masters)
            return next_token_loss(fwd, cfg, ids, loss_mask, mesh)

        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        updates, opt_state = optimizer.update(grads, state.opt_state,
                                              state.params)
        params = optax.apply_updates(state.params, updates)
        return TrainState(params, opt_state, state.step + 1), loss

    return train_step


def make_sharded_train_step(cfg: ModelConfig,
                            optimizer: optax.GradientTransformation,
                            mesh) -> Callable:
    """Jit the train step with (dp, tp) data sharding and donated state.

    Parameter/optimizer placement comes from the INPUT state: place params
    with `parallel.sharding.shard_params` before `init_train_state`, and
    jit preserves those committed shardings (in_shardings=None keeps the
    argument placements; GSPMD propagates them through the step).
    """
    from jax.sharding import NamedSharding, PartitionSpec as P

    data = NamedSharding(mesh, P('dp', None))
    repl = NamedSharding(mesh, P())
    step = make_train_step(cfg, optimizer, mesh=mesh)
    return jax.jit(step,
                   in_shardings=(None, data, data),
                   out_shardings=(None, repl),
                   donate_argnums=(0,))


# ---------------------------------------------------------------------------
# Train-state checkpoint / resume (SURVEY.md §5 checkpoint-resume: the
# reference has no training, so no optimizer state exists there — this is
# the native-format extension for finetuning runs)
# ---------------------------------------------------------------------------

def save_train_state(state: TrainState, path: str) -> None:
    """Write params + optimizer state + step as one orbax checkpoint
    (sharded-safe: each host writes only the shards it owns)."""
    import os

    import orbax.checkpoint as ocp

    ckptr = ocp.PyTreeCheckpointer()
    ckptr.save(os.path.abspath(os.path.join(path, 'train_state')),
               {'params': state.params, 'opt_state': state.opt_state,
                'step': state.step}, force=True)


def load_train_state(path: str, template: TrainState,
                     shardings=None) -> TrainState:
    """Restore a train state.

    `template`: a TrainState with the target pytree structure (e.g. from
    `init_train_state` on freshly-initialized params) — orbax flattens
    optax's NamedTuple states to dicts, so the original structure must be
    re-imposed. `shardings` (same tree shape, of NamedShardings) places
    arrays directly on the mesh.
    """
    import os

    import orbax.checkpoint as ocp

    ckptr = ocp.PyTreeCheckpointer()
    item = os.path.abspath(os.path.join(path, 'train_state'))
    as_dict = {'params': template.params, 'opt_state': template.opt_state,
               'step': template.step}
    if shardings is None:
        restore_args = None
    else:
        restore_args = jax.tree_util.tree_map(
            lambda s: ocp.ArrayRestoreArgs(sharding=s),
            {'params': shardings.params, 'opt_state': shardings.opt_state,
             'step': shardings.step})
    tree = ckptr.restore(item, item=as_dict, restore_args=restore_args)
    return TrainState(params=tree['params'], opt_state=tree['opt_state'],
                      step=jnp.asarray(tree['step']))
