"""Training / fine-tuning: next-token loss, optimizer step, sharded train step.

The reference ships no training code (inference-only, SURVEY.md §4) but two of
its five checkpoints are fine-tunes (crispr/transposon, `evo/models.py:13-19`),
so a complete framework needs the fine-tuning loop.  Everything here is pure
and composes with the `parallel` shardings: under a (dp, tp) mesh, batches
shard on dp, weights/optimizer state on tp (optimizer state inherits the
param shardings automatically because optax states mirror the param tree).

Precision: forward/backward in `cfg.compute_dtype` (bf16) with fp32 loss and
fp32 poles/residues; optimizer state fp32 via `optax` defaults on the fp32
master copy is NOT used — params are kept in param_dtype and updates applied
in fp32 then cast, which is adequate for fine-tuning-scale runs.
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
    params: Any
    opt_state: Any
    step: jax.Array


def make_optimizer(learning_rate: float = 1e-4, weight_decay: float = 0.01,
                   b1: float = 0.9, b2: float = 0.95,
                   grad_clip: float = 1.0) -> optax.GradientTransformation:
    """AdamW with global-norm clipping; fp32 moments regardless of param dtype."""
    return optax.chain(
        optax.clip_by_global_norm(grad_clip),
        optax.scale_by_adam(b1=b1, b2=b2, mu_dtype=jnp.float32),
        optax.add_decayed_weights(weight_decay),
        optax.scale(-learning_rate),
    )


def init_train_state(params, optimizer: optax.GradientTransformation
                     ) -> TrainState:
    return TrainState(params=params, opt_state=optimizer.init(params),
                      step=jnp.zeros((), jnp.int32))


def make_train_step(cfg: ModelConfig,
                    optimizer: optax.GradientTransformation,
                    mesh=None,
                    ) -> Callable[[TrainState, jax.Array, jax.Array],
                                  Tuple[TrainState, jax.Array]]:
    """Build the (jittable, donation-ready) train step.

    step(state, ids, loss_mask) -> (state', loss). Cast-up/cast-down around
    the update keeps bf16 params stable; grads are computed in the forward
    dtype and reduced fp32 by optax.
    """
    def train_step(state: TrainState, ids: jax.Array,
                   loss_mask: jax.Array) -> Tuple[TrainState, jax.Array]:
        loss, grads = jax.value_and_grad(next_token_loss)(
            state.params, cfg, ids, loss_mask, mesh)
        updates, opt_state = optimizer.update(grads, state.opt_state,
                                              state.params)
        params = jax.tree_util.tree_map(
            lambda p, u: (p.astype(jnp.float32)
                          + u.astype(jnp.float32)).astype(p.dtype),
            state.params, updates)
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
