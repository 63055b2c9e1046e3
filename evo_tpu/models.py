"""Model registry and engine facade.

Parity with reference `evo/models.py` (registry of 5 checkpoints, config
selection, checkpoint load) plus the engine-call contract the application
layer depends on (SURVEY.md §2.A call-site table):

    model(input_ids)                         -> (logits, None)
    model(x, inference_params_dict=cache)    -> (logits, cache')
    model.initialize_inference_params(...)   -> cache pytree

`EvoModel` replaces `stripedhyena.model.StripedHyena`: a thin stateful facade
over the pure functions in evo_tpu.model, owning per-shape jit caches and
(optionally) a device mesh for sharded execution.
"""

from __future__ import annotations

import functools
import os
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from evo_tpu import model as model_lib
from evo_tpu.config import ModelConfig
from evo_tpu.tokenizer import CharLevelTokenizer

MODEL_NAMES = [
    'evo-1.5-8k-base',
    'evo-1-8k-base',
    'evo-1-131k-base',
    'evo-1-8k-crispr',
    'evo-1-8k-transposon',
]

# HF repos (reference `evo/models.py:65-71`); used by the converter when a
# local snapshot path is supplied (this build environment has no network).
HF_MODEL_NAME_MAP = {
    'evo-1.5-8k-base': 'evo-design/evo-1.5-8k-base',
    'evo-1-8k-base': 'evo-design/evo-1-8k-base',
    'evo-1-131k-base': 'evo-design/evo-1-131k-base',
    'evo-1-8k-crispr': 'evo-design/evo-1-8k-crispr',
    'evo-1-8k-transposon': 'evo-design/evo-1-8k-transposon',
}

_CONFIG_DIR = os.path.join(os.path.dirname(__file__), 'configs')


def config_for_model(model_name: str) -> ModelConfig:
    """8k config for all 8k variants, 131k config for 131k
    (reference `evo/models.py:39-45`)."""
    if model_name not in MODEL_NAMES:
        raise ValueError(
            f'Invalid model name {model_name}. Options: {MODEL_NAMES}')
    yml = ('evo-1-131k-base_inference.yml' if '131k' in model_name
           else 'evo-1-8k-base_inference.yml')
    return ModelConfig.from_yaml(os.path.join(_CONFIG_DIR, yml))


class EvoModel:
    """Engine facade: params + config + jit caches (+ sharding, phase 4)."""

    def __init__(self, config: ModelConfig, params, mesh=None):
        self.config = config
        self.params = params
        self.mesh = mesh
        self._fwd = jax.jit(
            functools.partial(_forward_cfg, cfg=config, mesh=mesh))
        self._prefill = jax.jit(
            functools.partial(_prefill_cfg, cfg=config, mesh=mesh),
            static_argnames=('resume',))
        # NOT donated: the reference contract mutates/reuses one
        # inference_params_dict across calls (evo/generation.py:105-148);
        # donation would delete the caller's dict. The fused generation
        # program (generation._generate_program) owns its cache and keeps
        # donation there.
        self._step = jax.jit(functools.partial(_step_cfg, cfg=config,
                                               mesh=mesh))
        # Opt-in donating prefill for callers that own the cache and
        # replace it every call (score_sequences_segmented): without
        # donation each resumed segment COPIES the KV buffers — 2x 6.4 GB
        # live at 131k, which cannot fit next to the weights on one chip.
        self._prefill_donate = jax.jit(
            functools.partial(_prefill_cfg, cfg=config, mesh=mesh),
            static_argnames=('resume',), donate_argnums=(2,))

    # -- engine call contract ------------------------------------------------

    def __call__(self, input_ids, inference_params_dict=None,
                 donate_cache: bool = False, resume=None):
        """donate_cache=True lets XLA reuse the passed cache's buffers
        (the caller must drop its reference, keeping only the returned
        cache) — required headroom for 131k segmented prefill, where an
        un-donated KV copy alone exceeds the chip. Off by default: the
        reference contract allows replaying one inference_params_dict
        across calls (evo/generation.py:105-114).

        resume: continue from a non-empty cache. None (default) derives
        it from cache['offset'] — a blocking host readback; segmented
        loops that know the answer pass it explicitly so async dispatch
        can pipeline their chunks."""
        ids = jnp.asarray(np.asarray(input_ids), dtype=jnp.int32)
        if ids.ndim == 1:
            ids = ids[None]
        if inference_params_dict is None:
            return self._fwd(self.params, ids), None
        if ids.shape[1] == 1 and not donate_cache:
            logits, cache = self._step(self.params, ids[:, 0],
                                       inference_params_dict)
            return logits[:, None], cache
        # donate_cache honors donation even at length 1 by taking the
        # donating PREFILL (the decode-step jit is not donated and would
        # copy the full KV buffers — 6.4 GB at 131k)
        if resume is None:
            resume = int(np.asarray(inference_params_dict['offset'])) > 0
        fn = self._prefill_donate if donate_cache else self._prefill
        return fn(self.params, ids, inference_params_dict, resume=resume)

    def initialize_inference_params(self, batch_size: int, max_len: int):
        return model_lib.init_cache(self.config, batch_size, max_len)

    # -- introspection -------------------------------------------------------

    @property
    def num_params(self) -> int:
        return model_lib.param_count(self.params)

    def forward_fn(self):
        """The raw jittable (params, ids) -> logits function."""
        return functools.partial(_forward_cfg, cfg=self.config,
                                 mesh=self.mesh)


def _forward_cfg(params, ids, *, cfg, mesh=None):
    return model_lib.forward(params, cfg, ids, mesh=mesh)


def _prefill_cfg(params, ids, cache, *, cfg, mesh=None, resume=False):
    return model_lib.prefill(params, cfg, ids, cache, mesh=mesh,
                             resume=resume)


def _step_cfg(params, token, cache, *, cfg, mesh=None):
    return model_lib.decode_step(params, cfg, token, cache, mesh=mesh)


def load_checkpoint(
    model_name: str = 'evo-1-8k-base',
    checkpoint_path: Optional[str] = None,
    random_init: bool = False,
    seed: int = 0,
    config_overrides: Optional[Dict[str, Any]] = None,
    mesh=None,
) -> Tuple[EvoModel, ModelConfig]:
    """Build an EvoModel.

    checkpoint_path: local path to either a converted native checkpoint
    directory (evo_tpu format) or an HF safetensors snapshot (the reference's
    storage format, `evo/models.py:103-120`) which is converted on the fly.
    random_init: random weights of the right schema (testing / benchmarking).
    """
    config = config_for_model(model_name)
    if config_overrides:
        config = config.replace(**config_overrides)
    if random_init:
        params = model_lib.init_params(jax.random.PRNGKey(seed), config)
    else:
        if checkpoint_path is None:
            checkpoint_path = snapshot_download(model_name)
        from evo_tpu import checkpoint as ckpt
        if ckpt.is_native_checkpoint(checkpoint_path):
            # the config saved WITH the checkpoint is ground truth for
            # architecture fields (it may have been adapted from a
            # snapshot at save time); runtime fields stay as requested
            config = ckpt.reconcile_native_config(checkpoint_path, config)
            params = ckpt.load_params_auto(checkpoint_path, config,
                                           mesh=mesh)
        else:
            # reference snapshot: checkpoint shapes are ground truth —
            # the adapted config (true inner_mlp_size etc.) comes back
            params, config = ckpt.load_reference_checkpoint_adaptive(
                checkpoint_path, config, mesh=mesh)
    if config.weight_quant in ('int8', 'int4'):
        if config.weight_quant == 'int4' and mesh is not None:
            # packed int4 flattens each weight's output axes, which breaks
            # the TP PartitionSpecs (and pallas_int4 has no GSPMD rule) —
            # int4 is the single-chip B-small decode serving mode
            raise ValueError('weight_quant: int4 is single-chip only '
                             '(evo_tpu/ops/pallas_int4.py); drop the mesh '
                             'or use int8')
        from evo_tpu.quant import quantize_params
        params = quantize_params(params, free_source=True,
                                 mode=config.weight_quant)
    elif config.weight_quant != 'none':
        raise ValueError(f'unknown weight_quant {config.weight_quant!r} '
                         f"(expected 'none', 'int8' or 'int4')")
    if config.act_quant == 'int8' and config.weight_quant != 'int8':
        raise ValueError("act_quant: int8 requires weight_quant: int8 "
                         "(the int8 x int8 fast path needs quantized "
                         "weights; evo_tpu/quant.py)")
    if config.act_quant not in ('none', 'int8'):
        raise ValueError(f'unknown act_quant {config.act_quant!r}')
    return EvoModel(config, params, mesh=mesh), config


def hf_revision(model_name: str) -> str:
    """Pinned snapshot revision: `1.1_fix` for the evo-1 base models,
    `main` otherwise (reference `evo/models.py:92`)."""
    return ('1.1_fix' if model_name in ('evo-1-8k-base', 'evo-1-131k-base')
            else 'main')


def snapshot_download(model_name: str) -> str:
    """Fetch (or locate in the local HF cache) the safetensors snapshot for
    `model_name` via `huggingface_hub` (reference `evo/models.py:96`).

    Raises a clear error when the hub is unreachable and nothing is cached,
    pointing at the offline alternatives (`checkpoint_path=` /
    `random_init=True`).
    """
    repo = HF_MODEL_NAME_MAP[model_name]
    rev = hf_revision(model_name)
    try:
        from huggingface_hub import snapshot_download as hf_fetch
    except ImportError as e:
        raise RuntimeError(
            f'huggingface_hub is not installed; pass checkpoint_path= to a '
            f'local snapshot of {repo} (revision {rev}) or random_init=True.'
        ) from e
    try:
        return hf_fetch(repo, revision=rev)
    except Exception:
        # one retry against the local cache only (works fully offline)
        try:
            return hf_fetch(repo, revision=rev, local_files_only=True)
        except Exception as e:
            raise RuntimeError(
                f'Could not download {repo}@{rev} from the HuggingFace hub '
                f'and no cached copy exists. If this machine has no network '
                f'access, stage the snapshot manually and pass '
                f'checkpoint_path=<dir>, or use random_init=True for '
                f'schema-only runs.') from e


class Evo:
    """Top-level convenience class (reference `evo/models.py:21-62`):
    validates the model name and yields (model, tokenizer)."""

    def __init__(self, model_name: str = 'evo-1-8k-base',
                 device: Optional[str] = None,
                 checkpoint_path: Optional[str] = None,
                 random_init: bool = False,
                 seed: int = 0,
                 config_overrides: Optional[Dict[str, Any]] = None,
                 mesh=None):
        # `device` is the reference's second positional arg
        # (`evo/models.py:22`); kept for call compatibility. Placement on
        # TPU is governed by the mesh / default device instead.
        self.device = device
        if model_name not in MODEL_NAMES:
            raise ValueError(
                f'Invalid model name {model_name}. Options: {MODEL_NAMES}')
        self.model, self.config = load_checkpoint(
            model_name, checkpoint_path=checkpoint_path,
            random_init=random_init, seed=seed,
            config_overrides=config_overrides, mesh=mesh)
        self.tokenizer = CharLevelTokenizer(512)
