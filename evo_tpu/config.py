"""Model configuration schema.

Mirrors the reference engine's YAML config surface so that the shipped inference
configs (`/root/reference/evo/configs/evo-1-8k-base_inference.yml`,
`evo-1-131k-base_inference.yml`) load unchanged.  Every key of those YAMLs is a
field here; TPU-specific extensions live in the `mesh`/`runtime` sections and
default to single-chip behavior.

Reference contract: `stripedhyena.utils.dotdict(config_dict)` wrapping a YAML
(`evo/models.py:141-146`).  We use a frozen dataclass instead: attribute access
like dotdict, but typed, validated, and hashable (so it can be a static jit arg).
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field
from typing import Optional, Tuple

import yaml


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


@dataclass(frozen=True)
class ModelConfig:
    """StripedHyena architecture hyperparameters.

    Field names match the reference YAML keys exactly (SURVEY.md §2.A table,
    `evo/configs/evo-1-8k-base_inference.yml:1-38`).
    """

    vocab_size: int = 512
    hidden_size: int = 4096
    num_filters: int = 4096
    max_sequence_len: int = 8192
    attn_layer_idxs: Tuple[int, ...] = (8, 16, 24)
    hyena_layer_idxs: Tuple[int, ...] = ()
    num_layers: int = 32
    short_filter_length: int = 3
    num_attention_heads: int = 32
    short_filter_bias: bool = True
    eps: float = 1.0e-6
    state_size: int = 8
    inner_size_multiple_of: int = 16
    smeared_gqa: bool = False
    make_vocab_size_divisible_by: int = 8
    log_intermediate_values: bool = False
    proj_groups: int = 1
    hyena_filter_groups: int = 1
    split_k0: bool = True
    model_parallel_size: int = 1
    pile_parallel_size: int = 1
    tie_embeddings: bool = True
    inner_mlp_size: Optional[int] = None
    mha_out_proj_bias: bool = True
    qkv_proj_bias: bool = True
    hyena_proj_bias: bool = True
    hyena_out_proj_bias: bool = True
    final_norm: bool = True
    rng_fork: bool = False
    use_flash_attn: bool = True
    use_flash_rmsnorm: bool = False
    use_flash_depthwise: bool = False
    use_flashfft: bool = False
    column_split: bool = True
    inference_mode: bool = True
    tokenizer_type: str = 'CharLevelTokenizer'
    prefill_style: str = 'fft'
    mlp_activation: str = 'gelu'
    mlp_init_method: str = ''
    mlp_output_init_method: str = ''
    # 131k context extension (evo-1-131k-base_inference.yml:39-40)
    use_interpolated_rotary_pos_emb: bool = False
    rotary_emb_scaling_factor: float = 1.0
    rotary_base: float = 10000.0
    # --- TPU extensions (not in reference YAMLs; all default to off/auto) ---
    # Computation dtype for matmuls/activations. Poles/residues always fp32
    # (reference: to_bfloat16_except_poles_residues, evo/models.py:148).
    compute_dtype: str = 'bfloat16'
    param_dtype: str = 'bfloat16'
    # Use Pallas kernels on TPU ('auto' = yes on TPU backend, no elsewhere).
    use_pallas: str = 'auto'
    # Chunk size for the modal-state prefill scan (memory/speed tradeoff).
    state_prefill_chunk: int = 128
    # Rematerialize each block on the backward pass (training / grads).
    remat: bool = False
    # Chunked long-conv: sequences longer than this run the Hyena conv as a
    # scan of chunk-local FFTs + modal state carry (bounds FFT memory to
    # O(chunk) — required for 131k context on 16 GB chips). 0 = always
    # monolithic FFT.
    hyena_fft_chunk: int = 0
    # Long-conv prefill backend: 'matmul' = chunked Toeplitz matmuls on the
    # MXU (fastest on TPU, bounded memory); 'fft' = XLA FFT (monolithic, or
    # chunked when hyena_fft_chunk > 0; the numerics oracle).
    hyena_conv_backend: str = 'matmul'
    # Chunk (= Toeplitz tile) for the matmul backend; the (D, chunk,
    # chunk) tap tensor grows quadratically, so this must stay small — it
    # is NOT the FFT memory knob above. On-chip sweep at 7B/8k: 64 runs
    # the conv at 3.2 ms/layer vs 4.9 (128) and 10.0 (256) — smaller taps
    # halve the Toeplitz flops while K=L/64 rows still fill the MXU.
    hyena_matmul_chunk: int = 64
    # Fully-fused Pallas mixer core (FIR + gates + Toeplitz conv + modal
    # carry in one VMEM pass, ops/pallas_hyena.py). OFF by default: the
    # on-chip sweep measured it ~8% slower than the unfused pallas_fir +
    # conv_matmul_chunked pair at 7B/8k (lane-idle chunked layout; see the
    # pallas_hyena module docstring). Turn on for O(tile)-memory streaming
    # of very long segments, where the unfused pipeline's (B, C, L)
    # float32 intermediates would not fit.
    hyena_fused_mixer: bool = False
    # VMEM Pallas kernel for the modal cross-chunk prefix inside
    # conv_matmul_chunked (ops/pallas_prefix.py). OFF by default: the
    # on-chip interleaved A/B at 7B/8k measured it step-NEUTRAL (809 vs
    # 809 ms) — XLA already overlaps the jnp Hillis-Steele passes with
    # MXU work at this shape. Kept (oracle-tested) for VPU-pressured
    # shapes (small batch x many chunks); single-chip only (no GSPMD
    # partitioning rule — under a mesh the jnp path shards with zero
    # communication anyway).
    hyena_pallas_prefix: bool = False
    # Weight-only quantization for serving: 'none' (default; the 1e-3
    # reference-parity mode), 'int8' (large projections stored int8 with
    # per-output-channel f32 scales — ~2x the B=1 decode roofline, see
    # evo_tpu/quant.py), or 'int4' (nibble-packed with group-128
    # subchannel scales, VMEM-unpacked by ops/pallas_int4.py — a
    # memory-fit mode: 3.3 GB weights at 7B, decode measured SLOWER
    # than int8; single-chip only). Applied at load time (models.py);
    # strictly opt-in, never changes the default numerics.
    weight_quant: str = 'none'
    # Dynamic int8 activation quantization for the quantized projections
    # ('none' | 'int8'; requires weight_quant int8). int8 x int8 dots run
    # the v5e MXU at 2x the bf16 rate — the opt-in fast-prefill serving
    # mode (evo_tpu/quant.py:qdot). Per-token symmetric scales; logits
    # shift ~1e-2, so this mode is outside the 1e-3 parity contract.
    act_quant: str = 'none'
    # int8 attention KV cache ('none' | 'int8'). At 131k context the bf16
    # KV is 6.4 GB — the same order as the int8 weight bytes — and decode
    # reads all of it every step, so this halves both the long-context
    # cache footprint and the per-step cache reads (decode attention runs
    # int8 x int8 on the MXU with per-(position, head) f32 scales;
    # layers/attention.py:kv_quantize). Independent of weight_quant /
    # act_quant; fresh-prefill numerics untouched (quantization error
    # enters only on buffer readback). Strictly opt-in — the default bf16
    # cache keeps the 1e-3 parity contract.
    kv_quant: str = 'none'
    # Context-parallel attention algorithm when the mesh has an active cp
    # axis: 'ulysses' (GSPMD all_to_all seq<->head reshard; flash-eligible
    # dense core; needs heads % (tp*cp) == 0), 'ring' (ppermute KV
    # rotation, seq stays sharded), or 'zigzag' (ring with balanced causal
    # block assignment — ~2x less attention compute than 'ring' at scale).
    cp_attn: str = 'ulysses'

    def __post_init__(self):
        assert self.cp_attn in ('ulysses', 'ring', 'zigzag'), self.cp_attn
        assert self.kv_quant in ('none', 'int8'), self.kv_quant
        # tuples so the config is hashable (required for static jit args)
        object.__setattr__(self, 'attn_layer_idxs', tuple(self.attn_layer_idxs))
        if not self.hyena_layer_idxs:
            object.__setattr__(
                self, 'hyena_layer_idxs',
                tuple(i for i in range(self.num_layers)
                      if i not in self.attn_layer_idxs))
        else:
            object.__setattr__(self, 'hyena_layer_idxs',
                               tuple(self.hyena_layer_idxs))
        assert sorted(self.attn_layer_idxs + self.hyena_layer_idxs) == \
            list(range(self.num_layers)), 'layer idxs must partition layers'
        assert self.hidden_size % self.num_attention_heads == 0
        # Engine variants pinned to their defaults in every shipped
        # inference config (evo-1-8k/131k-base_inference.yml:16,19-20):
        # fail loudly rather than silently mis-compute if a config asks
        # for them.
        if self.proj_groups != 1 or self.smeared_gqa:
            raise NotImplementedError(
                'grouped-query attention (proj_groups != 1 / smeared_gqa) '
                'is not implemented; all reference checkpoints use MHA')
        if self.hyena_filter_groups not in (0, 1):
            raise NotImplementedError(
                'hyena_filter_groups > 1 (shared filters across channel '
                'groups) is not implemented; reference configs use 1')

    # Derived quantities -----------------------------------------------------

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_attention_heads

    @property
    def padded_vocab_size(self) -> int:
        return _round_up(self.vocab_size, self.make_vocab_size_divisible_by)

    @property
    def inner_mlp_size_actual(self) -> int:
        """GLU inner width.

        Reference auto-fill rule when `inner_mlp_size: null`
        (evo-1-8k-base_inference.yml:25): 2/3 of the classic 4x expansion,
        rounded up to `inner_size_multiple_of` (Megatron/LLaMA convention).
        For hidden 4096 -> 10928. Verify against checkpoint tensor shapes at
        conversion time (SURVEY.md §2.A).
        """
        if self.inner_mlp_size is not None:
            return self.inner_mlp_size
        return _round_up(int(2 * self.hidden_size * 4 / 3),
                         self.inner_size_multiple_of)

    def is_attn_layer(self, idx: int) -> bool:
        return idx in self.attn_layer_idxs

    def layer_segments(self) -> Tuple[Tuple[str, Tuple[int, ...]], ...]:
        """Layers grouped into maximal runs of one kind, in order.

        E.g. evo-1 (attn at 8/16/24): (('hyena', (0..7)), ('attn', (8,)),
        ('hyena', (9..15)), ...). Hyena runs are *stacked* in the param
        tree and executed under `lax.scan`, so XLA compiles one block body
        per run instead of 29 inlined copies (compile time O(1) in depth).
        Attention layers stay individual segments.
        """
        segs = []
        run = []
        for li in range(self.num_layers):
            if self.is_attn_layer(li):
                if run:
                    segs.append(('hyena', tuple(run)))
                    run = []
                segs.append(('attn', (li,)))
            else:
                run.append(li)
        if run:
            segs.append(('hyena', tuple(run)))
        return tuple(segs)

    @classmethod
    def from_yaml(cls, path: str) -> 'ModelConfig':
        with open(path) as f:
            raw = yaml.safe_load(f)
        return cls.from_dict(raw)

    @classmethod
    def from_dict(cls, raw: dict) -> 'ModelConfig':
        known = {f.name for f in dataclasses.fields(cls)}
        kwargs = {k: v for k, v in raw.items() if k in known}
        # YAML null -> None handled by dataclass default semantics
        if kwargs.get('inner_mlp_size', 'x') is None:
            kwargs['inner_mlp_size'] = None
        return cls(**kwargs)

    def replace(self, **kw) -> 'ModelConfig':
        return dataclasses.replace(self, **kw)


def cli_tiny_overrides() -> dict:
    """The `--tiny` override dict shared by the CLI scripts (same schema
    family as `tiny_config`; kept as a dict because the CLIs feed it to
    `Evo(config_overrides=...)`)."""
    return dict(
        hidden_size=64, num_filters=64, num_layers=4,
        attn_layer_idxs=(1,), hyena_layer_idxs=(),
        num_attention_heads=4, state_size=4, compute_dtype='float32',
        param_dtype='float32', use_pallas='never')


def cli_quant_overrides(quant: str) -> dict:
    """Map the CLIs' `--quant` choice to config overrides (shared by
    scripts/score.py and scripts/generate.py; docs/serving.md):
    'int8' = weight-only, 'int8x8' = int8 weights + dynamic int8
    activations, 'int4' = memory-fit mode, 'none' = {} (reference-parity
    bf16)."""
    if quant == 'none':
        return {}
    if quant not in ('int8', 'int8x8', 'int4'):
        raise ValueError(f'unknown --quant {quant!r}')
    ov = {'weight_quant': 'int8' if quant == 'int8x8' else quant}
    if quant == 'int8x8':
        ov['act_quant'] = 'int8'
    return ov


def tiny_config(**overrides) -> ModelConfig:
    """A small CPU-runnable config with the same schema as evo-1-8k-base.

    Used by the test suite and BASELINE config #1 ("tiny/CPU-runnable").
    """
    base = dict(
        vocab_size=512,
        hidden_size=64,
        num_filters=64,
        max_sequence_len=256,
        attn_layer_idxs=(1,),
        hyena_layer_idxs=(),
        num_layers=4,
        short_filter_length=3,
        num_attention_heads=4,
        state_size=4,
        inner_size_multiple_of=16,
        compute_dtype='float32',
        param_dtype='float32',
        use_pallas='never',
        state_prefill_chunk=32,
    )
    base.update(overrides)
    return ModelConfig(**base)
