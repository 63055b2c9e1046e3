"""Autoregressive generation.

API parity with reference `evo/generation.py` (`Generator` class + module
`generate()`), redesigned for XLA: instead of a Python loop that launches one
forward per token (reference `evo/generation.py:131-189`), the entire
prefill + decode + sample loop compiles into a single program — prompt
prefill via the FFT path, then `lax.scan` over decode steps with donated
cache buffers and on-device top-k/top-p sampling. No host round-trips during
decode.

Reference behaviors kept:
  * `inference_params_dict` (here: the cache pytree) can be passed in and is
    returned, making sampling resumable across calls
    (`evo/generation.py:14-22, 105-114`). As in the reference, the returned
    cache has NOT consumed the final sampled token — a resuming caller feeds
    the last token as the new input.
  * teacher forcing of long prompts: when `prompt_length >
    force_prompt_threshold` the first `force_prompt_threshold` tokens are
    prefilled and the remainder is fed step-by-step with forced tokens
    (`evo/generation.py:82-88, 159-161`). On TPU the FFT prefill handles any
    length, so `force_prompt_threshold=None` (prefill everything) is the
    recommended default; the reference default (128) is honored by the
    compatibility wrappers.
  * the mean-logprob score of a generation pairs step-i logits with the
    step-(i+1) token, exactly like the reference
    (`evo/generation.py:287-290` calling `logits_to_logprobs` with its
    default trim_bos=True).
"""

from __future__ import annotations

import functools
import sys
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from evo_tpu import model as model_lib
from evo_tpu.config import ModelConfig
from evo_tpu.ops.sampling import sample
from evo_tpu.scoring import (_aligned_cache_len, _cache_align,
                             logits_to_logprobs,
                             prepare_batch)
from evo_tpu.tokenizer import CharLevelTokenizer


@functools.partial(
    jax.jit,
    static_argnames=('cfg', 'num_tokens', 'num_forced', 'top_k', 'top_p',
                     'temperature', 'resume', 'mesh'),
    donate_argnames=('cache',))
def _generate_program(params, prompt_ids, forced_ids, cache, rng, *,
                      cfg: ModelConfig, num_tokens: int, num_forced: int,
                      top_k: int, top_p: float, temperature: float,
                      resume: bool = False, mesh=None):
    """prompt_ids: (B, P); forced_ids: (B, num_forced) (may be (B, 0)).

    Returns (generation (B, num_tokens), scores (B, num_tokens, V), cache).
    `scores` are the raw float32 logits at each emitted step (reference
    contract, `evo/generation.py:97-103, 183`).
    """
    logits_pre, cache = model_lib.prefill(params, cfg, prompt_ids, cache,
                                          mesh=mesh, resume=resume)
    last = logits_pre[:, -1]
    total = num_forced + num_tokens

    def choose(i, last_logits, rng_i):
        sampled = sample(rng_i, last_logits, top_k=top_k, top_p=top_p,
                         temperature=temperature)
        if num_forced == 0:
            return sampled
        forced_t = jnp.where(i < num_forced,
                             forced_ids[:, jnp.minimum(i, num_forced - 1)],
                             sampled)
        return forced_t

    def body(carry, i):
        cache, last_logits, rng = carry
        rng, sub = jax.random.split(rng)
        tok = choose(i, last_logits, sub)
        new_logits, cache = model_lib.decode_step(params, cfg, tok, cache,
                                                  mesh=mesh)
        return (cache, new_logits, rng), (tok, last_logits)

    (cache, last, rng), (toks, score_logits) = jax.lax.scan(
        body, (cache, last, rng), jnp.arange(total - 1))
    rng, sub = jax.random.split(rng)
    tok_last = choose(jnp.asarray(total - 1), last, sub)
    toks = jnp.concatenate([toks, tok_last[None]], axis=0)       # (T, B)
    score_logits = jnp.concatenate([score_logits, last[None]], axis=0)
    generation = jnp.swapaxes(toks, 0, 1)[:, num_forced:]
    scores = jnp.swapaxes(score_logits, 0, 1)[:, num_forced:]
    return generation, scores, cache


def _cache_kv_len(cache):
    """Current attention KV-buffer time length, or None if the cache has
    no attention layers (time axis 1 for the bf16 (B, T, H, Dh) layout,
    2 for the head-major quantized (B, H, T, Dh) one)."""
    for layer in cache['layers']:
        if isinstance(layer, dict) and 'k' in layer:
            return layer['k'].shape[2 if 'ks' in layer else 1]
    return None


def _grow_cache(cache, needed_len: int, donate: bool = False):
    """Extend KV time buffers so a resumed generation fits.

    FIR/modal Hyena state is O(1) in sequence length, so only the
    attention K/V buffers grow (host-side pad; outside jit).

    donate=True frees each old KV buffer as soon as its padded copy
    exists and hands the remaining leaves through UNcopied — the
    caller's tree is consumed. At 65k+ contexts this halves the
    regrowth transient (old full KV + new full KV next to the weights
    is what crashed the 73728-position growth on a 16 GB chip);
    donate=False keeps the reference contract (the caller's
    inference_params_dict stays valid, evo/generation.py:105-114)."""
    current = _cache_kv_len(cache)
    pad = 0 if (current is None or current >= needed_len) \
        else needed_len - current
    new_layers = []
    for layer in cache['layers']:
        if pad and isinstance(layer, dict) and 'k' in layer:
            t_axis = 2 if 'ks' in layer else 1

            def padt(a, _t=t_axis):
                pads = [(0, 0)] * a.ndim
                pads[_t] = (0, pad)
                out = jnp.pad(a, pads)
                if donate and hasattr(a, 'delete'):
                    # REAL sync before freeing the source: on tunneled
                    # backends block_until_ready returns early, and
                    # deleting a buffer whose pad is still in flight
                    # wedges the worker (observed 2026-08-21 at the
                    # 65536-position regrowth) — a host readback is the
                    # only trustworthy completion barrier here
                    np.asarray(out.reshape(-1)[-1])
                    a.delete()
                return out

            new_layers.append({kk: padt(a) for kk, a in layer.items()})
        elif donate:
            new_layers.append(layer)
        else:
            # copy EVERY remaining leaf (offset, Hyena state, unpadded KV):
            # the generate program donates its cache argument, and the
            # reference contract keeps the caller's inference_params_dict
            # valid for reuse (evo/generation.py:105-114)
            new_layers.append(jax.tree_util.tree_map(
                lambda x: x.copy() if hasattr(x, 'copy') else x, layer))
    offset = cache['offset']
    if donate:
        return {'offset': offset, 'layers': new_layers}
    return {'offset': offset.copy() if hasattr(offset, 'copy') else offset,
            'layers': new_layers}


class Generator:
    """Reference-parity generator (`evo/generation.py:13-204`)."""

    def __init__(self, model, tokenizer: CharLevelTokenizer,
                 top_k: int = 50, top_p: float = 0.7,
                 temperature: float = 1.0):
        self.model = model
        self.tokenizer = tokenizer
        self.top_k = top_k
        self.top_p = top_p
        self.temperature = temperature
        self.untils = ['\n\n']

    def generate(
        self,
        input_string: Optional[str] = None,
        input_ids=None,
        num_tokens: int = 32,
        cached_generation: bool = True,
        force_prompt_threshold: Optional[int] = None,
        prefill_segment_len: Optional[int] = None,
        seed: int = 0,
        rng: Optional[jax.Array] = None,
        verbose: bool = False,
        max_seqlen: Optional[int] = None,
        inference_params_dict=None,
        cache_growth_align: int = 8192,
        donate_cache: bool = False,
        device: Optional[str] = None,  # accepted for API compat; unused
        print_generation: bool = False,
        skip_special_tokens: bool = False,
        stop_at_eos: bool = False,
    ):
        """Returns (generation (B, num_tokens), scores, inference_params_dict).

        force_prompt_threshold=None prefills the whole prompt via FFT (TPU
        default); an integer reproduces the reference's teacher-forcing split
        (`evo/generation.py:82-88`).

        prefill_segment_len: prefill long prompts in chunks of this many
        tokens through the donating resumable prefill (O(segment)
        activation memory — the generation-side twin of
        `score_sequences_segmented`, for 131k-class prompts on one chip).
        Exact: the chunked conv carries modal/FIR state and attention
        attends over the KV buffer (Pallas buffer-flash on TPU).

        cache_growth_align: when a RESUMED call must grow the KV cache,
        the new length is rounded up to this multiple so a long chunked
        generation recompiles once per `align` positions instead of once
        per chunk (greedy resumed chunks are token-exact vs a single
        call regardless; tests/test_generation.py).

        donate_cache: consume the passed inference_params_dict (its old
        KV buffers are freed during regrowth instead of copied). Halves
        the regrowth memory transient — required for 65k+ single-chip
        generation; leave False to keep the caller's dict reusable (the
        reference contract).
        """
        del cached_generation  # decode is always cached on TPU
        if num_tokens < 1:
            raise ValueError(
                'num_tokens must be >= 1 (the program always emits the '
                'sampled next token); for prefill-only use '
                'model(ids, inference_params_dict=cache)')
        if force_prompt_threshold is not None:
            # 0 would slice an empty prefill prompt (the engine needs at
            # least one prefilled token); the reference never passes < 1
            force_prompt_threshold = max(1, force_prompt_threshold)
        if input_ids is None:
            input_ids = self.tokenizer.tokenize(input_string)[None]
        x = jnp.asarray(np.asarray(input_ids), dtype=jnp.int32)
        if x.ndim == 1:
            x = x[None]
        if max_seqlen is not None:
            x = x[:, -max_seqlen:]
        B, prompt_length = x.shape
        if prompt_length == 0:
            raise ValueError(
                'Empty prompt: generation needs at least one prompt token '
                '(prepend a BOS with prepend_bos=True for unconditional '
                'sampling).')

        if (force_prompt_threshold is not None
                and prompt_length > force_prompt_threshold):
            forced = x[:, force_prompt_threshold:]
            prompt = x[:, :force_prompt_threshold]
        else:
            forced = x[:, :0]
            prompt = x
        num_forced = int(forced.shape[1])

        cfg: ModelConfig = self.model.config
        resume = inference_params_dict is not None
        if resume:
            cache = inference_params_dict
            offset = int(np.asarray(cache['offset']))
            needed = offset + int(prompt.shape[1]) + num_forced \
                + int(num_tokens)
            # align the regrowth target (cache_growth_align): exact-size
            # growth would give every resumed call a distinct KV shape —
            # one fresh XLA compile per chunk over a >650k-token run; the
            # aligned target bounds compiled shapes at total_len/align
            # while wasting at most align-1 KV positions (~400 MB at 7B
            # bf16 for the 8192 default). A cache whose buffers ALREADY
            # fit `needed` is honored as-is (target = its own length):
            # callers that pre-size the cache — the reference contract's
            # pre-allocation, or bench_longgen's final-length clamp —
            # must not be padded out to the aligned target (the 65k run's
            # 66560 clamp exists because the worker cannot take the 81920
            # regrowth transient; _grow_cache still runs for the
            # donate=False deep-copy contract below).
            current = _cache_kv_len(cache)
            if current is not None and current >= needed:
                target = current
            else:
                target = _aligned_cache_len(
                    needed - 1, max(_cache_align(cfg),
                                    int(cache_growth_align)))
            cache = _grow_cache(cache, target, donate=donate_cache)
        else:
            # _aligned_cache_len: 1024-aligned KV buffers make the Pallas
            # buffer-flash kernel eligible for the segmented prefill below
            max_len = int(prompt.shape[1]) + num_forced + int(num_tokens)
            cache = self.model.initialize_inference_params(
                B, _aligned_cache_len(max_len - 1,
                                      _cache_align(cfg)))

        if (prefill_segment_len is not None
                and prompt.shape[1] > prefill_segment_len):
            # chunk the prompt HEAD through the donating resumable prefill
            # (the cache is owned here: freshly created, or deep-copied by
            # _grow_cache above); the tail chunk stays with the fused
            # program. head_len is a multiple of the segment so every head
            # chunk shares one compiled shape.
            P = int(prompt.shape[1])
            head_len = ((P - 1) // prefill_segment_len) \
                * prefill_segment_len
            user_resume = resume
            for s in range(0, head_len, prefill_segment_len):
                _, cache = self.model(
                    prompt[:, s:s + prefill_segment_len],
                    inference_params_dict=cache, donate_cache=True,
                    resume=user_resume or s > 0)
            prompt = prompt[:, head_len:]
            resume = True

        if rng is None:
            rng = jax.random.PRNGKey(seed)
        if verbose:
            # reference prints device memory under verbose
            # (evo/generation.py:122-124, 201-202)
            from evo_tpu.runtime import device_memory_report
            print(f'Memory before generation: {device_memory_report()}',
                  flush=True)
        generation, scores, cache = _generate_program(
            self.model.params, prompt, forced, cache, rng,
            cfg=cfg, num_tokens=int(num_tokens), num_forced=num_forced,
            top_k=int(self.top_k), top_p=float(self.top_p),
            temperature=float(self.temperature), resume=resume,
            mesh=getattr(self.model, 'mesh', None))
        if verbose:
            from evo_tpu.runtime import device_memory_report
            print(f'Memory after generation: {device_memory_report()}',
                  flush=True)
        gen_np = np.asarray(generation)
        if stop_at_eos:
            # reference parity (evo/generation.py:169-170): the EOS check
            # only PRINTS - generation is never truncated - so the fused
            # scan runs to num_tokens and we report the first double-EOS
            eos = self.tokenizer.eos_id
            hits = (gen_np[0, :-1] == eos) & (gen_np[0, 1:] == eos)
            if hits.any():
                print('Stopping generation at EOS')
        if print_generation and verbose and B == 1:
            # streamed-token print of the reference, emitted post-scan
            print(' '.join(self.tokenizer.detokenize([int(t)])
                           for t in gen_np[0]), flush=True)
        del skip_special_tokens   # accepted-unused, as in the reference
        if verbose and B == 1:
            print(f'Prompt: {input_string!r} -> '
                  f'{self.tokenizer.detokenize_batch(np.asarray(generation))}')
        return generation, scores, cache


def generate(
    prompt_seqs: List[str],
    model,
    tokenizer: CharLevelTokenizer,
    n_tokens: int = 100,
    temperature: float = 0.0,
    top_k: int = 1,
    top_p: float = 1.0,
    batched: bool = True,
    prepend_bos: bool = False,
    cached_generation: bool = True,
    force_prompt_threshold: Optional[int] = None,
    prefill_segment_len: Optional[int] = None,
    verbose: int = 1,
    seed: int = 0,
    device: Optional[str] = None,  # accepted for API compat; unused
    **kwargs,
) -> Tuple[List[str], List[float]]:
    """Generate from a list of prompts (reference `evo/generation.py:207-297`).

    Equal-length prompts run as one batch; ragged prompts fall back to
    per-prompt runs (reference behavior, lines 238-253).
    """
    if not prompt_seqs:
        return [], []
    g = Generator(model, tokenizer, top_k=top_k, top_p=top_p,
                  temperature=temperature)
    uniform = all(len(s) == len(prompt_seqs[0]) for s in prompt_seqs)
    if batched and uniform:
        input_ids_list = [
            prepare_batch(prompt_seqs, tokenizer, prepend_bos=prepend_bos)[0]
        ]
    else:
        if verbose:
            if not uniform:
                sys.stderr.write('Note: Prompts are of different lengths.\n')
            sys.stderr.write('Note: Will not do batched generation.\n')
        input_ids_list = [
            prepare_batch([s], tokenizer, prepend_bos=prepend_bos)[0]
            for s in prompt_seqs
        ]

    generated_seqs: List[str] = []
    generated_scores: List[float] = []
    for bi, input_ids in enumerate(input_ids_list):
        batch_size = input_ids.shape[0]
        output_ids, logits, _ = g.generate(
            input_ids=input_ids,
            num_tokens=n_tokens,
            cached_generation=cached_generation,
            force_prompt_threshold=force_prompt_threshold,
            prefill_segment_len=prefill_segment_len,
            seed=seed + bi,
            verbose=(verbose > 1),
        )
        output_ids = np.asarray(output_ids)
        generated_seqs += list(tokenizer.detokenize_batch(output_ids))
        logprobs = np.asarray(
            logits_to_logprobs(logits, jnp.asarray(output_ids)),
            dtype=np.float32)
        generated_scores += [float(np.mean(logprobs[i]))
                             for i in range(batch_size)]

    assert len(generated_seqs) == len(generated_scores) == len(prompt_seqs)
    if verbose:
        for seq, score, prompt in zip(generated_seqs, generated_scores,
                                      prompt_seqs):
            print(f'Prompt: "{prompt}",\tOutput: "{seq}",\tScore: {score}')
    return generated_seqs, generated_scores
