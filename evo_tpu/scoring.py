"""Batched log-likelihood scoring.

API parity with reference `evo/scoring.py` (`prepare_batch`,
`logits_to_logprobs`, `score_sequences`, `positional_entropies`) with the
same numerics: right-padding with pad_id and NO attention/loss mask inside
the model — padding correctness comes only from slicing outputs to the true
sequence lengths afterwards (`evo/scoring.py:22-31, 93-96`; SURVEY.md §7
hard part #6).

TPU addition: optional shape bucketing (`pad_to_bucket`) pads batch length up
to a power of two. Because every mixer is causal, right-padding never changes
logits at earlier positions, so bucketing is output-invariant while keeping
the number of distinct jit specializations logarithmic.
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

import jax.numpy as jnp
import numpy as np

from evo_tpu.tokenizer import CharLevelTokenizer


def next_bucket(n: int, minimum: int = 32) -> int:
    b = minimum
    while b < n:
        b *= 2
    return b


def prepare_batch(
    seqs: Sequence[str],
    tokenizer: CharLevelTokenizer,
    prepend_bos: bool = True,
    pad_to_bucket: bool = False,
) -> Tuple[np.ndarray, List[int]]:
    """Tokenize, optionally prepend BOS (= eod id 0), right-pad with pad_id.

    Returns (input_ids (B, L) int32, seq_lengths). Unlike the reference this
    returns a host numpy array; device placement belongs to the caller.
    """
    seq_lengths = [len(s) for s in seqs]
    max_len = max(seq_lengths) + int(prepend_bos)
    if pad_to_bucket:
        max_len = next_bucket(max_len)
    batch = np.full((len(seqs), max_len), tokenizer.pad_id, dtype=np.int32)
    for i, s in enumerate(seqs):
        toks = tokenizer.tokenize(s)
        off = int(prepend_bos)
        if off:
            batch[i, 0] = tokenizer.eod_id
        batch[i, off:off + len(toks)] = toks
    return batch, seq_lengths


def _log_softmax(logits):
    """f32 log_softmax over the vocab axis — the ONE normalization every
    scoring/entropy path shares (reference computes it in model dtype
    then casts; fp32 here is within the 1e-3 budget and strictly more
    accurate)."""
    logp = jnp.astype(logits, jnp.float32)
    logp = logp - jnp.max(logp, axis=-1, keepdims=True)
    return logp - jnp.log(jnp.sum(jnp.exp(logp), axis=-1, keepdims=True))


def logits_to_logprobs(logits, input_ids, trim_bos: bool = True):
    """Per-position log-likelihood of `input_ids` under `logits`.

    logits: (B, L, V); input_ids: (B, L). Returns (B, L-1) when trim_bos
    (drop last prediction, drop first input id) else (B, L).
    """
    logprobs = _log_softmax(logits)
    if trim_bos:
        logprobs = logprobs[:, :-1]
        input_ids = input_ids[:, 1:]
    assert logprobs.shape[1] == input_ids.shape[1]
    return jnp.take_along_axis(
        logprobs, jnp.asarray(input_ids)[..., None], axis=-1)[..., 0]


def score_sequences(
    seqs: Sequence[str],
    model,
    tokenizer: CharLevelTokenizer,
    reduce_method: str = 'mean',
    prepend_bos: bool = True,
    pad_to_bucket: bool = False,
) -> List[float]:
    """Reference-parity scoring (`evo/scoring.py:62-96`).

    `model` is anything implementing the engine call contract
    `model(input_ids) -> (logits, cache_or_None)` (see evo_tpu.models.EvoModel).
    """
    if reduce_method == 'mean':
        reduce_func = np.mean
    elif reduce_method == 'sum':
        reduce_func = np.sum
    else:
        raise ValueError(f'Invalid reduce_method {reduce_method}')
    input_ids, seq_lengths = prepare_batch(
        seqs, tokenizer, prepend_bos=prepend_bos, pad_to_bucket=pad_to_bucket)
    logits, _ = model(input_ids)
    # reference always trims (evo/scoring.py:83 passes trim_bos=True even
    # with prepend_bos=False) — the trim is what pairs position-t logits
    # with the t+1 target, so it is required for correct likelihoods
    logprobs = np.asarray(
        logits_to_logprobs(logits, input_ids, trim_bos=True),
        dtype=np.float32)
    return [float(reduce_func(logprobs[i][:seq_lengths[i]]))
            for i in range(len(seq_lengths))]


def score_stream(
    seq_batches,
    model,
    tokenizer: CharLevelTokenizer,
    reduce_method: str = 'mean',
    prepend_bos: bool = True,
    pad_to_bucket: bool = True,
    prefetch_depth: int = 2,
    progress=None,
) -> List[float]:
    """Pipelined scoring over an iterable of sequence batches.

    Same results as concatenating `score_sequences` over the batches, but
    with the serial host work overlapped against device compute: a worker
    thread tokenizes/pads `prefetch_depth` batches ahead (io/prefetch.py)
    and the log-prob readback of batch i-1 happens while batch i runs on
    the device (one-deep dispatch pipeline; jax dispatch is async).
    `progress`, if given, is called with the running sequence count.
    """
    from evo_tpu.io.prefetch import prefetch_map

    if reduce_method == 'mean':
        reduce_func = np.mean
    elif reduce_method == 'sum':
        reduce_func = np.sum
    else:
        raise ValueError(f'Invalid reduce_method {reduce_method}')

    def prep(batch):
        return prepare_batch(batch, tokenizer, prepend_bos=prepend_bos,
                             pad_to_bucket=pad_to_bucket)

    def finalize(pending):
        logprobs_dev, seq_lengths = pending
        logprobs = np.asarray(logprobs_dev, dtype=np.float32)
        return [float(reduce_func(logprobs[i][:seq_lengths[i]]))
                for i in range(len(seq_lengths))]

    scores: List[float] = []
    done = 0
    pending = None
    for input_ids, seq_lengths in prefetch_map(prep, seq_batches,
                                               depth=prefetch_depth):
        logits, _ = model(input_ids)            # async dispatch
        logprobs_dev = logits_to_logprobs(logits, input_ids,
                                          trim_bos=True)
        if pending is not None:
            out = finalize(pending)             # sync readback of i-1
            scores += out
            done += len(out)
            if progress is not None:
                progress(done)
        pending = (logprobs_dev, seq_lengths)
    if pending is not None:
        out = finalize(pending)
        scores += out
        done += len(out)
        if progress is not None:
            progress(done)
    return scores


def _aligned_cache_len(L: int, align: int = 1024) -> int:
    """KV-buffer length for segmented prefill: L+1, rounded up to `align`
    for long sequences so the Pallas buffer-flash kernel gets its
    preferred big k-blocks, and to 128 otherwise so the kernel is at
    least ELIGIBLE (ops/pallas_attention.py:_buffer_block_k needs a
    power-of-two block >= 128 dividing T; padded positions are always
    causally masked). Short lengths used to stay at L+1, silently
    dropping short `kv_quant: int8` runs onto the slower jnp fallback
    the mha_step warning points at. ~50 KB/position — negligible here.
    Pass align=4096 for int8 caches: that kernel's per-grid-step cost is
    fixed-overhead-bound at 1024 on the DMA-light decode workload."""
    T = L + 1
    if L >= 4096:
        return -(-T // align) * align
    return -(-T // 128) * 128


def _cache_align(cfg) -> int:
    return 4096 if getattr(cfg, 'kv_quant', 'none') == 'int8' else 1024


def _segment_bounds(L: int, segment_len: int) -> List[int]:
    """Split points for segmented prefill: the ragged remainder goes in
    the FIRST segment (a fresh prefill accepts any length; tiny
    remainders are absorbed into it), every later segment is exactly
    `segment_len`. A ragged LAST segment would route a short tail
    through extra compiled shapes — and a 1-token tail through the
    non-donating decode step, which copies the full KV buffers: an OOM
    on the 131k workload this machinery exists for (a 131073-token
    BOS-prefixed sequence has exactly that tail)."""
    r = L % segment_len
    if r and r < 64 and L > segment_len:
        r += segment_len
    first = r or min(L, segment_len)
    bounds = [0, first]
    while bounds[-1] < L:
        bounds.append(min(bounds[-1] + segment_len, L))
    return bounds


def score_sequences_segmented(
    seqs: Sequence[str],
    model,
    tokenizer: CharLevelTokenizer,
    segment_len: int = 8192,
    reduce_method: str = 'mean',
    prepend_bos: bool = True,
) -> List[float]:
    """Long-context scoring with bounded activation memory: the sequence is
    prefilled in `segment_len` chunks through the resumable cache (exact
    Hyena modal/FIR state carry + KV-buffer attention,
    `model.prefill(resume=True)`), so peak memory is O(segment) for
    activations plus the KV buffers — the single-chip/small-TP path to 131k
    scoring that one monolithic prefill cannot fit. Results match
    `score_sequences` exactly on any length (tests/test_scoring.py).

    Sequences are scored one at a time (B=1): ragged batches would waste
    segment compute on padding.
    """
    if reduce_method == 'mean':
        reduce_func = np.mean
    elif reduce_method == 'sum':
        reduce_func = np.sum
    else:
        raise ValueError(f'Invalid reduce_method {reduce_method}')
    scores = []
    for seq in seqs:
        ids, _ = prepare_batch([seq], tokenizer, prepend_bos=prepend_bos)
        L = ids.shape[1]
        cache = model.initialize_inference_params(
            1, _aligned_cache_len(L, _cache_align(model.config)))
        pieces = []
        carry_logit = None          # last logit of the previous segment
        bounds = _segment_bounds(L, segment_len)
        for s, e in zip(bounds[:-1], bounds[1:]):
            seg = jnp.asarray(ids[:, s:e])
            # donate_cache: this loop owns `cache` and replaces it every
            # segment; donation keeps ONE set of KV buffers live (6.4 GB
            # at 131k — an un-donated copy cannot fit next to the weights).
            # resume passed explicitly: deriving it reads cache['offset']
            # back to host, serializing the segment pipeline
            logits, cache = model(seg, inference_params_dict=cache,
                                  donate_cache=True, resume=s > 0)
            # position t's logits predict token t+1: within the segment
            # logits[:, :-1] pairs with seg[:, 1:]; the segment's first
            # token is predicted by the PREVIOUS segment's last logit
            if carry_logit is not None:
                pieces.append(logits_to_logprobs(carry_logit, seg[:, :1],
                                                 trim_bos=False))
            pieces.append(logits_to_logprobs(logits, seg, trim_bos=True))
            carry_logit = logits[:, -1:]
        logprobs = np.concatenate(
            [np.asarray(p, np.float32) for p in pieces], axis=1)[0]
        # reference semantics: trim_bos drops the first input id; scoring
        # then reduces over the first len(seq) target positions
        scores.append(float(reduce_func(logprobs[:len(seq)])))
    return scores


def positional_entropies_segmented(
    seqs: Sequence[str],
    model,
    tokenizer: CharLevelTokenizer,
    segment_len: int = 8192,
    prepend_bos: bool = True,
) -> List[np.ndarray]:
    """`positional_entropies` for 131k-class sequences: the sequence is
    prefilled in `segment_len` chunks through the resumable donate-cache
    prefill (same machinery as `score_sequences_segmented`), and the
    per-position entropy is reduced on device per segment — peak memory
    is O(segment) + the KV buffers, vs O(L) logits for the monolithic
    path. Matches `positional_entropies` exactly (tests/test_scoring.py).
    """
    out = []
    for seq in seqs:
        ids, _ = prepare_batch([seq], tokenizer, prepend_bos=prepend_bos)
        L = ids.shape[1]
        cache = model.initialize_inference_params(
            1, _aligned_cache_len(L, _cache_align(model.config)))
        pieces = []
        bounds = _segment_bounds(L, segment_len)
        for s, e in zip(bounds[:-1], bounds[1:]):
            seg = jnp.asarray(ids[:, s:e])
            logits, cache = model(seg, inference_params_dict=cache,
                                  donate_cache=True, resume=s > 0)
            logp = _log_softmax(logits)
            ent = -jnp.sum(jnp.exp(logp) * logp, axis=-1)
            pieces.append(np.asarray(ent, np.float32))
        ent = np.concatenate(pieces, axis=1)[0]
        # monolithic semantics: with BOS, position i's entropy describes
        # the prediction OF sequence char i (logits trimmed by one)
        if prepend_bos:
            ent = ent[:-1]
        out.append(ent[:len(seq)])
        assert len(out[-1]) == len(seq)
    return out


def positional_entropies(
    seqs: Sequence[str],
    model,
    tokenizer: CharLevelTokenizer,
    prepend_bos: bool = True,
) -> List[np.ndarray]:
    """Per-position Shannon entropy of the predictive distribution
    (`evo/scoring.py:99-131`), trimmed to each true sequence length."""
    input_ids, seq_lengths = prepare_batch(seqs, tokenizer,
                                           prepend_bos=prepend_bos)
    logits, _ = model(input_ids)
    logp = _log_softmax(logits)
    if prepend_bos:
        logp = logp[:, :-1]
    ent = np.asarray(-jnp.sum(jnp.exp(logp) * logp, axis=-1))
    out = [ent[i][:seq_lengths[i]] for i in range(len(seq_lengths))]
    assert all(len(s) == len(e) for s, e in zip(seqs, out))
    return out
