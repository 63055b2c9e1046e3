"""Continuous-batching generation server.

The reference serves generation one batch at a time: equal-length prompts
run together, everything else falls back to B=1 loops
(`/root/reference/evo/generation.py:238-253`), so a production stream of
ragged, staggered requests leaves the chip mostly idle — 7B decode is
weight-bandwidth-bound and B=1 runs at ~1/8 of the B=8 aggregate
throughput (BASELINE.md decode rows). This module adds the serving layer
the reference lacks: a fixed-slot continuous-batching scheduler where
every request owns one row of a shared decode cache and new requests are
prefilled into slots the moment one frees up.

TPU-first design:

  * **Static shapes everywhere.** One (max_slots, max_len) decode cache,
    one compiled decode program; request raggedness lives in a per-slot
    int32 offset vector (`model.decode_step` accepts scalar OR (B,)
    offsets — per-row rotary positions, per-row KV-buffer writes, per-row
    attention masks; layers/attention.py). No shape depends on the
    request mix, so nothing recompiles as traffic changes.
  * **Slot insertion is a device-side scatter.** A new request is
    prefilled at B=1 (the model's normal chunked-conv prefill fills a
    single-row cache), then `_admit_slot` samples its first token AND
    writes that row into the batch cache with `dynamic_update_slice` in
    one fused jit program — no host round-trip of cache contents (the
    KV rows alone are ~100 MB at 7B/8k) and one dispatch per admission
    instead of two (~28 ms each on the tunneled backend).
  * **Decode runs in chunks of `steps_per_sync` steps under one
    `lax.scan`** with the cache donated, so the host syncs (and fills
    free slots) every K tokens instead of every token — on the tunneled
    backend one dispatch costs ~28 ms (docs/performance.md), which would
    otherwise dominate a ~19 ms/step decode. Slots that finish mid-chunk
    discard at most K-1 excess tokens.
  * **Per-slot sampling params.** Temperature, top-k, and top-p are all
    (B,) traced vectors (temperature 0 = greedy, resolved with
    `jnp.where`, not control flow; per-row sort-based k/p thresholds in
    `_sample_slots`) — every request carries its own sampling
    parameters and nothing recompiles as the mix changes.

Inactive slots keep stepping with stale state — their outputs are
discarded and their cache rows are fully overwritten at the next insert,
so correctness never depends on masking them out of the forward.
"""

from __future__ import annotations

import dataclasses
import functools
from collections import deque
from typing import Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from evo_tpu import model as model_lib
from evo_tpu.config import ModelConfig
from evo_tpu.layers.hyena import HyenaState
from evo_tpu.ops.sampling import NEG_INF


# ---------------------------------------------------------------------------
# Device programs
# ---------------------------------------------------------------------------

def _sample_slots(keys, logits, top_ks, top_ps, temps):
    """Per-slot sampling: logits (B, V) f32ish; top_ks (B,) int32,
    top_ps/temps (B,) float32 — every sampling parameter is a traced
    per-slot vector, so requests carry their own top-k/top-p/temperature
    and NOTHING recompiles as the mix changes. keys (B, 2) uint32 — one
    PRNG key PER SLOT, so a request's sample stream is a pure function
    of its own seed (deterministic regardless of which other requests
    share the batch or when they arrive).

    Rows with temps <= 0 take argmax (greedy); others sample from the
    top-k/top-p-filtered temperature-scaled distribution (same
    tie-inclusive threshold semantics as ops/sampling.py's static
    filters: per-row k <= 0 keeps all, per-row p >= 1 keeps all, the
    top token is always kept). Returns (tokens (B,) int32, logp (B,)
    float32) where logp is the log-prob of the chosen token under the
    UNFILTERED distribution (the per-token score a scoring pass would
    assign it).
    """
    logits32 = logits.astype(jnp.float32)
    logp_full = jax.nn.log_softmax(logits32, axis=-1)
    greedy = jnp.argmax(logits32, axis=-1).astype(jnp.int32)
    t = jnp.maximum(temps, 1e-6)[:, None]
    scaled = logits32 / t
    V = scaled.shape[-1]
    srt = jnp.sort(scaled, axis=-1)[:, ::-1]              # descending
    # top-k threshold: value of each row's k-th largest logit
    k = jnp.clip(top_ks, 1, V)
    kth = jnp.take_along_axis(srt, (k - 1)[:, None], axis=-1)
    keep_k = ((top_ks <= 0) | (top_ks >= V))[:, None] | (scaled >= kth)
    filt = jnp.where(keep_k, scaled, NEG_INF)
    # nucleus threshold AFTER top-k (sequential composition, same as
    # ops/sampling.py's static sample()): smallest logit in the minimal
    # prefix of the top-k-filtered sorted distribution with cumulative
    # probability >= p
    srt_f = jnp.sort(filt, axis=-1)[:, ::-1]
    probs = jax.nn.softmax(srt_f, axis=-1)
    cum = jnp.cumsum(probs, axis=-1)
    keep_sorted = (cum - probs) < top_ps[:, None]
    keep_sorted = keep_sorted.at[:, 0].set(True)
    pth = jnp.min(jnp.where(keep_sorted, srt_f, jnp.inf), axis=-1,
                  keepdims=True)
    keep_p = (top_ps >= 1.0)[:, None] | (filt >= pth)
    filt = jnp.where(keep_p, filt, NEG_INF)
    sampled = jax.vmap(
        lambda kk, row: jax.random.categorical(kk, row))(keys, filt)
    tok = jnp.where(temps <= 0.0, greedy, sampled.astype(jnp.int32))
    logp = jnp.take_along_axis(logp_full, tok[:, None], axis=-1)[:, 0]
    return tok, logp


def _split_slot_keys(keys):
    """(B, 2) uint32 -> (next (B, 2), sub (B, 2)): one split per slot."""
    ks = jax.vmap(lambda k: jax.random.split(k, 2))(keys)
    return ks[:, 0], ks[:, 1]


@functools.partial(
    jax.jit,
    static_argnames=('cfg', 'steps', 'mesh'),
    donate_argnames=('cache',))
def _decode_chunk(params, tokens, cache, keys, temps, top_ks, top_ps, *,
                  cfg: ModelConfig, steps: int, mesh=None):
    """Run `steps` decode+sample steps for the whole slot batch.

    tokens: (B,) int32 — each slot's current token (already emitted or the
    prompt's last sampled token); keys: (B, 2) uint32 per-slot PRNG keys.
    Returns (next tokens, cache, keys', emitted (steps, B) int32,
    logps (steps, B) f32).
    """
    def body(carry, _):
        toks, cache, keys = carry
        logits, cache = model_lib.decode_step(params, cfg, toks, cache,
                                              mesh=mesh)
        keys, sub = _split_slot_keys(keys)
        nxt, logp = _sample_slots(sub, logits, top_ks, top_ps, temps)
        return (nxt, cache, keys), (nxt, logp)

    (tokens, cache, keys), (emitted, logps) = jax.lax.scan(
        body, (tokens, cache, keys), None, length=steps)
    return tokens, cache, keys, emitted, logps


@functools.partial(jax.jit,
                   static_argnames=('cfg',),
                   donate_argnames=('batch_cache',))
def _admit_slot(batch_cache, single_cache, src, slot, last_logits, temp0,
                tk0, tp0, base_key, seed, tokens, temps, topks, topps,
                keys, *, cfg: ModelConfig):
    """Admit a freshly-prefilled request in ONE device program: sample
    its first token from the prefill's last logits with the request's
    own key, then scatter row `src` of the prefill cache into slot
    `slot`.

    One fused dispatch instead of the original sample + insert pair —
    on the tunneled backend each dispatch costs ~28 ms
    (docs/performance.md), which at serving admission rates was ~9% of
    wall clock. Returns (cache, tokens, temps, topks, topps, keys,
    tok0, logp0); the host DEFERS the tok0/logp0 readback
    (_flush_firsts) so admission never blocks on the device pipeline.

    batch_cache: offset (B,), attn KV (B, T, ...), hyena state (n, B, ...).
    single_cache: a (Bsrc, T, ...) twin — Bsrc=1 for the normal fill
    path, Bsrc=prefill_batch for batched admission; last_logits is its
    (Bsrc, V) final-position logits. src and slot are both traced — one
    compiled program per Bsrc serves every (row, slot) pair.
    """
    req_key = jax.random.fold_in(base_key, seed)
    nxt, sub = _split_slot_keys(req_key[None])
    row_logits = jax.lax.dynamic_slice_in_dim(last_logits, src, 1, axis=0)
    tok0, logp0 = _sample_slots(sub, row_logits,
                                jnp.asarray([tk0], jnp.int32),
                                jnp.asarray([tp0], jnp.float32),
                                jnp.asarray([temp0], jnp.float32))
    tok0, logp0, key0 = tok0[0], logp0[0], nxt[0]

    def _row(x, axis):
        return jax.lax.dynamic_slice_in_dim(x, src, 1, axis=axis)

    new_layers = []
    for (kind, _idxs), bl, sl in zip(cfg.layer_segments(),
                                     batch_cache['layers'],
                                     single_cache['layers']):
        if kind == 'attn':
            # copy every attn-cache leaf's row (k/v, plus the kv_quant
            # scale buffers when present) — all are (B, T, ...)
            new_layers.append({
                kk: jax.lax.dynamic_update_slice(
                    bl[kk], _row(sl[kk], 0).astype(bl[kk].dtype),
                    (slot,) + (0,) * (bl[kk].ndim - 1))
                for kk in bl
            })
        else:
            new_layers.append(HyenaState(
                fir=jax.lax.dynamic_update_slice(
                    bl.fir, _row(sl.fir, 1).astype(bl.fir.dtype),
                    (0, slot, 0, 0, 0)),
                iir=jax.lax.dynamic_update_slice(
                    bl.iir, _row(sl.iir, 1).astype(bl.iir.dtype),
                    (0, slot, 0, 0, 0)),
            ))
    # the fill cache's offset is a scalar shared by all its rows (a
    # batched fill is same-length by construction)
    offset = jax.lax.dynamic_update_slice(
        batch_cache['offset'],
        single_cache['offset'].astype(jnp.int32)[None], (slot,))
    tokens = jax.lax.dynamic_update_slice(tokens, tok0[None], (slot,))
    temps = jax.lax.dynamic_update_slice(
        temps, jnp.asarray(temp0, jnp.float32)[None], (slot,))
    topks = jax.lax.dynamic_update_slice(
        topks, jnp.asarray(tk0, jnp.int32)[None], (slot,))
    topps = jax.lax.dynamic_update_slice(
        topps, jnp.asarray(tp0, jnp.float32)[None], (slot,))
    keys = jax.lax.dynamic_update_slice(keys, key0[None], (slot, 0))
    return ({'offset': offset, 'layers': new_layers}, tokens, temps,
            topks, topps, keys, tok0, logp0)


# ---------------------------------------------------------------------------
# Host-side scheduler
# ---------------------------------------------------------------------------

@dataclasses.dataclass
class _Request:
    rid: int
    input_ids: np.ndarray            # (P,) int32
    num_tokens: int
    temperature: float
    seed: int
    top_k: int = 0
    top_p: float = 1.0
    tokens: List[int] = dataclasses.field(default_factory=list)
    logps: List[float] = dataclasses.field(default_factory=list)
    done: bool = False


@dataclasses.dataclass
class GenerationResult:
    """One finished request: generated token ids, detokenized sequence
    (when the server has a tokenizer), and the mean log-prob of the
    generated tokens under the distributions they were sampled from.
    `cancelled` marks a request ended early by `cancel()` — token_ids
    holds whatever was generated before the cancel."""
    rid: int
    token_ids: np.ndarray
    sequence: Optional[str]
    score: float
    cancelled: bool = False


class GenerationServer:
    """Fixed-slot continuous-batching scheduler (module docstring).

    model: an EvoModel (evo_tpu.models). max_len bounds prompt + generated
    tokens per request. top_k/top_p/temperature are all per request
    (submit() overrides; constructor values are the defaults).
    """

    def __init__(self, model, tokenizer=None, max_slots: int = 4,
                 max_len: int = 512, top_k: int = 0, top_p: float = 1.0,
                 steps_per_sync: int = 8, stop_token: Optional[int] = None,
                 prompt_chunk: Optional[int] = None,
                 prefill_chunks_per_sync: int = 0,
                 prefill_batch: int = 0, seed: int = 0):
        """prompt_chunk: prefill prompts in fixed-size chunks through the
        resumable cache. Without it every distinct prompt length compiles
        its own prefill program (minutes each at 7B on TPU); with it the
        compiled-shape set is bounded — one chunk-sized resume prefill
        plus at most `prompt_chunk` tail lengths.

        prefill_chunks_per_sync: interleave long-prompt prefill with
        decode — at most this many prompt chunks run per step(), so a
        long arriving prompt stalls the running decode batch by a
        bounded slice instead of its whole prefill (the chunked-prefill
        latency property). 0 (default) completes each fill immediately.
        Outputs are identical either way (exact resumable-state carry +
        per-request RNG).

        prefill_batch: admit up to this many SAME-LENGTH queued prompts
        in one batched prefill, amortizing the 7B weight read across
        rows (B=1 short-prompt prefill is weight-bandwidth-bound, like
        decode, and admissions serialize with decode on the chip).
        Group sizes come from a power-of-two ladder {2, 4, ..., k}: a
        fill takes the largest ladder size that the queue's same-length
        run AND the free-slot count cover, else the B=1 path — mid-run
        slot turnover frees slots a few at a time, so a strict
        all-or-nothing k would stop firing after the initial fill. The
        compiled-program set stays bounded at log2(k) sizes per tail
        shape with zero padded/wasted prefill compute. Row math is
        row-independent (matmul contractions never cross the batch
        axis), so per-request reproducibility is unchanged. 0/1
        disables."""
        if max_slots < 1:
            raise ValueError('max_slots must be >= 1')
        self.model = model
        self.cfg: ModelConfig = model.config
        self.tokenizer = tokenizer
        self.max_slots = max_slots
        self.max_len = max_len
        self.top_k = int(top_k)
        self.top_p = float(top_p)
        self.steps_per_sync = max(1, int(steps_per_sync))
        self.stop_token = stop_token
        self.prompt_chunk = prompt_chunk
        self.prefill_chunks_per_sync = max(0, int(prefill_chunks_per_sync))
        self.prefill_batch = max(0, int(prefill_batch))
        # at most one fill (1 or prefill_batch same-length prompts) is
        # mid-prefill at a time (prefill is serial on the chip and
        # shares one scratch cache per row count):
        # {'slots': [int], 'reqs': [_Request], 'ids' (k, P), 'pos'}
        self._fill: Optional[dict] = None
        # most recent completed prefill, reused verbatim for identical
        # follow-up prompts: {'key': bytes, 'cache', 'last_logits'}
        self._prefix: Optional[dict] = None

        # Under `kv_quant: int8`, size the CACHE at the int8 buffer
        # kernel's eligible multiple (4096-long k-blocks): a user-chosen
        # max_len that isn't kernel-eligible would silently drop decode to
        # the jnp int8 fallback, which is SLOWER than bf16 (the mode would
        # pessimize the very thing it's for — ADVICE r3). Padded positions
        # are never attended (offset mask) and, being int8, cost ~25 KB
        # per position per slot. self.max_len keeps the user's bound.
        cache_len = max_len
        if getattr(self.cfg, 'kv_quant', 'none') == 'int8':
            # kernel eligibility needs a power-of-two block (>=128)
            # dividing T (ops/pallas_attention.py:_buffer_block_k); the
            # 4096 alignment additionally gets the big k-blocks the
            # DMA-light decode grid wants at long context — but only
            # when the rounding is cheap: at high slot counts the cache
            # is the HBM budget (~25 KB/pos/slot int8), and max_len=4097
            # rounding to 8192 would burn ~9.8 GB at 96 slots for a few
            # percent of kernel-grid overhead. >25% padding falls back
            # to 128-alignment (eligible, smaller blocks).
            big = -(-max_len // 4096) * 4096
            if max_len >= 4096 and big <= max_len + max_len // 4:
                cache_len = big
            else:
                cache_len = -(-max_len // 128) * 128
        self._cache_len = cache_len
        cache = model.initialize_inference_params(max_slots, cache_len)
        # scalar offset -> per-slot offset vector (decode_step broadcasts)
        cache['offset'] = jnp.zeros((max_slots,), jnp.int32)
        self._cache = cache
        # reusable scratch prefill caches keyed by row count (donated
        # through every prefill); the batched one is built lazily on the
        # first k-row fill
        self._prefill_caches = {1: model.initialize_inference_params(
            1, cache_len)}
        self._tokens = jnp.zeros((max_slots,), jnp.int32)
        self._temps = jnp.zeros((max_slots,), jnp.float32)
        self._topks = jnp.full((max_slots,), int(top_k), jnp.int32)
        self._topps = jnp.full((max_slots,), float(top_p), jnp.float32)
        # per-slot PRNG keys: each request's stream comes from
        # fold_in(base, request seed), so its samples do not depend on
        # co-tenant traffic or arrival timing
        self._base_key = jax.random.PRNGKey(seed)
        self._keys = jnp.zeros((max_slots, 2), jnp.uint32)

        self._queue: deque[_Request] = deque()
        # deferred (req, tok0_dev, logp0_dev) admission scalars
        self._pending_first: List[tuple] = []
        self._slots: List[Optional[_Request]] = [None] * max_slots
        self._requests: Dict[int, _Request] = {}
        self._results: Dict[int, GenerationResult] = {}
        self._next_rid = 0

    # -- submission ----------------------------------------------------------

    def submit(self, prompt: Optional[str] = None, input_ids=None,
               num_tokens: int = 32, temperature: float = 0.0,
               seed: Optional[int] = None, top_k: Optional[int] = None,
               top_p: Optional[float] = None) -> int:
        """Queue a generation request; returns its request id.

        seed: the request's sampling seed (default: its request id).
        Results are reproducible per (server seed, request seed,
        prompt, params) — independent of co-tenant traffic.
        top_k/top_p: per-request overrides of the server-wide defaults
        (traced per-slot vectors — no recompiles as the mix changes)."""
        if input_ids is None:
            if prompt is None:
                raise ValueError('pass prompt= or input_ids=')
            if self.tokenizer is None:
                raise ValueError('string prompts need a tokenizer')
            input_ids = self.tokenizer.tokenize(prompt)
        ids = np.asarray(input_ids, dtype=np.int32).reshape(-1)
        if ids.size == 0:
            raise ValueError('empty prompt')
        if num_tokens < 1:
            raise ValueError('num_tokens must be >= 1')
        if ids.size + num_tokens > self.max_len:
            raise ValueError(
                f'prompt ({ids.size}) + num_tokens ({num_tokens}) exceeds '
                f'the server max_len ({self.max_len})')
        rid = self._next_rid
        self._next_rid += 1
        req = _Request(rid, ids, int(num_tokens), float(temperature),
                       int(rid if seed is None else seed),
                       top_k=int(self.top_k if top_k is None else top_k),
                       top_p=float(self.top_p if top_p is None else top_p))
        self._requests[rid] = req
        self._queue.append(req)
        return rid

    # -- scheduling ----------------------------------------------------------

    def _head_len(self, P: int) -> int:
        """Length of the fixed-chunk head of a P-token prompt (the rest is
        the non-empty ragged tail that yields the first-token logits)."""
        if not self.prompt_chunk or P <= self.prompt_chunk:
            return 0
        head = (P // self.prompt_chunk) * self.prompt_chunk
        return head - self.prompt_chunk if head == P else head

    def _insert_from(self, fill_cache, last_logits, slot: int,
                     req: _Request, src: int = 0) -> None:
        """Sample the request's first token and scatter row `src` of
        `fill_cache` into `slot` (fill_cache is NOT donated — it doubles
        as the prefix cache for identical follow-up prompts, and a
        batched fill's rows are admitted one scatter at a time)."""
        (self._cache, self._tokens, self._temps, self._topks,
         self._topps, self._keys, tok0, logp0) = _admit_slot(
            self._cache, fill_cache, jnp.asarray(src, jnp.int32),
            jnp.asarray(slot, jnp.int32), last_logits[:, -1],
            req.temperature, req.top_k, req.top_p, self._base_key,
            jnp.asarray(req.seed, jnp.int32), self._tokens, self._temps,
            self._topks, self._topps, self._keys, cfg=self.cfg)
        self._slots[slot] = req
        # DEFER the first-token readback: a device_get here would block
        # on the whole queued device pipeline (prefill + admit) per
        # admission — measured ~9% of serving wall clock. The scalars
        # stay on device until the next host observation point
        # (_flush_firsts), which fetches every pending pair in one
        # batched transfer.
        self._pending_first.append((req, tok0, logp0))

    def _flush_firsts(self) -> None:
        """Materialize deferred first-token scalars (one batched
        device_get) and run their bookkeeping. Called before any host
        observation of tokens/results (harvest, progress, results,
        cancel), so the deferral is invisible to callers."""
        if not self._pending_first:
            return
        pend, self._pending_first = self._pending_first, []
        vals = jax.device_get([(t, l) for _, t, l in pend])
        for (req, _, _), (t, l) in zip(pend, vals):
            self._record(req, int(t), float(l))

    def _service_fills(self) -> None:
        """Start/advance prompt prefills into free slots.

        Prefix cache: the most recent completed prefill is kept (cache +
        last logits, keyed by the prompt bytes), so a request repeating
        the previous prompt inserts with ZERO device prefill work — the
        dominant pattern of the sampling pipelines, which submit each
        prompt n_sample_per_prompt times (reference `sample_model`,
        semantic_design.py:271-427). Each request still gets its own
        sampling key, so forked slots decode independently.

        New prompts run as a fresh prefill into a scratch cache (donated
        through the chunks; stale contents past the prompt stay masked
        out by the slot's offset). With prefill_batch, k same-length
        queued prompts share ONE k-row prefill (strict-k grouping —
        __init__ docstring) and each row is admitted by its own scatter.
        On completion a B=1 filled scratch BECOMES the prefix cache and
        the old prefix tree becomes the next scratch — two single-row
        caches total, no per-fill allocation (a batched fill's cache is
        simply retained as the next batched scratch). With prompt_chunk
        the head runs as fixed-size resumed chunks (bounded
        compiled-shape set); with prefill_chunks_per_sync > 0 at most
        that many chunks run per call, interleaving long prefills with
        decode."""
        budget = self.prefill_chunks_per_sync or float('inf')
        while budget > 0:
            if self._fill is None:
                if not self._start_fill():
                    return
                if self._fill is None:
                    continue                 # prefix-cache insert: free
            f = self._fill
            if all(r.done for r in f['reqs']):
                self._fill = None            # everything cancelled
                continue
            k = len(f['reqs'])
            ids = f['ids']
            head = self._head_len(int(ids.shape[1]))
            while f['pos'] < head and budget > 0:
                s = f['pos']
                _, self._prefill_caches[k] = self.model(
                    ids[:, s:s + self.prompt_chunk],
                    inference_params_dict=self._prefill_caches[k],
                    donate_cache=True, resume=s > 0)
                f['pos'] += self.prompt_chunk
                budget -= 1
            if f['pos'] < head:
                return                       # mid-fill; decode continues
            budget -= 1                      # the tail chunk below
            last_logits, filled = self.model(
                ids[:, head:],
                inference_params_dict=self._prefill_caches[k],
                donate_cache=True, resume=head > 0)
            if k == 1:
                # swap: the filled scratch becomes the prefix cache; the
                # old prefix tree (same shapes) becomes the next scratch
                if self._prefix is not None:
                    self._prefill_caches[1] = self._prefix['cache']
                else:
                    self._prefill_caches[1] = self.model.\
                        initialize_inference_params(1, self._cache_len)
                self._prefix = {'key': f['reqs'][0].input_ids.tobytes(),
                                'cache': filled,
                                'last_logits': last_logits}
            else:
                # admissions below only READ `filled`; by the time the
                # next k-row fill donates it they are already issued
                self._prefill_caches[k] = filled
            for src, (slot, req) in enumerate(zip(f['slots'], f['reqs'])):
                if not req.done:             # skip rows cancelled mid-fill
                    self._insert_from(filled, last_logits, slot, req,
                                      src=src)
            self._fill = None

    def _group_size(self, avail: int) -> int:
        """Largest ladder size ({2,4,...,prefill_batch}) <= avail, or 1.

        avail already accounts for both the same-length queue run and
        the free-slot count; capping sizes to the ladder bounds the
        compiled prefill/admit program set at log2(prefill_batch)
        entries per tail shape."""
        g = 1
        while g * 2 <= min(avail, self.prefill_batch):
            g *= 2
        return g

    def _start_fill(self) -> bool:
        """Pop the next request(s) off the queue: a zero-cost prefix
        insert, a fresh B=1 fill, or (prefill_batch) a same-length
        batched fill at a ladder size. Returns False when no work can
        start."""
        free = [i for i, r in enumerate(self._slots) if r is None]
        if not free or not self._queue:
            return False
        req = self._queue.popleft()
        if (self._prefix is not None
                and self._prefix['key'] == req.input_ids.tobytes()):
            self._insert_from(self._prefix['cache'],
                              self._prefix['last_logits'], free[0], req)
            return True                      # no device prefill consumed
        reqs = [req]
        if self.prefill_batch > 1:
            P = req.input_ids.size
            mates = [r for r in self._queue
                     if r.input_ids.size == P
                     and (self._prefix is None
                          or self._prefix['key'] != r.input_ids.tobytes())]
            g = self._group_size(min(len(free), len(mates) + 1))
            if g > 1:
                for m in mates[:g - 1]:
                    self._queue.remove(m)
                    reqs.append(m)
                if g not in self._prefill_caches:
                    self._prefill_caches[g] = self.model.\
                        initialize_inference_params(g, self._cache_len)
        self._fill = {'slots': free[:len(reqs)], 'reqs': reqs,
                      'ids': jnp.asarray(
                          np.stack([r.input_ids for r in reqs])),
                      'pos': 0}
        return True

    def _record(self, req: _Request, token: int, logp: float) -> None:
        req.tokens.append(token)
        req.logps.append(logp)
        if (len(req.tokens) >= req.num_tokens
                or (self.stop_token is not None
                    and token == self.stop_token)):
            self._finalize(req)

    def _finalize(self, req: _Request, cancelled: bool = False) -> None:
        req.done = True
        ids = np.asarray(req.tokens, dtype=np.int32)
        seq = (self.tokenizer.detokenize(ids.tolist())
               if self.tokenizer is not None else None)
        score = float(np.mean(req.logps)) if req.logps else float('nan')
        self._results[req.rid] = GenerationResult(
            rid=req.rid, token_ids=ids, sequence=seq, score=score,
            cancelled=cancelled)

    def _harvest(self, emitted: np.ndarray, logps: np.ndarray) -> None:
        """emitted/logps: (steps, B) from one decode chunk."""
        self._flush_firsts()     # first tokens precede this chunk's
        for step in range(emitted.shape[0]):
            for slot, req in enumerate(self._slots):
                if req is None or req.done:
                    continue
                self._record(req, int(emitted[step, slot]),
                             float(logps[step, slot]))
        for slot, req in enumerate(self._slots):
            if req is not None and req.done:
                self._slots[slot] = None

    def step(self) -> None:
        """Advance prompt prefills, then run one decode chunk."""
        self._service_fills()
        # free finished slots created by 1-token requests at fill time
        for slot, req in enumerate(self._slots):
            if req is not None and req.done:
                self._slots[slot] = None
        if not any(self._slots):
            return
        # always run exactly steps_per_sync steps: `steps` is static under
        # jit, so a data-dependent chunk size would compile a fresh decode
        # program per distinct value (minutes each at 7B). Slots that
        # finish mid-chunk cost nothing extra — the chunk runs for their
        # co-tenants anyway and their surplus tokens are discarded.
        (self._tokens, self._cache, self._keys, emitted,
         logps) = _decode_chunk(
            self.model.params, self._tokens, self._cache, self._keys,
            self._temps, self._topks, self._topps, cfg=self.cfg,
            steps=self.steps_per_sync,
            mesh=getattr(self.model, 'mesh', None))
        self._harvest(np.asarray(emitted), np.asarray(logps))

    def run(self) -> Dict[int, GenerationResult]:
        """Drive the loop until every submitted request has finished."""
        while self._queue or any(self._slots) or self._fill is not None:
            self.step()
        self._flush_firsts()
        return dict(self._results)

    # -- results -------------------------------------------------------------

    def result(self, rid: int) -> Optional[GenerationResult]:
        self._flush_firsts()
        return self._results.get(rid)

    def progress(self, rid: int) -> int:
        """Tokens generated so far for request `rid` (0 while queued /
        unknown). Host-visible after each step() sync — the hook the
        latency benchmark (and a streaming API) needs to timestamp
        first-token emission."""
        self._flush_firsts()
        req = self._requests.get(rid)
        return 0 if req is None else len(req.tokens)

    def tokens_so_far(self, rid: int) -> List[int]:
        """Copy of the tokens generated so far (streaming consumers;
        grows at step()-sync granularity; complete once result(rid)
        exists)."""
        self._flush_firsts()
        req = self._requests.get(rid)
        return [] if req is None else list(req.tokens)

    def cancel(self, rid: int) -> bool:
        """End request `rid` early. Returns True if it was still queued,
        mid-prefill, or decoding — its result is finalized immediately
        with the tokens generated so far and `cancelled=True`, and its
        slot frees for the next queued request at the coming step().
        False if unknown or already finished. Slot state needs no
        scrubbing: inactive rows keep stepping harmlessly and are fully
        overwritten at the next insert (module docstring)."""
        self._flush_firsts()
        req = self._requests.get(rid)
        if req is None or req.done:
            return False
        if req in self._queue:
            self._queue.remove(req)
        elif self._fill is not None and req in self._fill['reqs']:
            # mark the row cancelled; co-tenant rows keep filling. When
            # every row is cancelled _service_fills drops the whole fill
            # (the scratch cache is reused — fresh prefills rewrite it
            # from position 0).
            if all(r.done or r is req for r in self._fill['reqs']):
                self._fill = None
        else:
            for i, r in enumerate(self._slots):
                if r is req:
                    self._slots[i] = None
                    break
        self._finalize(req, cancelled=True)
        return True

    @property
    def pending(self) -> int:
        filling = (0 if self._fill is None
                   else sum(not r.done for r in self._fill['reqs']))
        return (len(self._queue) + sum(r is not None for r in self._slots)
                + filling)


class ServerLoop:
    """Thread-safe driver around a GenerationServer.

    A background thread runs `server.step()` whenever work is pending;
    any number of caller threads (e.g. HTTP handlers, scripts/serve.py)
    submit requests and block on their own result. All server access is
    serialized under one lock — a decode chunk holds it for its
    wall-clock (~hundreds of ms at 7B), which is the intended batching
    granularity, not a contention bug.
    """

    def __init__(self, server: GenerationServer):
        import threading
        self.server = server
        self._cv = threading.Condition()
        self._stop = False
        self._thread = threading.Thread(target=self._run, daemon=True)
        self._thread.start()

    def _run(self):
        while True:
            with self._cv:
                while not self._stop and self.server.pending == 0:
                    self._cv.wait(timeout=0.1)
                if self._stop:
                    return
                self.server.step()
                self._cv.notify_all()

    def submit(self, **kwargs) -> int:
        with self._cv:
            rid = self.server.submit(**kwargs)
            self._cv.notify_all()
            return rid

    def wait(self, rid: int,
             timeout: Optional[float] = None) -> Optional[GenerationResult]:
        """Block until request `rid` finishes; None on timeout."""
        import time
        deadline = None if timeout is None else time.monotonic() + timeout
        with self._cv:
            while self.server.result(rid) is None:
                rem = (None if deadline is None
                       else deadline - time.monotonic())
                if rem is not None and rem <= 0:
                    return None
                self._cv.wait(timeout=0.5 if rem is None else min(rem, 0.5))
            return self.server.result(rid)

    def stream(self, rid: int):
        """Yield request `rid`'s generated token ids as they become
        host-visible (per decode-chunk sync — tokens arrive in bursts of
        up to steps_per_sync). Ends when the request finishes or is
        cancelled; the HTTP /stream endpoint and any incremental
        consumer sit on this."""
        sent = 0
        while True:
            with self._cv:
                toks = self.server.tokens_so_far(rid)
                done = self.server.result(rid) is not None
                if len(toks) == sent and not done:
                    self._cv.wait(timeout=0.5)
                    continue
            for t in toks[sent:]:
                yield int(t)
            sent = len(toks)
            if done:
                return

    def cancel(self, rid: int) -> bool:
        with self._cv:
            ok = self.server.cancel(rid)
            self._cv.notify_all()
            return ok

    def close(self):
        with self._cv:
            self._stop = True
            self._cv.notify_all()
        self._thread.join(timeout=5)


def serve_requests(model, tokenizer, prompts: Sequence[str],
                   num_tokens: int = 32, temperature: float = 0.0,
                   max_slots: int = 4, max_len: Optional[int] = None,
                   top_k: int = 0, top_p: float = 1.0,
                   steps_per_sync: int = 8, prefill_batch: int = 0,
                   seed: int = 0) -> List[GenerationResult]:
    """One-shot convenience: run a ragged prompt list through a
    continuous-batching server and return results in submission order."""
    if max_len is None:
        max_len = max(len(p) for p in prompts) + num_tokens + 1
    server = GenerationServer(model, tokenizer, max_slots=max_slots,
                              max_len=max_len, top_k=top_k, top_p=top_p,
                              steps_per_sync=steps_per_sync,
                              prefill_batch=prefill_batch, seed=seed)
    rids = [server.submit(prompt=p, num_tokens=num_tokens,
                          temperature=temperature) for p in prompts]
    results = server.run()
    return [results[r] for r in rids]
