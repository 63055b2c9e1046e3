"""Greedy n-gram speculative decoding (prompt-lookup / self-speculation).

B=1 greedy decode is HBM-bound: every emitted token reads the full
weight set once (~61 tok/s ceiling at 7B bf16 on v5e; BASELINE.md). This
module trades that for one *parallel* verify pass per accepted run: a
cheap host-side n-gram index proposes the `gamma` tokens that followed
the last earlier occurrence of the current suffix, and one resumed
prefill over [last_token, p_1..p_gamma] scores them all in a single
weight read. Greedy acceptance is exact — the emitted stream is
token-for-token identical to ordinary greedy decoding (tests enforce
this on adversarial and repetitive inputs alike); only the number of
device passes changes.

Genomic sequences are the friendly case: generated phage genomes and
tandem-repeat regions are highly self-similar, so acceptance runs are
long exactly where generation is longest. On non-repetitive sequence
acceptance drops to ~0 and each token costs a verify pass plus a
1-token commit — slower than the fused scan. Strictly opt-in
(`scripts/generate.py --speculative`).

Cache discipline (the part that makes it exact): Hyena's modal state is
a running recurrence with no rollback, so the verify pass runs on a
non-donated cache; full acceptance keeps the verified cache, partial
acceptance replays only the accepted prefix from the saved cache (at
most `gamma` distinct compiled commit shapes). The reference has no
speculative path (per-token torch loop, `evo/generation.py:131-189`).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


class NGramIndex:
    """Longest-match last-occurrence index over the emitted stream.

    Proposals continue the latest earlier occurrence of the LONGEST
    matching suffix, trying gram lengths n, n-1, ... n_min (n_min == n
    recovers single-length behavior). Longest-match matters on a
    4-letter alphabet: there are only 4^k distinct k-mers, so a trailing
    3-mer recurs every ~32 nt of random DNA and the most recent match is
    almost never the self-similar region the proposal should copy from —
    measured 2026-08-20 on a LoRA-learned 512-nt tandem array: n=3
    acceptance 0.04 (chance-level) with teacher-forced accuracy 0.995;
    the n=12..4 longest-match index on the same weights accepts the
    periodic continuation. O(n - n_min) amortized update per token,
    O(n - n_min) proposal. The n-gram DICTS are bounded by the sliding
    `window` (see __init__); the raw token list still grows with the
    emitted stream (one int per token — the index stores absolute match
    positions into it, so it cannot be truncated without remapping
    them): ~tens of MB, not GBs, at megabase scale.
    """

    def __init__(self, n: int = 12, n_min: Optional[int] = None,
                 window: int = 32768):
        self.n = n
        self.n_min = n if n_min is None else n_min
        assert 1 <= self.n_min <= self.n
        self.tokens: List[int] = []
        self._index: Dict[int, Dict[int, int]] = {
            k: {} for k in range(self.n_min, self.n + 1)}
        self._indexed_upto = 0      # grams ending strictly before this
        # memory bound for the >650k-token generation regime: without
        # eviction the (n - n_min + 1) dicts gain one entry per emitted
        # token each — multiple GB of host RAM at megabase scale. The
        # index is rebuilt over the trailing `window` positions whenever
        # the indexed span exceeds 2*window (bulk clear: O(1)/token
        # amortized, <=2*window entries per dict at any time). Forgetting
        # matches farther back than `window` only affects DRAFT quality
        # on repeats that distant (verify keeps the output exact);
        # 32k tokens spans a typical full phage genome.
        self.window = max(int(window), 4 * self.n)
        self._index_base = 0        # oldest position with indexed grams

    @staticmethod
    def _key(toks: List[int], end: int, k: int) -> int:
        """Pack the k-gram ending at `end` (inclusive) into one int
        (10 bits/token — ids >=1024 alias, which at worst yields a bad
        draft that verify rejects). ~2x less dict memory than tuple keys
        and a single hash."""
        key = 0
        for i in range(end - k + 1, end + 1):
            key = (key << 10) | (toks[i] & 0x3FF)
        return key

    def extend(self, toks) -> None:
        self.tokens.extend(int(t) for t in toks)

    def _catch_up(self) -> None:
        """Index every gram ending at position < len-1 (the trailing gram
        is the QUERY; indexing it would always match itself)."""
        end = len(self.tokens) - 1
        toks = self.tokens
        if end - self._index_base > 2 * self.window:
            for idx in self._index.values():
                idx.clear()
            self._index_base = self._indexed_upto = end - self.window
        for k, idx in self._index.items():
            start = max(self._indexed_upto, self._index_base + k - 1, k - 1)
            for i in range(start, end):
                idx[self._key(toks, i, k)] = i
        self._indexed_upto = max(self._indexed_upto, end)

    def propose(self, gamma: int) -> np.ndarray:
        """gamma proposed continuations of the current stream."""
        toks = self.tokens
        if len(toks) >= self.n_min:
            self._catch_up()
            for k in range(min(self.n, len(toks)), self.n_min - 1, -1):
                j = self._index[k].get(self._key(toks, len(toks) - 1, k))
                if j is None:
                    continue
                cont = toks[j + 1:j + 1 + gamma]
                if len(cont) < gamma:      # near the end: cycle the match
                    cont = (cont + toks[j + 1:])[:gamma]
                if len(cont) == gamma:
                    return np.asarray(cont, np.int32)
        # no match: repeat the last token (free to be wrong — one
        # mispredicted run costs the same as no speculation)
        last = toks[-1] if toks else 0
        return np.full((gamma,), last, np.int32)


def filtered_probs(logits_row: np.ndarray, temperature: float,
                   top_k: int, top_p: float) -> np.ndarray:
    """The sampling target distribution for one (V,) logits row —
    identical semantics to ops/sampling.py (temperature scale, top-k,
    nucleus with the top token always kept), computed host-side."""
    z = logits_row.astype(np.float64) / max(temperature, 1e-6)
    if 0 < top_k < z.size:
        kth = np.partition(z, -top_k)[-top_k]
        z = np.where(z < kth, -np.inf, z)
    if top_p < 1.0:
        order = np.argsort(z)[::-1]
        zs = z[order]
        ps = np.exp(zs - zs.max())
        ps = ps / ps.sum()
        cum = np.cumsum(ps)
        keep = (cum - ps) < top_p
        keep[0] = True
        kth = zs[keep][-1]
        z = np.where(z < kth, -np.inf, z)
    z = z - z.max()
    p = np.exp(z)
    return p / p.sum()


def accept_or_resample(rng: np.random.Generator, p: np.ndarray,
                       proposal: int):
    """Point-draft speculative sampling step: accept `proposal` with
    probability p[proposal]; on rejection draw from the residual
    (p with the proposal zeroed, renormalized). The emitted token is
    exactly p-distributed:
        P(j) = p[x][j==x] + (1 - p[x]) * p[j] * [j!=x] / (1 - p[x]).
    Returns (accepted, token)."""
    px = float(p[proposal])
    if rng.random() < px:
        return True, int(proposal)
    residual = p.copy()
    residual[proposal] = 0.0
    total = residual.sum()
    if total <= 0.0:          # p was a point mass at the proposal
        return True, int(proposal)
    return False, int(rng.choice(p.size, p=residual / total))


@dataclasses.dataclass
class SpecStats:
    cycles: int = 0
    proposed: int = 0
    accepted: int = 0
    device_calls: int = 0

    @property
    def acceptance_rate(self) -> float:
        return self.accepted / max(self.proposed, 1)

    @property
    def tokens_per_call(self) -> float:
        return (self.accepted + self.cycles) / max(self.device_calls, 1)


def generate_speculative(
    model,
    tokenizer=None,
    prompt: Optional[str] = None,
    input_ids=None,
    num_tokens: int = 100,
    gamma: int = 8,
    ngram: int = 12,
    ngram_min: int = 4,
    max_len: Optional[int] = None,
    temperature: float = 0.0,
    top_k: int = 0,
    top_p: float = 1.0,
    seed: int = 0,
) -> Tuple[np.ndarray, List[float], SpecStats]:
    """Generation with n-gram speculation (module docstring).

    temperature <= 0: greedy — token-exact vs ordinary greedy decoding.
    temperature > 0: EXACT speculative sampling with a point-mass draft
    (Leviathan-style rejection): proposal x is accepted with probability
    p(x) under the temperature/top-k/top-p-filtered target distribution;
    on rejection the correction is drawn from the residual (p with x
    removed, renormalized), so every emitted token is distributed
    exactly as ordinary autoregressive sampling
    (tests/test_speculative.py verifies the marginals statistically and
    the acceptance math against brute force).

    Returns (token_ids (num_tokens,) int32, per-token logprobs under the
    UNFILTERED distribution, SpecStats).
    """
    if input_ids is None:
        if prompt is None or tokenizer is None:
            raise ValueError('pass input_ids= or prompt= with a tokenizer')
        input_ids = tokenizer.tokenize(prompt)
    ids = np.asarray(input_ids, np.int32).reshape(1, -1)
    P = ids.shape[1]
    if P == 0:
        raise ValueError('empty prompt')
    if num_tokens < 1:
        raise ValueError('num_tokens must be >= 1')
    if gamma < 1:
        raise ValueError('gamma must be >= 1')
    T = max_len or (P + num_tokens + gamma + 2)

    stats = SpecStats()
    spec = NGramIndex(ngram, n_min=min(ngram, ngram_min))
    spec.extend(ids[0])
    greedy_mode = temperature <= 0.0
    rng = np.random.default_rng(seed)

    def choose(lg_row: np.ndarray) -> int:
        """Sample/argmax the target distribution of one logits row."""
        if greedy_mode:
            return int(lg_row.argmax())
        p = filtered_probs(lg_row, temperature, top_k, top_p)
        return int(rng.choice(p.size, p=p))

    cache = model.initialize_inference_params(1, T)
    logits, cache = model(jnp.asarray(ids), inference_params_dict=cache,
                          donate_cache=True, resume=False)
    stats.device_calls += 1
    row0 = np.asarray(logits[0, -1].astype(jnp.float32))
    t_last = choose(row0)
    m = row0.max()
    out: List[int] = [t_last]
    logps: List[float] = [float(row0[t_last] - m
                                - np.log(np.sum(np.exp(row0 - m))))]
    spec.extend([t_last])

    while len(out) < num_tokens:
        props = spec.propose(gamma)
        x = jnp.asarray(np.concatenate([[t_last], props])[None])  # (1, g+1)
        # verify pass on a NON-donated cache: partial acceptance rolls
        # back by replaying the accepted prefix from this saved cache
        logits, cache_try = model(x, inference_params_dict=cache,
                                  donate_cache=False, resume=True)
        stats.device_calls += 1
        stats.cycles += 1
        stats.proposed += gamma
        lg = np.asarray(logits[0].astype(jnp.float32))   # (g+1, V)
        if greedy_mode:
            greedy = lg.argmax(axis=-1).astype(np.int32)
            a = 0
            while a < gamma and props[a] == greedy[a]:
                a += 1
            correction = int(greedy[a])
        else:
            a = 0
            correction = None
            while a < gamma:
                p = filtered_probs(lg[a], temperature, top_k, top_p)
                ok, tok = accept_or_resample(rng, p, int(props[a]))
                if not ok:
                    correction = tok
                    break
                a += 1
            if correction is None:            # all gamma accepted: bonus
                correction = choose(lg[gamma])
        stats.accepted += a
        # emitted this cycle: the accepted run + the correction/bonus
        # token; logprobs under the UNFILTERED distribution of row i
        emitted = list(int(t) for t in props[:a]) + [correction]
        for i, tok in enumerate(emitted):
            m = lg[i].max()
            logps.append(float(lg[i][tok] - m
                               - np.log(np.sum(np.exp(lg[i] - m)))))
        out.extend(emitted)
        spec.extend(emitted)
        t_last = correction
        if a == gamma:
            cache = cache_try           # fully consistent — keep it
        else:
            # replay only the accepted prefix of the verify inputs
            # ([old last token, accepted proposals] — a+1 <= gamma
            # inputs, so at most gamma distinct compiled commit shapes);
            # donate: the saved cache is ours and replaced here
            del cache_try
            _, cache = model(x[:, :a + 1], inference_params_dict=cache,
                             donate_cache=True, resume=True)
            stats.device_calls += 1
    return (np.asarray(out[:num_tokens], np.int32), logps[:num_tokens],
            stats)
