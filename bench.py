"""Benchmark CLI: prints ONE JSON line with the headline metric.

Headline (BASELINE.md): prefill tokens/sec/chip on the flagship 7B
StripedHyena (evo-1-8k-base schema), batch 1 x 8192, bf16, random weights.
`vs_baseline` is measured tokens/s divided by the driver target of 50% of the
hardware matmul roofline at this model's FLOPs/token (the reference publishes
no throughput numbers - BASELINE.md).

Usage: python bench.py [--preset all|prefill8k|prefill131k|full131k|decode|
                         generate|serving|speculative|scaling|tiny] [--verify]
On non-TPU backends a scaled-down model with the same schema is used so the
benchmark always produces a line.
"""

from __future__ import annotations

import argparse
import functools
import json
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

# bf16 matmul peak per chip, by TPU generation (approx, public numbers).
# device_kind strings look like 'TPU v5 lite', 'TPU v5p', 'TPU v4'.
_PEAK_FLOPS = {
    'v6e': 918e12, 'v6 lite': 918e12,
    'v5p': 459e12,
    'v5e': 197e12, 'v5 lite': 197e12, 'v5litepod': 197e12,
    'v4': 275e12, 'v3': 123e12, 'v2': 46e12,
}
_DEFAULT_PEAK = 459e12  # v5p


def _chip_peak_flops() -> float:
    try:
        kind = jax.devices()[0].device_kind.lower()
    except Exception:
        return _DEFAULT_PEAK
    for key, val in _PEAK_FLOPS.items():
        if key in kind:
            return val
    return _DEFAULT_PEAK


def _model_flops_per_token(cfg) -> float:
    """Matmul FLOPs per token (forward): 2 * matmul params. Long-conv FFT and
    attention score FLOPs are excluded (sub-10% at L=8k and not MXU-bound)."""
    D, I = cfg.hidden_size, cfg.inner_mlp_size_actual
    per_hyena = 2 * (3 * D * D + D * D)          # in-proj + out-proj
    per_attn = 2 * (3 * D * D + D * D)
    per_mlp = 2 * (2 * D * I + I * D)
    n_attn = len(cfg.attn_layer_idxs)
    n_hyena = cfg.num_layers - n_attn
    embed = 2 * D * cfg.padded_vocab_size        # unembed matmul
    return (n_hyena * per_hyena + n_attn * per_attn
            + cfg.num_layers * per_mlp + embed)


def _init_params(cfg):
    params = jax.jit(functools.partial(
        __import__('evo_tpu.model', fromlist=['model']).init_params,
        cfg=cfg))(jax.random.PRNGKey(0))
    jax.block_until_ready(params)
    return params


def bench_prefill(cfg, batch: int, length: int, iters: int = 3,
                  quant: str = 'none', params=None):
    """params: pass a pre-built (possibly pre-quantized) tree to share one
    set of device weights across sections — every 12.9 GB init/free cycle
    stresses the tunneled backend's allocator (preset 'all' reuses)."""
    from evo_tpu import model as model_lib

    if params is None:
        params = _init_params(cfg)
        if quant == 'int8':
            from evo_tpu.quant import quantize_params
            params = quantize_params(params, free_source=True)
    if quant == 'int8':
        # int8 x int8 serving mode: quantized weights AND dynamic
        # per-token activation quantization (evo_tpu/quant.py:qdot)
        cfg = cfg.replace(weight_quant='int8', act_quant='int8')
    elif quant != 'none':
        # do NOT silently fall through to bf16 under an int4 flag: int4
        # is a decode/memory mode (use --preset generate), and a wrong
        # label here would record a bf16 number as a quantized one
        raise ValueError(f'prefill presets support --quant int8 only, '
                         f'got {quant!r}')
    ids = jnp.asarray(
        np.random.default_rng(0).integers(0, 256, (batch, length)),
        jnp.int32)
    # Reduce on device, fetch the scalar: a host readback is the only
    # reliable sync point (on the tunneled 'axon' backend
    # block_until_ready returns before remote execution finishes).
    fwd = jax.jit(lambda p, ids: jnp.sum(
        model_lib.forward(p, cfg, ids), dtype=jnp.float32))
    float(fwd(params, ids))          # compile + warmup
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        float(fwd(params, ids))
        times.append(time.perf_counter() - t0)
    dt = min(times)
    return batch * length / dt


def bench_decode(cfg, batch: int, prompt_len: int, steps: int = 64,
                 params=None):
    from evo_tpu import model as model_lib

    if params is None:
        params = _init_params(cfg)
    ids = jnp.asarray(
        np.random.default_rng(0).integers(0, 256, (batch, prompt_len)),
        jnp.int32)
    cache = model_lib.init_cache(cfg, batch, prompt_len + steps + 1)
    prefill = jax.jit(functools.partial(model_lib.prefill, cfg=cfg))
    logits, cache = prefill(params, ids=ids, cache=cache)
    decode = jax.jit(functools.partial(model_lib.decode_step, cfg=cfg),
                     donate_argnames=('cache',))
    tok = jnp.argmax(logits[:, -1], axis=-1).astype(jnp.int32)
    # compile
    logits_t, cache = decode(params, token=tok, cache=cache)
    float(jnp.sum(logits_t))         # host readback = real sync (axon)
    t0 = time.perf_counter()
    for _ in range(steps):
        tok = jnp.argmax(logits_t, axis=-1).astype(jnp.int32)
        logits_t, cache = decode(params, token=tok, cache=cache)
    float(jnp.sum(logits_t))
    dt = time.perf_counter() - t0
    return batch * steps / dt


def bench_generate(cfg, batch: int, prompt_len: int = 128,
                   n_tokens: int = 256, quant: str = 'none', params=None):
    """Fused-scan generation (the production decode path): one XLA program
    for prefill + decode + sampling; returns decode tokens/s. A passed
    `params` tree is used as-is (pre-quantize it for quant rows)."""
    from evo_tpu import model as model_lib
    from evo_tpu.generation import _generate_program

    if params is None:
        params = _init_params(cfg)
        if quant in ('int8', 'int4'):
            from evo_tpu.quant import quantize_params
            params = quantize_params(params, free_source=True, mode=quant)
    prompt = jnp.asarray(
        np.random.default_rng(0).integers(0, 256, (batch, prompt_len)),
        jnp.int32)
    forced = prompt[:, :0]
    rng = jax.random.PRNGKey(0)

    def run():
        cache = model_lib.init_cache(cfg, batch, prompt_len + n_tokens + 1)
        gen, _, _ = _generate_program(
            params, prompt, forced, cache, rng, cfg=cfg,
            num_tokens=n_tokens, num_forced=0, top_k=4, top_p=1.0,
            temperature=1.0)
        return float(jnp.sum(gen))      # host readback = sync

    run()                               # compile + warmup
    times = []
    for _ in range(2):
        t0 = time.perf_counter()
        run()
        times.append(time.perf_counter() - t0)
    return batch * n_tokens / min(times)


def bench_serving(cfg, slots: int = 48, n_requests: int = 144,
                  prompt_len: int = 128, n_tokens: int = 256,
                  steps_per_sync: int = 32, quant: str = 'none',
                  params=None, unique_prompts=None,
                  prefill_batch: int = 0, iters: int = 2):
    """Continuous-batching server throughput (evo_tpu/serving.py):
    aggregate generated tokens/s over a stream of staggered requests with
    ragged output budgets sharing one `slots`-row decode cache. The
    reference's serving pattern for mixed traffic is sequential B=1
    (`evo/generation.py:238-253`), so its ceiling is the B=1 decode
    roofline — report vs that so the row reads as the speedup the
    scheduler buys."""
    from evo_tpu.models import EvoModel
    from evo_tpu.serving import GenerationServer

    if params is None:
        params = _init_params(cfg)
        if quant in ('int8', 'int4'):
            from evo_tpu.quant import quantize_params
            params = quantize_params(params, free_source=True, mode=quant)
    model = EvoModel(cfg, params)
    rng = np.random.default_rng(0)
    prompts = [rng.integers(0, 256, prompt_len).astype(np.int32)
               for _ in range(n_requests)]
    if unique_prompts:
        # repeated-prompt workload (the sampling pipelines' pattern):
        # consecutive repeats hit the server's prefix cache
        prompts = [prompts[(i * unique_prompts) // n_requests]
                   for i in range(n_requests)]
    # ragged budgets (n_tokens/2 .. 3*n_tokens/2) force mid-stream slot
    # turnover; uniform prompt length keeps this a one-compile benchmark
    budgets = [int(n_tokens // 2 + rng.integers(0, n_tokens + 1))
               for _ in range(n_requests)]

    def run():
        server = GenerationServer(model, max_slots=slots,
                                  max_len=prompt_len + 2 * n_tokens + 8,
                                  steps_per_sync=steps_per_sync,
                                  prefill_batch=prefill_batch)
        for ids, n in zip(prompts, budgets):
            server.submit(input_ids=ids, num_tokens=n, temperature=0.0)
        results = server.run()
        assert len(results) == n_requests
        return sum(len(r.token_ids) for r in results.values())

    run()                                   # compile + warmup
    times, toks = [], 0
    for _ in range(iters):
        t0 = time.perf_counter()
        toks = run()
        times.append(time.perf_counter() - t0)
    return toks / min(times)


def bench_serving_latency(cfg, slots: int = 48, n_requests: int = 96,
                          prompt_len: int = 128, n_tokens: int = 256,
                          rate_rps: float = None, steps_per_sync: int = 8,
                          params=None):
    """Open-loop serving latency: requests arrive on a seeded Poisson
    clock at `rate_rps` (default ~80% of the measured 48-slot capacity)
    and each request's time-to-first-token and per-output-token latency
    are measured on the host clock at step()-sync granularity. This is
    the serving metric pair raw throughput hides: a scheduler can look
    fast while individual requests crawl. The reference's serving
    pattern (sequential B=1, `evo/generation.py:238-253`) would give a
    queueing TTFT of (position in queue) x (full generation time) under
    the same traffic.

    Returns (aggregate tokens/s, stats dict with ttft/tpot percentiles).
    """
    from evo_tpu.models import EvoModel
    from evo_tpu.serving import GenerationServer

    if params is None:
        params = _init_params(cfg)
    model = EvoModel(cfg, params)
    rng = np.random.default_rng(0)
    prompts = [rng.integers(0, 256, prompt_len).astype(np.int32)
               for _ in range(n_requests)]
    budgets = [int(n_tokens // 2 + rng.integers(0, n_tokens + 1))
               for _ in range(n_requests)]
    if rate_rps is None:
        # ~80% of the measured 48-slot aggregate capacity (BASELINE.md
        # 2026-08-19 sweep: ~815 tok/s) over the mean request budget —
        # loaded but stable, the regime latency numbers mean something in
        rate_rps = 0.8 * 815.0 / float(np.mean(budgets))
    gaps = rng.exponential(1.0 / rate_rps, n_requests)
    arrivals = np.cumsum(gaps)

    def run():
        server = GenerationServer(model, max_slots=slots,
                                  max_len=prompt_len + 2 * n_tokens + 8,
                                  steps_per_sync=steps_per_sync)
        rids, submit_t, first_t, done_t = [], {}, {}, {}
        t0 = time.perf_counter()
        nxt = 0
        while len(done_t) < n_requests:
            now = time.perf_counter() - t0
            while nxt < n_requests and arrivals[nxt] <= now:
                rid = server.submit(input_ids=prompts[nxt],
                                    num_tokens=budgets[nxt],
                                    temperature=0.0)
                rids.append(rid)
                submit_t[rid] = time.perf_counter() - t0
                nxt += 1
            if server.pending == 0:
                # idle: sleep to the next arrival instead of spinning
                time.sleep(min(max(arrivals[nxt] - now, 0.0), 0.05)
                           if nxt < n_requests else 0.0)
                continue
            server.step()
            now = time.perf_counter() - t0
            for rid in rids:
                if rid not in first_t and server.progress(rid) > 0:
                    first_t[rid] = now
                if rid not in done_t and server.result(rid) is not None:
                    done_t[rid] = now
        total = time.perf_counter() - t0
        toks = sum(len(server.result(r).token_ids) for r in rids)
        ttft = np.asarray([first_t[r] - submit_t[r] for r in rids])
        tpot = np.asarray([
            (done_t[r] - first_t[r]) / max(1, len(server.result(r).token_ids) - 1)
            for r in rids])
        return toks / total, ttft, tpot

    run()                                    # compile + warmup
    tps, ttft, tpot = run()
    stats = {
        'rate_rps': round(float(rate_rps), 3),
        'ttft_p50_ms': round(float(np.percentile(ttft, 50)) * 1e3, 1),
        'ttft_p95_ms': round(float(np.percentile(ttft, 95)) * 1e3, 1),
        'tpot_p50_ms': round(float(np.percentile(tpot, 50)) * 1e3, 1),
        'tpot_p95_ms': round(float(np.percentile(tpot, 95)) * 1e3, 1),
    }
    return tps, stats


def bench_speculative(cfg, num_tokens: int = 256, gamma: int = 8,
                      quant: str = 'none'):
    """n-gram speculative greedy decode on a repetitive prompt (the
    friendly case: tandem-repeat genomic sequence) — tokens/s plus the
    acceptance telemetry. Exact same tokens as plain greedy decode."""
    from evo_tpu import model as model_lib
    from evo_tpu.models import EvoModel
    from evo_tpu.speculative import generate_speculative
    from evo_tpu.tokenizer import CharLevelTokenizer

    params = jax.jit(functools.partial(model_lib.init_params, cfg=cfg))(
        jax.random.PRNGKey(0))
    if quant in ('int8', 'int4'):
        from evo_tpu.quant import quantize_params
        params = quantize_params(params, free_source=True, mode=quant)
    model = EvoModel(cfg, params)
    tok = CharLevelTokenizer(512)
    prompt = 'ACGTTGCAAC' * 24                  # strongly periodic, 240 nt

    def run():
        toks, _, stats = generate_speculative(
            model, tok, prompt=prompt, num_tokens=num_tokens, gamma=gamma)
        return len(toks), stats

    run()                                        # compile + warmup
    times, stats = [], None
    for _ in range(2):
        t0 = time.perf_counter()
        n, stats = run()
        times.append(time.perf_counter() - t0)
    return n / min(times), stats


def bench_spec_lora(cfg, steps: int = 100, rank: int = 32, lr: float = 1e-3,
                    seq_len: int = 1024, num_tokens: int = 256,
                    gamma: int = 8, unit_len: int = 512,
                    prompt_len: int = 768):
    """Speculative decoding in its intended regime (VERDICT r3 #4): the
    reference's flagship demo is >650k-token generation on self-similar
    genomic sequence (/root/reference/scripts/hello_evo.ipynb intro),
    exactly where n-gram speculation pays. Random weights can't show it
    (r2 honest negative: acceptance 5e-4), and real weights aren't
    available here — so LoRA-finetune the 7B random base ON-CHIP on a
    tandem-repeat array built from a real PhiX174 512-nt unit
    (phage_gen/data/NC_001422_1.fna), then speculative-greedy-decode the
    array's continuation: the n-gram index proposes from the repeat unit
    in the prompt, the tuned model continues the repeat, and acceptance
    measures REAL model/draft agreement on learned weights.

    Workload note (first attempt's honest negative, 2026-08-20): LoRA
    training windows necessarily live at rotary positions 0..seq_len, so
    a full-genome wrap-around prompt (P=5386) decodes at positions the
    adapter never saw — teacher-forced accuracy 0.99 *in-window* but
    free-running decode derails and acceptance lands at 0.05. The
    tandem-repeat design keeps prompt+generation inside the trained
    window (768 + 256 <= 1024) AND mirrors the biology the >650k-token
    claim rides on (repeat arrays / self-similar genomes).

    Returns (spec tokens/s, plain fused-decode tokens/s on the same
    merged weights, SpecStats, teacher-forced next-token accuracy).
    """
    import optax

    from evo_tpu import model as model_lib
    from evo_tpu.io.fasta import read_fasta
    from evo_tpu.lora import (init_lora, init_lora_train_state,
                              make_lora_train_step, merge_lora)
    from evo_tpu.models import EvoModel
    from evo_tpu.speculative import generate_speculative
    from evo_tpu.tokenizer import CharLevelTokenizer

    assert prompt_len + num_tokens <= seq_len, (
        'decode must stay inside the trained rotary window '
        f'({prompt_len}+{num_tokens} > {seq_len})')
    params = _init_params(cfg)
    tok = CharLevelTokenizer(512)
    genome = read_fasta('phage_gen/data/NC_001422_1.fna')[1][0]
    unit = genome[:unit_len]
    reps = (2 * seq_len) // unit_len + 2
    ids_g = np.asarray(tok.tokenize(unit * reps), np.int32)

    # training config: the flash-attention Pallas kernel has no VJP
    # (inference-only by design), so the backward pass uses the lax
    # attention core; remat bounds activation memory at 7B L=1024
    cfg_train = cfg.replace(use_pallas='never', remat=True)
    lora = init_lora(jax.random.PRNGKey(1), params, cfg, rank=rank)
    opt = optax.adam(lr)
    state = init_lora_train_state(lora, opt)
    step = jax.jit(make_lora_train_step(cfg_train, opt, alpha=16.0))
    rng = np.random.default_rng(0)
    t_train = time.perf_counter()
    for i in range(steps):
        # random phase within one repeat period: every window is the
        # same tandem array, so the adapter learns the periodic
        # continuation at EVERY rotary position it will decode at
        s = int(rng.integers(0, unit_len))
        w = jnp.asarray(ids_g[None, s:s + seq_len])
        # next_token_loss shifts internally: ids is BOTH input and
        # target, loss_mask is a {0,1} gate (a previous revision passed
        # the shifted ids as the mask — a token-VALUE-weighted NLL)
        state, loss = step(state, params, w, jnp.ones_like(w, jnp.float32))
        # host readback EVERY step: the scalar round trip is noise next
        # to the ~0.66 s jitted train step. (An earlier EAGER revision of
        # this loop took ~6.5 s/step and leaked host memory per DISPATCH
        # in the axon tunnel client — jitting collapsed ~10^3
        # dispatches/step to 1, fixing both; BASELINE.md 2026-08-20.)
        # steps=100 is kept for TIME budget, not memory: it is past the
        # loss plateau (~step 50) at ~1 min of bench wall-clock
        loss = float(loss)
        if i % 25 == 0 or i == steps - 1:
            print(f'  [spec_lora] step {i} loss {loss:.4f} '
                  f'({time.perf_counter() - t_train:.0f}s)',
                  file=sys.stderr, flush=True)
    # donate: base + merged 7B trees cannot coexist on 16 GB
    merged = merge_lora(params, state.lora, alpha=16.0, donate=True)
    del params, state
    model = EvoModel(cfg, merged)

    # teacher-forced next-token accuracy, in-window (the trained length)
    probe = jnp.asarray(ids_g[None, :seq_len])
    logits = jax.jit(lambda p, i: model_lib.forward(p, cfg, i))(
        merged, probe)
    pred = np.asarray(jnp.argmax(logits[0, :-1], -1))
    acc = float((pred == np.asarray(probe[0, 1:])).mean())

    # plain fused-decode baseline on the SAME merged weights (greedy);
    # rate is prompt-content-independent (fixed work per token)
    plain_tps = bench_generate(cfg, 1, prompt_len=128,
                               n_tokens=num_tokens, params=merged)

    # prompt = 1.5 repeat units: the unit appears in full (n-gram index
    # covers the continuation) and prompt+generation stay in-window
    prompt_ids = ids_g[:prompt_len]

    def spec_run():
        t0 = time.perf_counter()
        toks, _, stats = generate_speculative(
            model, input_ids=prompt_ids, num_tokens=num_tokens,
            gamma=gamma)
        return num_tokens / (time.perf_counter() - t0), stats

    spec_run()                                   # compile + warmup
    best, stats = 0.0, None
    for _ in range(2):
        tps, stats = spec_run()
        best = max(best, tps)
    return best, plain_tps, stats, acc


def _ngram_oracle_acceptance(ids: np.ndarray, start: int, gamma: int,
                             n: int = 12, n_min: int = 4):
    """Drafter-oracle acceptance: if the model were PERFECT (emitting
    exactly `ids[start:]`), what would the longest-match n-gram drafter's
    acceptance be? A pure data property of the sequence — the upper
    bound speculation can reach on this workload with real weights, and
    a direct quantification of the reference's self-similar-genome claim
    (hello_evo.ipynb cell 0). Mirrors generate_speculative's greedy
    accept loop host-side (no device work)."""
    from evo_tpu.speculative import NGramIndex

    idx = NGramIndex(n, n_min=n_min)
    idx.extend(ids[:start])
    pos, proposed, accepted, cycles = start, 0, 0, 0
    while pos < len(ids):
        props = idx.propose(gamma)
        true = ids[pos:pos + gamma]
        a = 0
        while a < len(true) and int(props[a]) == int(true[a]):
            a += 1
        accepted += a
        proposed += len(true)
        cycles += 1
        consumed = min(a + 1, len(true))   # accepted run + correction
        idx.extend(ids[pos:pos + consumed])
        pos += consumed
    return (accepted / max(proposed, 1),
            (accepted + cycles) / max(cycles, 1))


def bench_spec_phage(cfg, gammas=(4, 8, 16), steps: int = 120,
                     rank: int = 32, lr: float = 1e-3,
                     seq_len: int = 1024, prompt_len: int = 768,
                     num_tokens: int = 256):
    """Speculative acceptance on REALISTIC genomes (VERDICT r4 #4): the
    spec_lora harness's friendly extreme (tandem repeats, acceptance
    1.00) and the random-weights negative (5e-4) bracket the mode; this
    measures the realistic middle. LoRA-finetune the 7B base on 15 of
    the 16 viable generated phage genomes
    (phage_gen/data/viable_generated_phage_genomes.fasta — the
    reference's own artifact class), then speculative-greedy-decode a
    continuation of the HELD-OUT genome's 768-nt prefix across gamma,
    reporting measured acceptance / tokens-per-device-call / speedup vs
    plain fused decode on the same merged weights, plus two model-free
    drafter-oracle acceptances: prompt-only context (matches the
    measured runs) and full-sibling-genome context (the deployment
    pattern where a whole reference genome precedes generation).

    Window discipline (the r4 rotary-OOD lesson): training windows,
    prompt, and generation all stay inside seq_len rotary positions.
    """
    import optax

    from evo_tpu import model as model_lib
    from evo_tpu.io.fasta import read_fasta
    from evo_tpu.lora import (init_lora, init_lora_train_state,
                              make_lora_train_step, merge_lora)
    from evo_tpu.models import EvoModel
    from evo_tpu.speculative import generate_speculative
    from evo_tpu.tokenizer import CharLevelTokenizer

    assert prompt_len + num_tokens <= seq_len
    tok = CharLevelTokenizer(512)
    _, seqs = read_fasta(
        'phage_gen/data/viable_generated_phage_genomes.fasta')
    held_out = seqs[-1]
    stream = np.concatenate(
        [np.asarray(tok.tokenize(s), np.int32) for s in seqs[:-1]])
    genome_ids = np.asarray(tok.tokenize(held_out), np.int32)
    sibling_ids = np.asarray(tok.tokenize(seqs[0]), np.int32)

    # model-free oracles first (they need no weights). 'hybrid' is the
    # genome-primed deployment pattern squeezed into the trained rotary
    # window: sibling[0:prompt_len-256] + held-out[0:256] as the prompt,
    # so the drafter can copy from the ~97%-identical sibling while
    # decode stays at in-window positions (the r4 rotary-OOD lesson)
    hybrid_ctx = np.concatenate([sibling_ids[:prompt_len - 256],
                                 genome_ids[:256]])
    oracles = {}
    for gamma in gammas:
        acc_p, _tpc = _ngram_oracle_acceptance(genome_ids, prompt_len,
                                               gamma)
        primed = np.concatenate([sibling_ids,
                                 genome_ids[:prompt_len]])
        acc_g, _ = _ngram_oracle_acceptance(
            np.concatenate([primed, genome_ids[prompt_len:]]),
            len(primed), gamma)
        acc_h, _ = _ngram_oracle_acceptance(
            np.concatenate([hybrid_ctx,
                            genome_ids[256:256 + num_tokens]]),
            len(hybrid_ctx), gamma)
        oracles[gamma] = {'prompt_only': round(acc_p, 4),
                          'hybrid_in_window': round(acc_h, 4),
                          'genome_primed': round(acc_g, 4)}

    params = _init_params(cfg)
    cfg_train = cfg.replace(use_pallas='never', remat=True)
    lora = init_lora(jax.random.PRNGKey(1), params, cfg, rank=rank)
    opt = optax.adam(lr)
    state = init_lora_train_state(lora, opt)
    step = jax.jit(make_lora_train_step(cfg_train, opt, alpha=16.0))
    rng = np.random.default_rng(0)
    t_train = time.perf_counter()
    for i in range(steps):
        s = int(rng.integers(0, len(stream) - seq_len))
        w = jnp.asarray(stream[None, s:s + seq_len])
        state, loss = step(state, params, w,
                           jnp.ones_like(w, jnp.float32))
        loss = float(loss)                 # sync bounds dispatch queue
        if i % 25 == 0 or i == steps - 1:
            print(f'  [spec_phage] step {i} loss {loss:.4f} '
                  f'({time.perf_counter() - t_train:.0f}s)',
                  file=sys.stderr, flush=True)
    merged = merge_lora(params, state.lora, alpha=16.0, donate=True)
    del params, state
    model = EvoModel(cfg, merged)

    # teacher-forced next-token accuracy on the held-out prefix
    probe = jnp.asarray(genome_ids[None, :seq_len])
    logits = jax.jit(lambda p, i: model_lib.forward(p, cfg, i))(
        merged, probe)
    pred = np.asarray(jnp.argmax(logits[0, :-1], -1))
    acc_tf = float((pred == np.asarray(probe[0, 1:])).mean())

    # NB measurement asymmetry (deliberately conservative): the plain
    # baseline uses a 128-token prompt while the spec legs' timed region
    # includes their longer 768/1024-token prompt prefills, so the
    # reported speedup_vs_plain is UNDERstated by a few percent and the
    # prefix-vs-hybrid comparison carries their prompt-length delta;
    # acceptance/tokens_per_device_call (the numbers the ledger leans
    # on) are unaffected
    plain_tps = bench_generate(cfg, 1, prompt_len=128,
                               n_tokens=num_tokens, params=merged)

    results = {}
    for gamma in gammas:
        row = {}
        for label, prompt_ids in (('prefix', genome_ids[:prompt_len]),
                                  ('hybrid', hybrid_ctx)):
            def spec_run(_g=gamma, _p=prompt_ids):
                t0 = time.perf_counter()
                _, _, stats = generate_speculative(
                    model, input_ids=_p, num_tokens=num_tokens,
                    gamma=_g)
                return num_tokens / (time.perf_counter() - t0), stats
            spec_run()                      # compile + warmup
            best, stats = 0.0, None
            for _ in range(2):
                tps, stats = spec_run()
                best = max(best, tps)
            row[label] = {
                'tps': round(best, 2),
                'speedup_vs_plain': round(best / max(plain_tps, 1e-9), 4),
                'acceptance': round(stats.acceptance_rate, 4),
                'tokens_per_device_call': round(stats.tokens_per_call, 4),
            }
        row['oracle_acceptance'] = oracles[gamma]
        results[f'gamma{gamma}'] = row
        print(f'  [spec_phage] gamma{gamma}: {row}',
              file=sys.stderr, flush=True)
    return plain_tps, acc_tf, results


def bench_scaling(cfg, batch: int, length: int):
    """Scaling-efficiency sweep (SURVEY.md §7 Phase 4): prefill tokens/s at
    every tp that divides the visible device count, dp=1. Returns
    {tp: tokens/s}. Efficiency = tps[tp] / (tp * tps[1])."""
    from evo_tpu import model as model_lib
    from evo_tpu.parallel.mesh import make_mesh
    from evo_tpu.parallel.sharding import shard_params

    n = jax.device_count()
    results = {}
    feasible = [t for t in (1, 2, 4, 8, 16, 32)
                if t <= n and n % t == 0
                and cfg.num_attention_heads % t == 0
                and cfg.hidden_size % t == 0]
    for tp in feasible:
        mesh = make_mesh(dp=1, tp=tp, devices=jax.devices()[:tp])
        params = jax.jit(functools.partial(model_lib.init_params, cfg=cfg))(
            jax.random.PRNGKey(0))
        params = shard_params(params, cfg, mesh)
        ids = jnp.asarray(
            np.random.default_rng(0).integers(0, 256, (batch, length)),
            jnp.int32)
        fwd = jax.jit(lambda p, i: jnp.sum(
            model_lib.forward(p, cfg, i), dtype=jnp.float32))
        float(fwd(params, ids))          # compile + warmup
        times = []
        for _ in range(3):
            t0 = time.perf_counter()
            float(fwd(params, ids))
            times.append(time.perf_counter() - t0)
        results[tp] = batch * length / min(times)
        del params
    return results


def _decode_cache_bytes_per_step(cfg, batch: int, cache_len: int) -> int:
    """Per-decode-step cache/state HBM traffic in bytes, by dtype
    (VERDICT r4 #6). Derived from the init_cache layout
    (evo_tpu/model.py:179-224): K/V buffers are READ in full at the
    allocated cache length every step (static shapes — XLA streams the
    whole buffer; the 1-position write is negligible), int8-KV adds the
    f32 scale buffers, and the Hyena FIR tail + modal IIR state are
    read AND written every step."""
    n_attn = len(cfg.attn_layer_idxs)
    n_hyena = cfg.num_layers - n_attn
    H, Dh, D = cfg.num_attention_heads, cfg.head_dim, cfg.hidden_size
    S, K = cfg.state_size, cfg.short_filter_length
    cd_size = 2 if cfg.compute_dtype in ('bfloat16', 'float16') else 4
    if getattr(cfg, 'kv_quant', 'none') == 'int8':
        kv = n_attn * batch * H * cache_len * (2 * Dh * 1 + 2 * 4)
    else:
        kv = n_attn * batch * cache_len * 2 * H * Dh * cd_size
    fir = 2 * n_hyena * batch * 3 * D * (K - 1) * cd_size
    iir = 2 * n_hyena * batch * D * S * 2 * 4          # f32 poles state
    return kv + fir + iir


def _decode_roofline(cfg, batch: int, cache_len: int = None) -> float:
    """Aggregate tokens/s at 100% HBM bandwidth — the decode target.

    Weights are read once per decode step, amortized over the batch.
    With `cache_len` the per-step KV/FIR/IIR cache traffic at that
    allocated length joins the denominator (it is B-proportional, so
    batched rows read against an achievable bound rather than the
    weights-only one; VERDICT r4 #6). Without it: the legacy pure-weights
    ceiling (kept as `roofline_weights_only` in the rows)."""
    from evo_tpu import model as model_lib
    param_bytes = sum(
        x.size * x.dtype.itemsize for x in jax.tree_util.tree_leaves(
            jax.eval_shape(lambda k: model_lib.init_params(k, cfg),
                           jax.random.PRNGKey(0))))
    hbm_gbps = {'v5 lite': 819e9, 'v5e': 819e9, 'v5p': 2765e9,
                'v4': 1228e9, 'v6': 1638e9}
    try:
        kind = jax.devices()[0].device_kind.lower()
    except Exception:
        kind = ''
    bw = next((v for key, v in hbm_gbps.items() if key in kind), 819e9)
    step_bytes = param_bytes
    if cache_len is not None:
        step_bytes += _decode_cache_bytes_per_step(cfg, batch, cache_len)
    return batch * bw / step_bytes


def kernel_verify() -> dict:
    """On-chip Pallas-kernel checks across the production
    block/length/dtype grid (VERDICT r1 next-step #4): the regression
    guard the round-1 flash-attention causal-skip bug showed is needed.

    KERNELS run compiled on the TPU; ORACLES run jitted on the LOCAL CPU
    backend. On the tunneled backend every eager oracle op costs ~100 ms
    of dispatch latency and every jitted oracle a remote compile — the
    r4 trial measured the TPU-oracle form at 370-504 s, eating the whole
    driver budget. The CPU oracle is also numerically STRONGER (exact
    f32 multiplies vs the MXU's bf16-truncated f32); tolerances are
    sized for bf16-grade differences, orders of magnitude below the
    block-skip/mask bug class this guards against."""
    import numpy as np

    from evo_tpu.layers.attention import sdpa_causal
    from evo_tpu.layers.norms import rmsnorm
    from evo_tpu.ops import fftconv
    from evo_tpu.ops.pallas_attention import flash_attention_causal
    from evo_tpu.ops.pallas_fir import fir_gate_pallas, fir_gate_supported
    from evo_tpu.ops.pallas_rmsnorm import rmsnorm_pallas

    cpu = jax.devices('cpu')[0]
    tpu_dev = jax.devices()[0]

    def dev(*xs):
        """Commit oracle-side (CPU) arrays to the TPU for a kernel call."""
        out = tuple(jax.device_put(x, tpu_dev) for x in xs)
        return out if len(out) > 1 else out[0]

    checks = []
    t_last = [time.perf_counter()]

    def record(name, got, want, tol):
        got = np.asarray(got, np.float32)
        want = np.asarray(want, np.float32)
        # relative to the oracle's magnitude (floored at 1): the same
        # quantity the tolerance gates on, so the reported max_err reads
        # on the tol scale instead of looking absolute-alarming
        scale = max(1.0, float(np.max(np.abs(want))))
        err = float(np.max(np.abs(got - want))) / scale
        now = time.perf_counter()
        checks.append({'name': name, 'err': err, 'ok': bool(err <= tol),
                       't_s': round(now - t_last[0], 1)})
        t_last[0] = now
        import os as _os
        if _os.environ.get('BENCH_VERIFY_VERBOSE'):
            print(f'  [verify] {checks[-1]}', file=sys.stderr, flush=True)

    # oracles (and input generation) on the LOCAL CPU backend;
    # restored in finally so a failed check cannot leak a CPU
    # default device into the rest of the bench
    jax.config.update('jax_default_device', cpu)
    try:
        key = jax.random.PRNGKey(0)

        def _np_attn_oracle(q, kb, vb, off, ks_=None, vs_=None):
            """Numpy buffer-attention oracle (exact f32, no XLA involved —
            the jitted CPU form cost 3-6 min of XLA:CPU compile PER SHAPE on
            the 4-core bench host). ks_/vs_: int8 scales -> dequantize."""
            q32 = np.asarray(q, np.float32)
            k32 = np.asarray(kb, np.float32)
            v32 = np.asarray(vb, np.float32)
            if ks_ is not None:
                k32 = k32 * np.asarray(ks_, np.float32)[..., None]
                v32 = v32 * np.asarray(vs_, np.float32)[..., None]
            Dh_ = q32.shape[-1]
            Lq_, T_ = q32.shape[1], k32.shape[1]
            s = np.einsum('blhd,bthd->bhlt', q32, k32,
                      optimize=True) / np.sqrt(Dh_)
            mask = np.arange(T_)[None, :] <= off + np.arange(Lq_)[:, None]
            s = np.where(mask[None, None], s, -np.inf)
            s -= s.max(axis=-1, keepdims=True)
            p_ = np.exp(s)
            p_ /= p_.sum(axis=-1, keepdims=True)
            return np.einsum('bhlt,bthd->blhd', p_, v32, optimize=True)

        # flash attention: production blocks (512, 1024), the block_q > block_k
        # shape class that carried the round-1 bug, non-block-multiple lengths,
        # both dtypes
        H, Dh = 4, 128
        for L, bq, bk in [(2048, 512, 1024), (8192, 512, 1024),
                          (2048, 2048, 512), (1000, 512, 1024),
                          (2048, 256, 256)]:
            # f32 tolerance is bf16-grade on purpose: TPU MXU matmuls truncate
            # f32 inputs to bf16 multiplies (DEFAULT precision) in both the
            # kernel and the oracle, and they round differently (~1e-2). The
            # bug class this guards against (block skips, mask errors) shows
            # up orders of magnitude above this.
            for dt, tol in [(jnp.bfloat16, 3e-2), (jnp.float32, 3e-2)]:
                ks = jax.random.split(jax.random.fold_in(key, L + bq), 3)
                q = jax.random.normal(ks[0], (1, L, H, Dh), jnp.float32)
                k = jax.random.normal(ks[1], (1, L, H, Dh), jnp.float32)
                v = jax.random.normal(ks[2], (1, L, H, Dh), jnp.float32)
                q, k, v = (x.astype(dt) for x in (q, k, v))
                got = jax.jit(functools.partial(
                    flash_attention_causal, block_q=bq, block_k=bk))(
                    *dev(q, k, v))
                if L > 4096:
                    # long-L oracle on the LAST 512 query rows only (vs
                    # all keys, buffer-mask semantics): the guarded bug
                    # classes (skipped blocks, mask errors) hit late rows
                    # hardest, and the full numpy oracle at L=8192 costs
                    # ~100 s of the driver budget for the same coverage
                    want = _np_attn_oracle(q[:, -512:], k, v, L - 512)
                    got = np.asarray(got)[:, -512:]
                else:
                    want = _np_attn_oracle(q, k, v, 0)
                record(f'flash_attn L={L} blocks=({bq},{bk}) {dt.__name__}',
                       got, want, tol)
        # segment-vs-buffer flash (resumed prefill / 131k path): traced
        # offset, unaligned offsets, garbage buffer tail behind the mask
        from evo_tpu.ops.pallas_attention import flash_attention_buffer
        for Lq, T, off in [(2048, 8192, 4096), (512, 8192, 7003),
                           (2048, 8192, 0)]:
            ks = jax.random.split(jax.random.fold_in(key, T + off), 3)
            q = jax.random.normal(ks[0], (1, Lq, H, Dh), jnp.bfloat16)
            kb = jax.random.normal(ks[1], (1, T, H, Dh), jnp.bfloat16)
            vb = jax.random.normal(ks[2], (1, T, H, Dh), jnp.bfloat16)
            got = jax.jit(flash_attention_buffer)(*dev(q, kb, vb),
                                                  dev(jnp.int32(off)))
            record(f'flash_buffer Lq={Lq} T={T} off={off}', got,
                   _np_attn_oracle(q, kb, vb, off), 3e-2)
        # int8-KV buffer kernel (kv_quant mode): oracle is the dense softmax
        # over the DEQUANTIZED buffers — isolates kernel plumbing from the
        # int8 rounding that is the mode's own (tested-elsewhere) numerics
        from evo_tpu.layers.attention import kv_quantize
        for Lq, T, off in [(1024, 8192, 4096), (512, 8192, 7003)]:
            ks = jax.random.split(jax.random.fold_in(key, 7 * T + off), 3)
            q = jax.random.normal(ks[0], (1, Lq, H, Dh), jnp.bfloat16)
            kb = jax.random.normal(ks[1], (1, T, H, Dh), jnp.bfloat16)
            vb = jax.random.normal(ks[2], (1, T, H, Dh), jnp.bfloat16)
            kq, kss = kv_quantize(kb)
            vq, vss = kv_quantize(vb)
            got = jax.jit(flash_attention_buffer)(
                    *dev(q, jnp.swapaxes(kq, 1, 2), jnp.swapaxes(vq, 1, 2),
                         jnp.int32(off), jnp.swapaxes(kss, 1, 2),
                         jnp.swapaxes(vss, 1, 2)))

            record(f'flash_buffer_q8 Lq={Lq} T={T} off={off}', got,
                   _np_attn_oracle(q, kq, vq, off, kss, vss), 3e-2)
        # fused FIR+gate: production shape class (3 streams, 4096 channels)
        for C, L, dt, tol in [(4096, 8192, jnp.bfloat16, 3e-2),
                              (512, 1024, jnp.float32, 2e-3)]:
            ks = jax.random.split(jax.random.fold_in(key, C), 3)
            z = jax.random.normal(ks[0], (1, 3, C, L), jnp.float32).astype(dt)
            w = (jax.random.normal(ks[1], (3, C, 3), jnp.float32) / 2).astype(dt)
            b = (jax.random.normal(ks[2], (3, C), jnp.float32) / 8).astype(dt)
            if not fir_gate_supported(z.shape, z.dtype):
                checks.append({'name': f'fir_gate C={C}', 'err': -1.0,
                               'ok': False})
                continue
            x2, u = jax.jit(fir_gate_pallas)(*dev(z, w, b))
            z_ref, _ = jax.jit(lambda z, w, b: fftconv.fir_causal_conv(
                z, w, b, None))(z, w, b)
            record(f'fir_gate x2 C={C} L={L} {dt.__name__}', x2, z_ref[:, 0],
                   tol)
            record(f'fir_gate u C={C} L={L} {dt.__name__}', u,
                   z_ref[:, 1] * z_ref[:, 2], tol)
        # fused Hyena mixer core (FIR + gates + Toeplitz conv + modal carry):
        # production shape (4096 channels, multi-tile L, chunk 64) plus a
        # float32 segment-continuation case
        from evo_tpu.ops.pallas_hyena import (hyena_mixer_pallas,
                                              hyena_mixer_supported)

        @functools.partial(jax.jit, static_argnums=(6,))
        def _mixer_oracle(z, fw, fb, poles, residues, d_skip, chunk, st=None):
            zp, fir_state = fftconv.fir_causal_conv(z, fw, fb,
                                                    st[0] if st is not None
                                                    else None)
            x2, x1, v = zp[:, 0], zp[:, 1], zp[:, 2]
            y, iir = fftconv.conv_matmul_chunked(
                x1 * v, poles, residues, chunk,
                state=st[1] if st is not None else None, d_skip=d_skip)
            return x2 * y.astype(z.dtype), iir, fir_state

        for C, L, chunk, dt, tol in [(4096, 8192, 64, jnp.bfloat16, 3e-2),
                                     (512, 4096, 64, jnp.float32, 1e-2)]:
            ks = jax.random.split(jax.random.fold_in(key, C + L), 5)
            z = jax.random.normal(ks[0], (1, 3, C, L), jnp.float32).astype(dt)
            fw = jax.random.normal(ks[1], (3, C, 3), jnp.float32) / 2
            fb = jax.random.normal(ks[2], (3, C), jnp.float32) / 8
            mag = jax.random.uniform(ks[3], (C, 8), minval=0.5, maxval=0.98)
            ang = jax.random.uniform(ks[4], (C, 8), minval=-3.1, maxval=3.1)
            poles = jnp.stack([mag * jnp.cos(ang), mag * jnp.sin(ang)], -1)
            residues = (jax.random.normal(ks[3], (C, 8, 2)) * 0.3)
            d_skip = jax.random.normal(ks[4], (C,))
            if not hyena_mixer_supported(z.shape, chunk):
                checks.append({'name': f'hyena_mixer C={C}', 'err': -1.0,
                               'ok': False})
                continue
            got_y, got_iir, got_fir = jax.jit(functools.partial(
                    hyena_mixer_pallas, chunk=chunk))(
                    *dev(z, fw, fb, poles, residues, d_skip))
            want_y, want_iir, want_fir = _mixer_oracle(z, fw, fb, poles,
                                                       residues, d_skip, chunk)
            record(f'hyena_mixer y C={C} L={L} {dt.__name__}', got_y, want_y,
                   tol)
            record(f'hyena_mixer iir C={C} L={L} {dt.__name__}', got_iir,
                   want_iir, tol)
            record(f'hyena_mixer fir C={C} L={L} {dt.__name__}', got_fir,
                   want_fir, 1e-6)
            # segment continuation seeded with the first run's states
            got2 = jax.jit(functools.partial(
                    hyena_mixer_pallas, chunk=chunk))(
                    *dev(z, fw, fb, poles, residues, d_skip),
                    state=(got_fir, got_iir))
            want2 = _mixer_oracle(z, fw, fb, poles, residues, d_skip, chunk,
                                  st=(want_fir, want_iir))
            record(f'hyena_mixer cont C={C} {dt.__name__}', got2[0], want2[0],
                   tol)
        # packed-int4 weight matmul (serving memory-fit mode): both the
        # VPU-unpack default and the MXU-unpack dots modes, decode shapes
        from evo_tpu.ops.pallas_int4 import int4_matmul, pack_int4
        for M, Kp, N in [(1, 4096, 12288), (8, 11008, 4096)]:
            ks = jax.random.split(jax.random.fold_in(key, Kp + N), 3)
            x4 = jax.random.normal(ks[0], (M, Kp), jnp.bfloat16)
            qv = jax.random.randint(ks[1], (Kp, N), -8, 8, jnp.int8)
            pk = pack_int4(qv)
            sc = jax.random.uniform(ks[2], (Kp // 128, N), jnp.float32,
                                    minval=0.01, maxval=0.1)
            want = jax.jit(lambda x4, qv, sc: x4.astype(jnp.float32) @ (
                qv.astype(jnp.float32).reshape(Kp // 128, 128, N)
                * sc[:, None]).reshape(Kp, N))(x4, qv, sc)
            for mode in ('unroll', 'dots', 'dots8'):
                got = jax.jit(functools.partial(
                        int4_matmul, mode=mode))(*dev(x4, pk, sc))
                # dots8 adds per-row int8 activation quantization (~0.4%)
                record(f'int4_matmul {mode} M={M} K={Kp}', got, want,
                       2e-2 if mode == 'dots8' else 1e-2)
        # fused RMSNorm
        for shape, dt, tol in [((2, 2048, 4096), jnp.bfloat16, 3e-2),
                               ((1, 512, 512), jnp.float32, 2e-3)]:
            x = jax.random.normal(jax.random.fold_in(key, shape[-1]),
                                  shape, jnp.float32).astype(dt)
            w = jnp.ones((shape[-1],), dt)
            record(f'rmsnorm {shape} {dt.__name__}',
                       jax.jit(rmsnorm_pallas)(*dev(x, w)),
                       jax.jit(rmsnorm)(x, w), tol)

    finally:
        jax.config.update('jax_default_device', None)
    n_fail = sum(1 for c in checks if not c['ok'])
    return {
        'status': 'pass' if n_fail == 0 else
                  'fail: ' + '; '.join(c['name'] for c in checks
                                       if not c['ok']),
        'checks': len(checks),
        'max_err': max(c['err'] for c in checks),
        'detail': checks,
    }


def _run_all(args) -> None:
    """Preset 'all': the full driver-relevant metric set, driver-proof
    (VERDICT r3 next-step #1). A cumulative JSON line is printed (flushed)
    after the headline and after EVERY completed section, so an external
    kill at any point still leaves the driver's tail-parse with every
    number measured so far — BENCH_r03 was rc=124/parsed=null because the
    old all-or-nothing single print lost the whole run. A SIGTERM/SIGINT
    handler additionally dumps the partial line on the way out. Sections
    are skipped (and marked) once the wall-clock budget is spent; compile
    caching makes warm reruns cover everything."""
    import os
    import signal

    from evo_tpu.models import config_for_model

    t_start = time.time()
    deadline = t_start + args.budget_s
    cfg8 = config_for_model('evo-1-8k-base')
    extras: dict = {}
    target8 = 0.5 * _chip_peak_flops() / _model_flops_per_token(cfg8)
    state = {'tps8': None, 'final': False}

    def emit(final: bool = False) -> None:
        """Print the cumulative result line (flushed). Non-final lines are
        marked partial; the driver tail-parses, so the last line printed
        before any kill is what gets recorded."""
        tps8 = state['tps8']
        row = {
            'metric': 'prefill_tokens_per_sec_per_chip_evo-1-8k-base-7b',
            'value': round(tps8, 2) if tps8 is not None else None,
            'unit': 'tokens/s',
            'vs_baseline': (round(tps8 / target8, 4)
                            if tps8 is not None else None),
            'extras': dict(extras),
            'bench_seconds': round(time.time() - t_start, 1),
        }
        if not final:
            row['partial'] = True
        print(json.dumps(row), flush=True)

    def _on_term(signum, frame):                       # noqa: ARG001
        if not state['final']:
            extras['_terminated'] = f'signal {signum}'
            emit(final=True)
        child = _CHILD.get('proc')
        if child is not None and child.poll() is None:
            child.terminate()
        os._exit(1)

    signal.signal(signal.SIGTERM, _on_term)
    signal.signal(signal.SIGINT, _on_term)

    def left() -> float:
        return deadline - time.time()

    def section(key: str, fn, retries: int = 1):
        """Budget-gate + fault-isolate one measurement: a transient
        backend failure (the tunneled chip intermittently returns
        RESOURCE_EXHAUSTED / hangs — observed for hours on 2026-08-17
        and again 2026-08-18) marks the row instead of killing the whole
        bench, so the driver still gets every other number."""
        import gc
        if left() <= 0:
            extras[key] = 'skipped (budget)'
            return
        t_sec = time.time()
        for attempt in range(retries + 1):
            gc.collect()
            try:
                extras[key] = fn()
                if isinstance(extras[key], dict):
                    extras[key]['t_s'] = round(time.time() - t_sec, 1)
                emit()
                return
            except Exception as e:                    # noqa: BLE001
                err = f'error: {type(e).__name__}: {str(e)[:120]}'
                if attempt < retries and left() > 0:
                    time.sleep(10)
        extras[key] = err
        emit()

    # ONE shared bf16 7B tree for every cfg8 section: each 12.9 GB
    # init/free cycle stresses the tunneled backend's allocator (the
    # RESOURCE_EXHAUSTED episodes hit after many such cycles even with
    # zero live arrays), so the whole bench now allocates 7B weights
    # three times (bf16, int8-by-donation, int4) instead of ~9.
    shared = {'params': None}

    def params8():
        if shared['params'] is None:
            shared['params'] = _init_params(cfg8)
        return shared['params']

    # headline: 7B prefill B=1 L=8192 (always measured, with retry);
    # printed IMMEDIATELY so the driver always has at least this number
    tps8 = None
    for attempt in range(3):
        try:
            tps8 = bench_prefill(cfg8, 1, 8192, params=params8())
            break
        except Exception as e:                        # noqa: BLE001
            extras['headline_error'] = (f'{type(e).__name__}: '
                                        f'{str(e)[:120]}')
            shared['params'] = None
            time.sleep(15)
    state['tps8'] = tps8
    emit()

    # kernel verification first among the extras: it is the regression
    # guard (a wrong kernel invalidates every other number)
    def _kv():
        kv = kernel_verify()
        return (f"{kv['status']} ({kv['checks']} checks, "
                f"max_err(rel) {kv['max_err']:.2e})")
    section('kernel_verify', _kv)

    def latency_row():
        tps, stats = bench_serving_latency(cfg8, params=params8())
        return {'value': round(tps, 2),
                'unit': 'generated tokens/s aggregate (open-loop)',
                'vs_baseline': round(tps / _decode_roofline(cfg8, 1), 4),
                **stats}
    # early among the extras (VERDICT r3 #8): TTFT/TPOT percentiles are
    # the serving metric pair that matters; under the old ordering the
    # 600s gate meant this row never reached a driver-budget run
    section('serving_latency_poisson', latency_row)

    def decode_row(batch, quant, params):
        # vs_baseline is always relative to the bf16 HBM roofline —
        # corrected to include the per-step cache/state traffic at the
        # row's allocated cache length (VERDICT r4 #6) — so the int8 row
        # reads directly as the speedup it buys over the bf16 ceiling
        # (evo_tpu/quant.py). roofline_weights_only keeps the legacy
        # pure-weights reading for cross-round continuity.
        T = 128 + 256 + 1                  # bench_generate cache length
        tps = bench_generate(cfg8, batch, quant=quant, params=params)
        return {'value': round(tps, 2), 'unit': 'tokens/s aggregate',
                'vs_baseline': round(
                    tps / _decode_roofline(cfg8, batch, cache_len=T), 4),
                'roofline_weights_only': round(
                    tps / _decode_roofline(cfg8, batch), 4),
                'cache_state_bytes_per_step': _decode_cache_bytes_per_step(
                    cfg8, batch, T)}

    def scoring_row():
        tps = bench_scoring(cfg8, params=params8())
        return {'value': round(tps, 2), 'unit': 'tokens/s',
                'vs_baseline': round(tps / target8, 4)}
    section('scoring_pipeline', scoring_row)

    def serving_row():
        # continuous-batching server over staggered ragged requests;
        # vs_baseline = speedup over the reference's serving pattern for
        # mixed traffic (sequential B=1 at its HBM roofline). 48 slots:
        # the 2026-08-19 sweep measured 427/561/640/703/815/875 tok/s at
        # 16/24/32/40/48/64 slots — weight reads keep amortizing — and 48
        # keeps ~2 GB more headroom than 64 (96 OOMs). Slot memory at
        # these context lengths is per-position KV x max_len x slots.
        # prefill_batch=8: ladder-grouped batched admission (measured
        # +6% over B=1 admission on this row, 2026-08-19 A/B)
        tps = bench_serving(cfg8, params=params8(), prefill_batch=8)
        return {'value': round(tps, 2),
                'unit': 'generated tokens/s aggregate',
                'vs_baseline': round(tps / _decode_roofline(cfg8, 1), 4)}
    section('serving_continuous_batching', serving_row)

    for batch in (1, 8):
        section(f'decode_fused_b{batch}',
                functools.partial(decode_row, batch, 'none',
                                  params8()))

    # quantized rows: int8 tree derived from the shared bf16 tree BY
    # DONATION (free_source) and reused across both int8 rows
    def _to_int8():
        from evo_tpu.quant import quantize_params
        q = quantize_params(params8(), free_source=True)
        shared['params'] = None          # bf16 tree is gone
        return q

    if left() <= 0:
        extras['prefill_8k_int8'] = 'skipped (budget)'
        extras['decode_fused_b1_int8'] = 'skipped (budget)'
        emit()
    else:
        try:
            params_i8 = _to_int8()
        except Exception as e:                        # noqa: BLE001
            params_i8 = None
            extras['int8_quantize'] = (f'error: {type(e).__name__}: '
                                       f'{str(e)[:120]}')
        if params_i8 is not None:
            section('prefill_8k_int8', lambda: {
                'value': round(bench_prefill(cfg8, 1, 8192, quant='int8',
                                             params=params_i8), 2),
                'unit': 'tokens/s'})
            section('decode_fused_b1_int8',
                    functools.partial(decode_row, 1, 'int8', params_i8))
            del params_i8

    # The remaining rows each need a FRESH 7B weight init (131k-config
    # bf16 tree, int4 packed tree, int8 Evo instance). Run each in an
    # isolated subprocess: the tunneled backend's allocator degrades
    # after many 12.9 GB init/free cycles in one process (round-2 driver
    # run: RESOURCE_EXHAUSTED on exactly the two rows that ran last,
    # BENCH_r02.json), and a fresh process attaches cleanly even while
    # this one holds its client (verified on axon). A per-row timeout
    # also keeps a wedged backend from eating the whole budget.
    # Rotation keyed on the round number (VERDICT r4 #3): the budget
    # typically reaches ~3 of these isolated rows, so a fixed
    # most-important-first order starves the tail rows forever (the
    # 122880-context int8-KV decode and the 96-slot int8 serving peak
    # were never driver-captured through r04). Odd rounds lead with the
    # historically-skipped levers, even rounds with the flagship 131k
    # capability rows — every row lands in BENCH_r* at least once every
    # two rounds.
    iso_rows = [
        ('full131k', 'score_full_context_L131072_single_chip_int8',
         300, 900),
        ('p131', 'prefill_131k_config_L16384', 90, 480),
        ('int4', 'decode_int4_memory_fit_b1', 90, 480),
        ('ldec_int8', 'decode_at_context_122880_int8w_int8kv',
         300, 900),
        ('serv96', 'serving_int8_96slots', 240, 800),
        ('lgen16', 'long_generation_16k', 200, 800),
    ]
    # last standalone measurements (BASELINE.md) so a budget-skip marker
    # still carries the number the row stands for
    last_measured = {
        'score_full_context_L131072_single_chip_int8':
            '9,654 tok/s/chip (2026-08-20)',
        'prefill_131k_config_L16384': '9,927 tok/s (2026-08-21)',
        'decode_int4_memory_fit_b1': '62.3 tok/s (2026-08-20)',
        'decode_at_context_122880_int8w_int8kv':
            '40.4 tok/s (2026-08-21)',
        'serving_int8_96slots': '1,797 tok/s aggregate (2026-08-21)',
        'long_generation_16k': '60.8 tok/s sustained, 2 regrowths, '
                               'spot-check argmax-agree (2026-08-21); '
                               '65k run: 68.1 tok/s (BASELINE.md)',
    }
    order = ([3, 4, 5, 1, 0, 2] if _round_number() % 2 == 1
             else [0, 1, 2, 3, 4, 5])
    for sect, key, floor_s, cap_s in (iso_rows[i] for i in order):
        if left() < floor_s:
            extras[key] = ('skipped (budget); last standalone: '
                           + last_measured.get(key, 'see BASELINE.md'))
            emit()
            continue
        # cap comes out of the REMAINING budget (r3 used left()+30 which
        # could overrun the envelope by design — VERDICT r3 #1b)
        res = _run_isolated(sect, min(left(), cap_s))
        if isinstance(res, str) and res.startswith('error') \
                and left() > floor_s and 'timeout' not in res:
            res = _run_isolated(sect, min(left(), cap_s))
        extras[key] = res
        emit()

    # fill in vs_baseline for the int8 prefill row (isolated-row children
    # compute their own)
    if isinstance(extras.get('prefill_8k_int8'), dict):
        extras['prefill_8k_int8']['vs_baseline'] = round(
            extras['prefill_8k_int8']['value'] / target8, 4)

    state['final'] = True
    emit(final=True)


def _round_number() -> int:
    """The driver's build-round number, inferred from the BENCH_r{N}.json
    artifacts it leaves in the repo root (this run = max existing + 1);
    BENCH_ROUND env overrides. Used only to key the isolated-row
    rotation, so a wrong guess costs nothing but row ordering."""
    if os.environ.get('BENCH_ROUND'):
        try:
            return int(os.environ['BENCH_ROUND'])
        except ValueError:
            pass
    import glob
    import re as _re
    best = 0
    for p in glob.glob(os.path.join(os.path.dirname(
            os.path.abspath(__file__)), 'BENCH_r*.json')):
        m = _re.search(r'BENCH_r(\d+)\.json$', p)
        if m:
            best = max(best, int(m.group(1)))
    return best + 1


_CHILD: dict = {}


def _run_isolated(section: str, timeout_s: float, env_extra=None):
    """Run one bench section in a fresh python process (clean backend
    allocator state) and return its parsed JSON row, or an error string.
    The child handle is tracked so the parent's SIGTERM handler can
    terminate it (no orphaned 7B inits holding the chip)."""
    import subprocess

    cmd = [sys.executable, __file__, '--section', section]
    env = dict(os.environ)
    if env_extra:
        env.update(env_extra)
    proc = subprocess.Popen(cmd, stdout=subprocess.PIPE,
                            stderr=subprocess.PIPE, text=True, env=env)
    _CHILD['proc'] = proc
    try:
        out, err = proc.communicate(timeout=max(60.0, timeout_s))
    except subprocess.TimeoutExpired:
        proc.kill()
        proc.communicate()
        return f'error: timeout after {int(timeout_s)}s (isolated process)'
    finally:
        _CHILD['proc'] = None
    for line in reversed((out or '').strip().splitlines()):
        try:
            return json.loads(line)
        except ValueError:
            continue
    tail = [ln for ln in (err or '').strip().splitlines() if ln]
    return 'error: ' + (tail[-1][:200] if tail
                        else f'rc={proc.returncode}, no output')


def _run_section(section: str) -> None:
    """Child entry for `_run_all`'s isolated rows: measure one row and
    print it as a single JSON line."""
    from evo_tpu.models import config_for_model

    cfg8 = config_for_model('evo-1-8k-base')
    cfg131 = config_for_model('evo-1-131k-base')
    tgt131 = 0.5 * _chip_peak_flops() / _model_flops_per_token(cfg131)
    if section == 'p131':
        tps = bench_prefill(cfg131, 1, 16384)
        row = {'value': round(tps, 2), 'unit': 'tokens/s',
               'vs_baseline': round(tps / tgt131, 4)}
    elif section == 'int4':
        # MEMORY-FIT mode, not a speed mode (BASELINE.md int4 ledger:
        # the unpack epilogue does not hide under the halved DMA); the
        # row exists to prove the 3.3 GB tree decodes correctly under
        # 16 GB pressure, vs_baseline reads against the bf16 roofline
        tps = bench_generate(cfg8, 1, quant='int4')
        row = {'value': round(tps, 2),
               'unit': 'tokens/s aggregate (memory-fit mode)',
               'vs_baseline': round(tps / _decode_roofline(cfg8, 1), 4)}
    elif section == 'full131k':
        tps = bench_full131k()
        row = {'value': round(tps, 1), 'unit': 'tokens/s/chip',
               'vs_baseline': round(tps / tgt131, 4)}
    elif section == 'lgen16':
        # driver-budget variant: no oracle prefill (consistency is
        # pinned by tests and the 65k BASELINE run's 4 spot-checks) so
        # the row fits the rotation's leftover slot
        tps, info = bench_longgen(total_tokens=16384, chunk=4096,
                                  quant='int8', n_checkpoints=0)
        row = {'value': round(tps, 2),
               'unit': 'tokens/s sustained (greedy B=1 int8, 131k cfg)',
               **info}
    elif section == 'lgen_leg':
        # one leg of the resumable multi-process 65k+ generation
        # (state handed through LGEN_STATE; see bench_longgen docstring)
        sdir = os.environ['LGEN_STATE']
        total = int(os.environ.get('LGEN_TOTAL', '65536'))
        legs = int(os.environ.get('LGEN_CHUNKS', '5'))
        tps, info = bench_longgen(
            total_tokens=total, chunk=4096, quant='int8',
            n_checkpoints=3, growth_align=16384, state_dir=sdir,
            max_chunks_per_call=legs)
        if tps is None:
            row = {'progress': info}
        else:
            row = {'value': round(tps, 2),
                   'unit': 'tokens/s sustained (greedy B=1 int8, '
                           '131k cfg)', **info}
    elif section == 'serv96':
        # int8 weights free ~6.3 GB of HBM, doubling the slot budget past
        # the bf16 memory wall (BASELINE.md 2026-08-19: 1,713 tok/s at 96
        # slots = 27.2x the reference's sequential-B=1 serving ceiling)
        # iters=1: warmup + ONE measured run — the row must fit the
        # driver budget's isolated-row slot next to ldec_int8
        tps = bench_serving(cfg8, slots=96, n_requests=288, quant='int8',
                            prefill_batch=8, iters=1)
        row = {'value': round(tps, 2),
               'unit': 'generated tokens/s aggregate (int8, 96 slots)',
               'vs_baseline': round(tps / _decode_roofline(cfg8, 1), 4)}
    elif section in ('ldec_bf16', 'ldec_int8'):
        kvq = 'int8' if section == 'ldec_int8' else 'none'
        context = 122880
        tps = bench_longdecode(kv_quant=kvq, context=context)
        roof = _longdecode_roofline(cfg131, context, kvq)
        row = {'value': round(tps, 2), 'unit': 'tokens/s (B=1 greedy)',
               'roofline': round(roof, 2),
               'pct_roofline': round(tps / roof, 4)}
    else:
        raise SystemExit(f'unknown section {section!r}')
    print(json.dumps(row))


def bench_scoring(cfg, n_seqs: int = 2, seq_len: int = 8191, params=None):
    """End-to-end scoring-pipeline throughput: tokenize -> prepare_batch ->
    forward -> logprob gather -> host reduction (`score_sequences`,
    SURVEY.md §3.1), tokens/s including host-side work."""
    import numpy as np

    from evo_tpu.models import EvoModel
    from evo_tpu.scoring import score_sequences
    from evo_tpu.tokenizer import CharLevelTokenizer

    if params is None:
        params = _init_params(cfg)
    model = EvoModel(cfg, params)
    tok = CharLevelTokenizer(512)
    rng = np.random.default_rng(0)
    seqs = [''.join(rng.choice(list('ACGT'), seq_len)) for _ in
            range(n_seqs)]
    score_sequences(seqs[:1] * n_seqs, model, tok)     # compile + warmup
    t0 = time.perf_counter()
    score_sequences(seqs, model, tok)
    dt = time.perf_counter() - t0
    return n_seqs * (seq_len + 1) / dt


def bench_full131k(length: int = 131072, segment: int = 8192,
                   iters: int = 1):
    """Full long-context scoring on ONE chip: int8 weights (6.6 GB) +
    bf16 KV (6.4 GB at 131k) + O(segment) activations via
    `score_sequences_segmented`'s donate-cache resumable prefill. The
    reference needs an 80 GB GPU for this workload (bf16 7B weights
    alone are 13.4 GB; `/root/reference/README.md:8` runs 131k on one
    accelerator only because Hyena is near-linear — the attention KV
    still needs the memory). Returns tokens/s over the whole context.
    """
    from evo_tpu.models import Evo
    from evo_tpu.scoring import score_sequences_segmented

    ev = Evo('evo-1-131k-base', random_init=True,
             config_overrides=dict(weight_quant='int8', act_quant='int8'))
    rng = np.random.default_rng(0)
    # L-1 chars + BOS = exactly `length` tokens -> one compiled segment
    # shape (a ragged tail segment would add a 100 s+ compile on axon)
    seq = ''.join(rng.choice(list('ACGT'), length - 1))
    ts = []
    for _ in range(iters + 1):            # first pass = compile + warmup
        t0 = time.perf_counter()
        score_sequences_segmented([seq], ev.model, ev.tokenizer,
                                  segment_len=segment)
        ts.append(time.perf_counter() - t0)
    return length / min(ts[1:] or ts)


def _fresh_prefill_last_logits(model, ids, segment: int = 8192):
    """Last-position logits of `ids` via a fresh segmented resumable
    prefill (O(segment) activations) — the long-generation spot-check
    oracle. The ragged remainder goes in the FIRST chunk so every later
    chunk shares one compiled shape."""
    from evo_tpu.scoring import (_aligned_cache_len, _cache_align,
                                 _segment_bounds)

    L = int(ids.shape[1])
    cache = model.initialize_inference_params(
        ids.shape[0], _aligned_cache_len(L, _cache_align(model.config)))
    bounds = _segment_bounds(L, segment)      # already starts at 0
    logits = None
    for i in range(len(bounds) - 1):
        s, e = bounds[i], bounds[i + 1]
        logits, cache = model(jnp.asarray(ids[:, s:e]),
                              inference_params_dict=cache,
                              donate_cache=True, resume=s > 0)
    del cache
    return np.asarray(logits[:, -1], np.float32)


def bench_longgen(total_tokens: int = 16384, chunk: int = 4096,
                  quant: str = 'int8', n_checkpoints: int = 1,
                  prompt_len: int = 128, growth_align: int = 8192,
                  model_name: str = 'evo-1-131k-base',
                  cfg=None, params=None, state_dir=None,
                  max_chunks_per_call=None):
    """Sustained long generation (VERDICT r4 #2; the reference demos
    >650k generated tokens, hello_evo.ipynb cell 0): greedy chunked
    decode at 7B through the resumable Generator cache, crossing a
    `_grow_cache` regrowth boundary every `growth_align` positions, with
    the decode-path logits spot-checked against a fresh segmented
    prefill over the emitted stream at `n_checkpoints` points (+ the
    final chunk). 131k config: interpolated rotary covers the offsets.

    Returns (sustained_tps, info): sustained = chunk/median(chunk time)
    — steady-state decode; wall_tps includes the per-regrowth XLA
    compiles (bounded at total/growth_align by generation.py's aligned
    regrowth).

    state_dir/max_chunks_per_call: resumable multi-process mode. The
    full generation state (token stream, decode cache, timings, pending
    spot-check rows) checkpoints to state_dir after at most
    max_chunks_per_call chunks and the call returns (None,
    {'resume_at': ...}); a fresh process re-initializes the SAME
    weights (seeded) and continues from the cache. Needed because the
    tunneled worker reliably dies ~15 min into one sustained process
    (4/4 runs at chunk 14-16 of the single-process 65k attempt,
    shape-independent) — and it doubles as the crash-recovery story:
    a killed leg resumes from the last completed checkpoint."""
    from evo_tpu.generation import Generator
    from evo_tpu.models import EvoModel, config_for_model
    from evo_tpu.tokenizer import CharLevelTokenizer

    if cfg is None:
        cfg = config_for_model(model_name)
    provided = params is not None
    if params is None:
        params = _init_params(cfg)
        if quant in ('int8', 'int4'):
            from evo_tpu.quant import quantize_params
            params = quantize_params(params, free_source=True, mode=quant)
    model = EvoModel(cfg, params)
    gen = Generator(model, CharLevelTokenizer(cfg.vocab_size), top_k=1,
                    temperature=0.0)

    rng = np.random.default_rng(0)
    prompt = rng.integers(0, 256, (1, prompt_len)).astype(np.int32)
    # chunk schedule: `chunk`-token scans while the KV buffer stays at or
    # under 65536 positions, 1024-token scans beyond. A 4096-step decode
    # scan at T > 65536 crashes this TPU worker DETERMINISTICALLY
    # (isolated repro 2026-08-21: T=65536 x 4096 steps OK, T=66560 x
    # 4096 worker-crash, the same T at 1024 steps fine 3/3; the int8-KV
    # long-decode path runs 128-step scans and never sees it). The
    # fault is in the BACKEND, not this framework's kernels: the same
    # config crashes identically with use_pallas='never' (pure jnp
    # attention, isolated repro same day)
    sizes = []
    done = 0
    while done < total_tokens:
        fits_64k = prompt_len + done + chunk + 1 <= 65536
        step = chunk if fits_64k else min(1024, chunk)
        step = min(step, total_tokens - done)
        sizes.append(step)
        done += step
    n_chunks = len(sizes)
    cum = np.cumsum(sizes).tolist()
    stride = max(1, n_chunks // max(n_checkpoints, 1))
    check_at = (set(range(stride - 1, n_chunks, stride)) | {n_chunks - 1}
                if n_checkpoints > 0 else set())

    import pickle
    from pathlib import Path

    stream = [prompt[0]]
    cache, nxt = None, jnp.asarray(prompt)
    chunk_times, pending = [], []
    regrowths, prev_klen = 0, None
    start_ci, wall_accum = 0, 0.0
    state_path = (Path(state_dir) / 'longgen_state.pkl'
                  if state_dir else None)
    checks = []
    if state_path is not None and state_path.exists():
        with open(state_path, 'rb') as f:
            st = pickle.load(f)
        assert st['total_tokens'] == total_tokens and st['chunk'] == chunk
        stream, chunk_times = st['stream'], st['chunk_times']
        pending, regrowths = st['pending'], st['regrowths']
        prev_klen, start_ci = st['prev_klen'], st['next_ci']
        wall_accum, checks = st['wall'], st.get('checks', [])
        if st['cache'] is not None:
            cache = jax.tree_util.tree_map(jnp.asarray, st['cache'])
            nxt = jnp.asarray(stream[-1][-1:][None])
        print(f'  [longgen] resumed at chunk {start_ci + 1}/{n_chunks} '
              f'(KV len {prev_klen}, {len(pending)} oracle(s) pending)',
              file=sys.stderr, flush=True)

    def _save_state(next_ci, elapsed, keep_cache=True):
        host_cache = (jax.tree_util.tree_map(np.asarray, cache)
                      if keep_cache else None)
        tmp = state_path.with_suffix('.tmp')
        with open(tmp, 'wb') as f:
            pickle.dump({'total_tokens': total_tokens, 'chunk': chunk,
                         'stream': stream, 'chunk_times': chunk_times,
                         'pending': pending, 'regrowths': regrowths,
                         'prev_klen': prev_klen, 'next_ci': next_ci,
                         'wall': wall_accum + elapsed, 'checks': checks,
                         'cache': host_cache}, f)
        import os as _os
        _os.replace(tmp, state_path)

    from evo_tpu.generation import _grow_cache
    from evo_tpu.scoring import _aligned_cache_len, _cache_align

    # the full run's final cache length. Any growth whose aligned target
    # lands within one growth_align of it jumps straight there instead —
    # a LATE small growth (65536 -> 66560 at the second-to-last chunk)
    # crashed the worker even in a fresh process, while the same target
    # reached from a 49152 cache (smaller transient) is the scale every
    # successful mid-run growth uses
    final_len = _aligned_cache_len(prompt_len + int(cum[-1]),
                                   _cache_align(cfg))
    executed = 0
    t_wall = time.perf_counter()
    for ci in range(start_ci, n_chunks):
        if (max_chunks_per_call is not None
                and executed >= max_chunks_per_call):
            _save_state(ci, time.perf_counter() - t_wall)
            return None, {'resume_at': ci, 'total_chunks': n_chunks}
        t0 = time.perf_counter()
        this_chunk = sizes[ci]
        if cache is not None and prev_klen is not None:
            needed = prompt_len + cum[ci] + 1
            if needed > prev_klen:
                # never allocate beyond the whole run's final length:
                # the natural aligned target for the tail chunks would
                # overshoot (81920 for the 65k run) for nothing
                target = min(_aligned_cache_len(
                    needed - 1, max(_cache_align(cfg), growth_align)),
                    final_len)
                cache = _grow_cache(cache, target, donate=True)
        part, scores, cache = gen.generate(
            input_ids=nxt, num_tokens=this_chunk,
            inference_params_dict=cache,
            cache_growth_align=growth_align, donate_cache=True,
            verbose=False)
        part_np = np.asarray(part)[0]              # sync (host readback)
        chunk_times.append(time.perf_counter() - t0)
        for layer in cache['layers']:
            if isinstance(layer, dict) and 'k' in layer:
                klen = layer['k'].shape[2 if 'ks' in layer else 1]
                if prev_klen is not None and klen != prev_klen:
                    regrowths += 1
                prev_klen = klen
                break
        stream.append(part_np)
        if ci in check_at:
            # record the (V,) decode logits row; the fresh-prefill oracle
            # runs AFTER the loop when the generation cache is dropped —
            # a 61k fresh prefill NEXT TO a 65k live cache + weights
            # crashed the 16 GB worker twice (2026-08-21)
            pending.append((cum[ci], np.asarray(scores[0, -1],
                                                np.float32),
                            sum(len(s) for s in stream)))
        nxt = jnp.asarray(part_np[-1:][None])
        executed += 1
        print(f'  [longgen] chunk {ci + 1}/{n_chunks} '
              f'{this_chunk / chunk_times[-1]:.1f} tok/s '
              f'(KV len {prev_klen})', file=sys.stderr, flush=True)
    wall = wall_accum + ((time.perf_counter() - t_wall) if executed
                         else 0.0)
    wall_accum = wall
    rates = [s / t for s, t in zip(sizes, chunk_times)]
    sustained = float(np.median(rates))

    if cache is not None:
        del cache                               # free KV before oracles
        cache = None
    if executed and state_path is not None and pending:
        # generation finished this leg; each ORACLE (a fresh up-to-65k
        # segmented prefill) gets its own process too — chunks + all
        # oracles in one process exceeded the worker's ~15-min envelope
        _save_state(n_chunks, 0.0, keep_cache=False)
        return None, {'resume_at': n_chunks,
                      'oracles_left': len(pending)}
    ids_all = np.concatenate(stream)[None]
    while pending:
        gen_upto, scores_last, upto = pending.pop(0)
        fresh = _fresh_prefill_last_logits(model, ids_all[:, :upto - 1])[0]
        checks.append({
            'at_generated_tokens': int(gen_upto),
            'max_abs_logit_diff': round(
                float(np.max(np.abs(scores_last - fresh))), 4),
            'logit_scale': round(float(np.max(np.abs(fresh))), 2),
            'argmax_agree': bool(int(scores_last.argmax())
                                 == int(fresh.argmax())),
        })
        print(f'  [longgen] spot-check {checks[-1]}', file=sys.stderr,
              flush=True)
        if state_path is not None and pending:
            _save_state(n_chunks, 0.0, keep_cache=False)
            return None, {'resume_at': n_chunks,
                          'oracles_left': len(pending)}
    if state_path is not None and state_path.exists():
        state_path.unlink()
    info = {
        'total_tokens': int(cum[-1]), 'chunk': chunk,
        'chunk_schedule': f'{sizes.count(chunk)}x{chunk}'
                          + (f'+{len(sizes) - sizes.count(chunk)}x1024'
                             if len(sizes) != sizes.count(chunk) else ''),
        'regrowths': regrowths,
        'quant': 'caller-provided' if provided else quant,
        'wall_tps': round(cum[-1] / wall, 2),
        'spot_checks': checks,
    }
    return sustained, info


def bench_longdecode(kv_quant: str = 'none', context: int = 122880,
                     steps: int = 128, segment: int = 8192):
    """Long-context AR decode on ONE chip: the capability behind the
    reference's flagship ">650k-token generation" demo
    (/root/reference/scripts/hello_evo.ipynb intro; run there on an 80 GB
    A100). Decode at a ~123k-token offset is cache-bandwidth-bound — every
    step reads the attention KV buffers (6.07 GB bf16 at this length) on
    top of the int8 weights (6.6 GB) — so this is the workload the
    `kv_quant: int8` mode exists for (halves the cache reads AND frees
    ~3 GB of HBM). Measures: segmented prefill of `context` tokens into
    the cache, then a fused `lax.scan` of `steps` greedy decode steps;
    returns decode tokens/s (prefill excluded — the full131k row already
    measures prefill rate at this length).
    """
    from evo_tpu import model as model_lib
    from evo_tpu.models import Evo
    from evo_tpu.scoring import _aligned_cache_len

    from evo_tpu.scoring import _cache_align
    ov = dict(weight_quant='int8')
    if kv_quant != 'none':
        ov['kv_quant'] = kv_quant
    ev = Evo('evo-1-131k-base', random_init=True, config_overrides=ov)
    cfg = ev.model.config
    params = ev.model.params
    ids = jnp.asarray(
        np.random.default_rng(0).integers(0, 256, (1, context)), jnp.int32)
    # headroom for warmup + 2 timed legs (decode reads the full static
    # buffer each step, so the timing is offset-independent)
    T = _aligned_cache_len(context + 3 * steps + 1, _cache_align(cfg))

    cache = ev.model.initialize_inference_params(1, T)
    for s in range(0, context, segment):
        _, cache = ev.model(ids[:, s:s + segment],
                            inference_params_dict=cache,
                            donate_cache=True, resume=s > 0)

    @functools.partial(jax.jit, static_argnames=('n',),
                       donate_argnames=('cache',))
    def dec(params, tok, cache, n):
        def body(carry, _):
            t, c = carry
            lg, c = model_lib.decode_step(params, cfg, t, c)
            return (jnp.argmax(lg, axis=-1).astype(jnp.int32), c), ()
        (t, cache), _ = jax.lax.scan(body, (tok, cache), None, length=n)
        return t, cache

    tok = jnp.zeros((1,), jnp.int32)
    tok, cache = dec(params, tok, cache, n=steps)  # compile + warmup
    int(tok[0])                                    # host readback = sync
    times = []
    for _ in range(2):
        t0 = time.perf_counter()
        tok, cache = dec(params, tok, cache, n=steps)
        int(tok[0])
        times.append(time.perf_counter() - t0)
    return steps / min(times)


def _longdecode_roofline(cfg, context: int, kv_quant: str) -> float:
    """tokens/s at 100% HBM bandwidth for long-context decode: int8
    weights + per-step KV-buffer reads at the benched cache length."""
    from evo_tpu.scoring import _aligned_cache_len
    T = _aligned_cache_len(context + 128,
                           4096 if kv_quant == 'int8' else 1024)
    n_attn = len(cfg.attn_layer_idxs)
    H, Dh = cfg.num_attention_heads, cfg.head_dim
    kv_elem = 2 * T * H * Dh * n_attn
    kv_bytes = kv_elem * (1 if kv_quant == 'int8' else 2)
    if kv_quant == 'int8':
        kv_bytes += 2 * T * H * n_attn * 4          # f32 scale buffers
    # Per-leaf post-quantization pricing (ADVICE r3): projection leaves
    # (the names quantize_params targets) cost 1 byte/elem + f32 scales;
    # everything else (embeddings, norms, poles/residues) keeps its real
    # itemsize. Pricing every leaf at 1 byte understated the denominator
    # and inflated pct_roofline.
    from evo_tpu.quant import _QUANT_AXES
    shapes = jax.eval_shape(
        lambda k: __import__('evo_tpu.model',
                             fromlist=['model']).init_params(k, cfg),
        jax.random.PRNGKey(0))

    def leaf_bytes(path, x):
        keys = [getattr(k, 'key', None) for k in path]
        name = keys[-1] if keys else None
        if name in _QUANT_AXES:
            off = 1 if 'stack' in keys else 0    # leading scan axis
            n_scale = x.size
            for ax in _QUANT_AXES[name]:
                n_scale //= x.shape[ax + off]
            return x.size + 4 * n_scale
        return x.size * x.dtype.itemsize

    param_bytes = sum(jax.tree_util.tree_leaves(
        jax.tree_util.tree_map_with_path(leaf_bytes, shapes)))
    hbm = {'v5 lite': 819e9, 'v5e': 819e9, 'v5p': 2765e9,
           'v4': 1228e9, 'v6': 1638e9}
    try:
        kind = jax.devices()[0].device_kind.lower()
    except Exception:
        kind = ''
    bw = next((v for key, v in hbm.items() if key in kind), 819e9)
    return bw / (param_bytes + kv_bytes)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--preset', default='all',
                    choices=['all', 'prefill8k', 'prefill131k', 'decode',
                             'generate', 'tiny', 'scaling', 'full131k',
                             'serving', 'serving_latency', 'speculative',
                             'spec_lora', 'spec_phage', 'longdecode',
                             'longgen'])
    ap.add_argument('--budget-s', type=float, default=1330.0,
                    help="wall-clock budget for preset 'all': sections "
                         'are skipped once exceeded (compile caching makes '
                         'warm reruns fit easily). The driver envelope is '
                         '`timeout 1500`; 1330 reaches the third rotated '
                         'isolated row in a typical run while leaving '
                         '~150 s of margin (last-row caps come out of the '
                         'REMAINING budget, so overruns are bounded). '
                         'Kills are harmless either way (cumulative '
                         'flushed lines + SIGTERM dump)')
    ap.add_argument('--section', default=None,
                    choices=('p131', 'int4', 'full131k', 'ldec_bf16',
                             'ldec_int8', 'serv96', 'lgen16',
                             'lgen_leg'),
                    help="internal: run ONE preset-'all' row in this "
                         'process (used for allocator isolation)')
    ap.add_argument('--verify', action='store_true',
                    help='run ONLY the on-chip Pallas kernel verification '
                         'and exit (also included in preset all)')
    ap.add_argument('--batch', type=int, default=1)
    ap.add_argument('--length', type=int, default=None)
    ap.add_argument('--slots', type=int, default=48,
                    help='serving presets: continuous-batching slot count '
                         '(48 = bf16 HBM sweet spot; int8 weights free '
                         '~6.3 GB -> 96 fits: 1,713 tok/s measured '
                         '2026-08-20)')
    ap.add_argument('--quant', default='none',
                    choices=('none', 'int8', 'int4'),
                    help='weight-only quantization for the generate preset '
                         '(evo_tpu/quant.py serving mode)')
    ap.add_argument('--profile', default=None, metavar='DIR',
                    help='capture a jax.profiler trace of the timed '
                         'region into DIR (view with xprof/tensorboard)')
    args = ap.parse_args()

    # Persistent compile cache: the 29-layer program takes minutes to build
    # through the tunneled backend; cached re-runs skip straight to timing.
    # The dir is keyed by a HOST fingerprint (CPU model+flags+jax version,
    # the tests/conftest.py recipe): XLA:CPU AOT artifacts are tuned to
    # the *detected* CPU model, and loading a sibling machine's artifact
    # SIGILLs / dies with "LLVM compilation error" (observed 2026-08-20 on
    # a stale shared /tmp/jaxcache-bench). kernel_verify's jitted CPU
    # oracles in preset `all` write CPU artifacts even on a TPU host, so
    # gating by backend alone is not enough.
    import hashlib

    def _host_sig() -> str:
        parts = []
        try:
            with open('/proc/cpuinfo') as f:
                for ln in f:
                    if ln.split(':')[0].strip() in (
                            'model name', 'cpu family', 'model', 'stepping'):
                        parts.append(ln.strip())
                    if ln.startswith('flags'):
                        parts.append(' '.join(sorted(ln.split()[2:])))
                        break
        except OSError:
            pass
        import jax.version
        parts.append(jax.version.__version__)
        return hashlib.sha256('|'.join(parts).encode()).hexdigest()[:12]

    jax.config.update('jax_compilation_cache_dir',
                      f'/tmp/jaxcache-bench-{_host_sig()}')
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)

    from evo_tpu.models import config_for_model
    from evo_tpu.config import tiny_config

    on_tpu = jax.default_backend() == 'tpu'

    if args.section:
        if not on_tpu:
            raise SystemExit('--section requires a TPU backend')
        _run_section(args.section)
        return

    if args.verify:
        kv = kernel_verify() if on_tpu else {
            'status': 'skipped (no TPU backend; interpret-mode kernel '
                      'tests live in tests/)', 'checks': 0, 'max_err': 0.0}
        print(json.dumps({'metric': 'kernel_verify',
                          'value': kv['checks'], 'unit': 'checks',
                          'vs_baseline': 1.0 if kv['status'] == 'pass'
                          else 0.0, 'kernel_verify': kv['status'],
                          'max_err': kv['max_err']}))
        sys.exit(0 if kv['status'] == 'pass' or not on_tpu else 1)

    if args.preset == 'all' and on_tpu:
        _run_all(args)
        return
    if args.preset == 'all':
        args.preset = 'tiny'

    if args.preset == 'full131k':
        if not on_tpu:
            print(json.dumps({'metric': 'full131k', 'value': None,
                              'unit': 'tokens/s',
                              'vs_baseline': None,
                              'note': 'requires a TPU (7B single-chip '
                                      'long-context workload)'}))
            return
        from evo_tpu.models import config_for_model
        length = args.length or 131072
        tps = bench_full131k(length=length)
        # vs_baseline: the 50%-roofline prefill target used everywhere
        # else (BASELINE.md); the point of this row is the FIT (one
        # 16 GB chip), the rate carries the buffer-attention overhead
        cfg131 = config_for_model('evo-1-131k-base')
        tgt = 0.5 * _chip_peak_flops() / _model_flops_per_token(cfg131)
        print(json.dumps({
            'metric': f'score_full_context_L{length}_single_chip_int8',
            'value': round(tps, 1), 'unit': 'tokens/s/chip',
            'vs_baseline': round(tps / tgt, 3)}))
        return

    if args.preset == 'longgen':
        if not on_tpu:
            print(json.dumps({'metric': 'long_generation', 'value': None,
                              'unit': 'tokens/s',
                              'note': 'requires a TPU (7B sustained '
                                      'long-generation workload)'}))
            return
        total = args.length or 65536
        # multi-process legs: one sustained process reliably loses the
        # tunneled worker ~15 min in (4/4 runs died at chunk 14-16 of a
        # single-process 65k, independent of KV shape), so the run
        # checkpoints its full state every LGEN_CHUNKS chunks and each
        # leg is a fresh process; a crashed leg retries from the last
        # checkpoint (the failure-recovery story, exercised for real)
        import tempfile
        sdir = tempfile.mkdtemp(prefix='lgen_state_')
        env = {'LGEN_STATE': sdir, 'LGEN_TOTAL': str(total),
               'LGEN_CHUNKS': os.environ.get('LGEN_CHUNKS', '4')}
        n_legs_max = (total // 4096) + 8
        final, errors = None, 0
        for _leg in range(n_legs_max):
            res = _run_isolated('lgen_leg', 1200, env_extra=env)
            if isinstance(res, dict) and 'value' in res:
                final = res
                break
            if isinstance(res, dict):
                print(f"  [longgen] leg done: {res.get('progress')}",
                      file=sys.stderr, flush=True)
                errors = 0
                continue
            errors += 1
            print(f'  [longgen] leg error ({errors}): {res}',
                  file=sys.stderr, flush=True)
            if errors >= 3:
                break
        row = {'metric': f'long_generation_{total}'}
        row.update(final if final is not None
                   else {'value': None, 'error': 'legs failed 3x'})
        if final is not None:
            # success: drop the state dir (the final leg already unlinked
            # the pickle; a FAILED run keeps it so the operator can
            # resume by re-running with LGEN_STATE pointed at it)
            import shutil
            shutil.rmtree(sdir, ignore_errors=True)
        else:
            print(f'  [longgen] state kept for resume: {sdir}',
                  file=sys.stderr, flush=True)
        print(json.dumps(row))
        return

    if args.preset == 'longdecode':
        if not on_tpu:
            print(json.dumps({'metric': 'longdecode', 'value': None,
                              'unit': 'tokens/s',
                              'vs_baseline': None,
                              'note': 'requires a TPU (7B single-chip '
                                      'long-context decode workload)'}))
            return
        # each leg inits a ~13 GB working set; run them in isolated
        # subprocesses like the other fresh-7B-tree rows (allocator
        # degradation on the tunneled backend, docs/performance.md)
        rows = {'kv_bf16': _run_isolated('ldec_bf16', 1200),
                'kv_int8': _run_isolated('ldec_int8', 1200)}
        i8 = rows['kv_int8']
        bf = rows['kv_bf16']
        ok = isinstance(i8, dict) and isinstance(bf, dict)
        print(json.dumps({
            'metric': 'decode_at_context_122880_single_chip_int8w',
            'value': i8['value'] if ok else None,
            'unit': 'tokens/s (B=1 greedy, int8 KV cache)',
            'vs_baseline': (round(i8['value'] / max(bf['value'], 1e-9), 4)
                            if ok else None),
            'extras': rows}))
        return

    if args.preset == 'tiny' or not on_tpu:
        cfg = tiny_config(max_sequence_len=2048)
        batch, length = 2, 512
        name = 'tiny'
    elif args.preset == 'prefill131k':
        cfg = config_for_model('evo-1-131k-base')
        # Full 131k cannot fit one 16 GB chip next to the 12.9 GB weights
        # (the 3 attention layers alone need 6.4 GB of KV at 131072) — it is
        # a TP workload (BASELINE config #4; dryrun_multichip compiles it).
        # Single-chip preset measures the 131k *config* (interpolated
        # rotary, chunked conv) at the longest feasible length.
        batch, length = args.batch, args.length or 16384
        name = 'evo-1-131k-base-7b'
    else:
        cfg = config_for_model('evo-1-8k-base')
        batch, length = args.batch, args.length or 8192
        name = 'evo-1-8k-base-7b'

    import contextlib
    profile_cm = (jax.profiler.trace(args.profile) if args.profile
                  else contextlib.nullcontext())
    with profile_cm:
        if args.preset == 'scaling':
            res = bench_scaling(cfg, batch, length or 512)
            base = res.get(1)
            print(json.dumps({
                'metric': f'prefill_scaling_{name}',
                'value': {str(k): round(v, 2) for k, v in res.items()},
                'unit': 'tokens/s per mesh (dp=1, tp=k)',
                'vs_baseline': {
                    str(k): round(v / (k * base), 4)
                    for k, v in res.items()} if base else {},
            }))
            return
        if args.preset == 'speculative':
            tps, stats = bench_speculative(cfg, quant=args.quant)
            print(json.dumps({
                'metric': f'speculative_decode_tokens_per_sec_{name}' +
                          ('' if args.quant == 'none'
                           else f'_{args.quant}'),
                'value': round(tps, 2),
                'unit': 'tokens/s (B=1 greedy, repetitive prompt)',
                # vs the plain fused-decode B=1 HBM roofline: >1 means
                # speculation beats the per-token weight-read ceiling
                'vs_baseline': round(tps / _decode_roofline(cfg, 1), 4),
                'acceptance_rate': round(stats.acceptance_rate, 4),
                'tokens_per_device_call': round(stats.tokens_per_call, 4),
            }))
            return
        if args.preset == 'spec_lora':
            tps, plain_tps, stats, acc = bench_spec_lora(cfg)
            print(json.dumps({
                'metric': f'speculative_decode_lora_finetuned_{name}',
                'value': round(tps, 2),
                'unit': 'tokens/s (B=1 greedy, tandem-repeat array, '
                        'LoRA-finetuned on a PhiX174 512-nt unit)',
                # vs the plain fused decode measured on the SAME merged
                # weights in this run: the speedup speculation buys
                'vs_baseline': round(tps / max(plain_tps, 1e-9), 4),
                'plain_fused_decode_tps': round(plain_tps, 2),
                'acceptance_rate': round(stats.acceptance_rate, 4),
                'tokens_per_device_call': round(stats.tokens_per_call, 4),
                'teacher_forced_accuracy': round(acc, 4),
            }))
            return
        if args.preset == 'spec_phage':
            plain_tps, acc_tf, rows = bench_spec_phage(cfg)
            best = max((r[leg] for r in rows.values()
                        for leg in ('prefix', 'hybrid')),
                       key=lambda r: r['tps'])
            print(json.dumps({
                'metric': f'speculative_decode_phage_genomes_{name}',
                'value': best['tps'],
                'unit': 'tokens/s (B=1 greedy, held-out viable phage '
                        'genome, LoRA on the other 15)',
                'vs_baseline': best['speedup_vs_plain'],
                'plain_fused_decode_tps': round(plain_tps, 2),
                'teacher_forced_accuracy': round(acc_tf, 4),
                'by_gamma': rows,
            }))
            return
        if args.preset == 'serving_latency':
            tps, stats = bench_serving_latency(cfg)
            print(json.dumps({
                'metric': f'serving_latency_poisson_{name}',
                'value': round(tps, 2),
                'unit': 'generated tokens/s aggregate (open-loop)',
                'vs_baseline': round(tps / _decode_roofline(cfg, 1), 4),
                **stats,
            }))
            return
        if args.preset == 'serving':
            tps = bench_serving(cfg, slots=args.slots,
                                n_requests=3 * args.slots,
                                quant=args.quant, prefill_batch=8)
            base = _decode_roofline(cfg, 1)     # reference pattern: B=1
            print(json.dumps({
                'metric': f'serving_tokens_per_sec_per_chip_{name}' +
                          ('' if args.quant == 'none'
                           else f'_{args.quant}'),
                'value': round(tps, 2),
                'unit': 'generated tokens/s aggregate',
                'vs_baseline': round(tps / base, 4),
            }))
            return
        if args.preset == 'decode':
            tps = bench_decode(cfg, batch, prompt_len=128, steps=64)
            metric = f'decode_tokens_per_sec_per_chip_{name}'
        elif args.preset == 'generate':
            tps = bench_generate(cfg, batch, quant=args.quant)
            metric = f'generate_tokens_per_sec_per_chip_{name}' + \
                ('' if args.quant == 'none' else f'_{args.quant}')
        else:
            tps = bench_prefill(cfg, batch, length, quant=args.quant)
            metric = f'prefill_tokens_per_sec_per_chip_{name}' + \
                ('_int8' if args.quant == 'int8' else '')

    if args.preset in ('decode', 'generate'):
        # B=1-per-sequence decode is HBM-bandwidth bound: the target is
        # reading the full weight set once per token (BASELINE.md), not
        # the matmul roofline (which decode can never approach)
        param_bytes = sum(
            x.size * x.dtype.itemsize for x in jax.tree_util.tree_leaves(
                jax.eval_shape(lambda k: __import__(
                    'evo_tpu.model', fromlist=['model']).init_params(k, cfg),
                    jax.random.PRNGKey(0))))
        hbm_gbps = {'v5 lite': 819e9, 'v5e': 819e9, 'v5p': 2765e9,
                    'v4': 1228e9, 'v6': 1638e9}
        kind = jax.devices()[0].device_kind.lower()
        bw = next((v for key, v in hbm_gbps.items() if key in kind), 819e9)
        target = batch * bw / param_bytes          # tokens/s at 100% BW
    else:
        roofline_tps = _chip_peak_flops() / _model_flops_per_token(cfg)
        target = 0.5 * roofline_tps                 # BASELINE.md target
    print(json.dumps({
        'metric': metric,
        'value': round(tps, 2),
        'unit': 'tokens/s',
        'vs_baseline': round(tps / target, 4),
    }))


if __name__ == '__main__':
    main()
