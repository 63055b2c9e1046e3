"""Benchmark CLI: prints ONE JSON line with the headline metric.

Headline (BASELINE.md): prefill tokens/sec/chip on the flagship 7B
StripedHyena (evo-1-8k-base schema), batch 1 x 8192, bf16, random weights.
`vs_baseline` is measured tokens/s divided by the driver target of 50% of the
hardware matmul roofline at this model's FLOPs/token (the reference publishes
no throughput numbers - BASELINE.md).

Usage: python bench.py [--preset prefill8k|prefill131k|decode|generate|scaling|tiny]
On non-TPU backends a scaled-down model with the same schema is used so the
benchmark always produces a line.
"""

from __future__ import annotations

import argparse
import functools
import json
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


def bench_prefill(cfg, batch: int, length: int, iters: int = 3):
    from evo_tpu import model as model_lib

    params = jax.jit(functools.partial(model_lib.init_params, cfg=cfg))(
        jax.random.PRNGKey(0))
    jax.block_until_ready(params)
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


def bench_decode(cfg, batch: int, prompt_len: int, steps: int = 64):
    from evo_tpu import model as model_lib

    params = jax.jit(functools.partial(model_lib.init_params, cfg=cfg))(
        jax.random.PRNGKey(0))
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
                   n_tokens: int = 256):
    """Fused-scan generation (the production decode path): one XLA program
    for prefill + decode + sampling; returns decode tokens/s."""
    from evo_tpu import model as model_lib
    from evo_tpu.generation import _generate_program

    params = jax.jit(functools.partial(model_lib.init_params, cfg=cfg))(
        jax.random.PRNGKey(0))
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


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--preset', default='prefill8k',
                    choices=['prefill8k', 'prefill131k', 'decode',
                             'generate', 'tiny', 'scaling'])
    ap.add_argument('--batch', type=int, default=1)
    ap.add_argument('--length', type=int, default=None)
    ap.add_argument('--profile', default=None, metavar='DIR',
                    help='capture a jax.profiler trace of the timed '
                         'region into DIR (view with xprof/tensorboard)')
    args = ap.parse_args()

    # Persistent compile cache: the 29-layer program takes minutes to build
    # through the tunneled backend; cached re-runs skip straight to timing.
    jax.config.update('jax_compilation_cache_dir', '/tmp/jaxcache-bench')
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)

    from evo_tpu.models import config_for_model
    from evo_tpu.config import tiny_config

    on_tpu = jax.default_backend() == 'tpu'
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
        if args.preset == 'decode':
            tps = bench_decode(cfg, batch, prompt_len=128, steps=64)
            metric = f'decode_tokens_per_sec_per_chip_{name}'
        elif args.preset == 'generate':
            tps = bench_generate(cfg, batch)
            metric = f'generate_tokens_per_sec_per_chip_{name}'
        else:
            tps = bench_prefill(cfg, batch, length)
            metric = f'prefill_tokens_per_sec_per_chip_{name}'

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
