"""Probe: weight-only int8 matvec (decode-shaped) vs bf16 on the chip.

Decode is weight-read-bound; if XLA fuses (int8 -> bf16 * scale) into the
dot's operand load, int8 storage should ~halve the per-step time."""
import time
import jax, jax.numpy as jnp
jax.config.update('jax_compilation_cache_dir', '/tmp/jaxcache-bench')

D, I, NL = 4096, 10928, 24
key = jax.random.PRNGKey(0)
w = jax.random.normal(key, (NL, D, I), jnp.float32) * 0.02
wb = w.astype(jnp.bfloat16)
scale = jnp.max(jnp.abs(w), axis=1, keepdims=True) / 127.0   # (NL, 1, I)
wq = jnp.clip(jnp.round(w / scale), -127, 127).astype(jnp.int8)
sc = scale.astype(jnp.bfloat16)
x0 = jax.random.normal(key, (1, D), jnp.float32).astype(jnp.bfloat16)


def timeit(tag, f, *a):
    fj = jax.jit(f)
    float(fj(*a))
    ts = []
    for _ in range(3):
        t0 = time.perf_counter(); float(fj(*a)); ts.append(time.perf_counter() - t0)
    print(f'{tag}: {(min(ts)-0.0285)*1000:.2f} ms', flush=True)


def run_bf16(x, wb):
    acc = jnp.float32(0)
    for i in range(NL):
        y = x @ wb[i]
        acc += jnp.sum(y, dtype=jnp.float32)
        x = x * (1 + 1e-12 * acc.astype(x.dtype))
    return acc


def run_int8(x, wq, sc):
    acc = jnp.float32(0)
    for i in range(NL):
        y = (x @ wq[i].astype(jnp.bfloat16)) * sc[i]
        acc += jnp.sum(y, dtype=jnp.float32)
        x = x * (1 + 1e-12 * acc.astype(x.dtype))
    return acc


def run_int8_pre(x, wq, sc):
    # dequant BEFORE the dot (materializes bf16 weights) — the anti-pattern
    acc = jnp.float32(0)
    for i in range(NL):
        y = x @ (wq[i].astype(jnp.bfloat16) * sc[i])
        acc += jnp.sum(y, dtype=jnp.float32)
        x = x * (1 + 1e-12 * acc.astype(x.dtype))
    return acc


for r in range(2):
    timeit(f'bf16 r{r}', run_bf16, x0, wb)
    timeit(f'int8 post-scale r{r}', run_int8, x0, wq, sc)
    timeit(f'int8 pre-scale r{r}', run_int8_pre, x0, wq, sc)
# prefill-shaped: M=8192 (MXU-bound) — expect parity or slight loss
xL = jax.random.normal(key, (8192, D), jnp.float32).astype(jnp.bfloat16)
timeit('bf16 M=8192', run_bf16, xL, wb)
timeit('int8 post-scale M=8192', run_int8, xL, wq, sc)
