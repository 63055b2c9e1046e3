import time
import jax, jax.numpy as jnp, numpy as np
from evo_tpu.ops import fftconv
D, S, B, L = 4096, 8, 1, 8192
rng = np.random.default_rng(0)
mag = rng.uniform(0.5, 0.98, (D, S)); ang = rng.uniform(-3, 3, (D, S))
poles = jnp.asarray(np.stack([mag*np.cos(ang), mag*np.sin(ang)], -1), jnp.float32)
residues = jnp.asarray(rng.normal(size=(D, S, 2))/S, jnp.float32)
u = jnp.asarray(rng.normal(size=(B, D, L)), jnp.float32)
float(jnp.sum(u))
for C in (64, 128, 256):
    def run(u, C=C):
        x = u
        for _ in range(8):
            y, _ = fftconv.conv_matmul_chunked(x, poles, residues, C)
            x = y * 1e-3
        return jnp.sum(x)
    try:
        f = jax.jit(run)
        float(f(u))
        ts = []
        for _ in range(3):
            t0 = time.perf_counter(); float(f(u)); ts.append(time.perf_counter()-t0)
        print(f'chunk={C}: {(min(ts)-0.0285)/8*1000:.2f} ms/conv', flush=True)
    except Exception as e:
        print(f'chunk={C}: FAIL {str(e)[:80]}', flush=True)
