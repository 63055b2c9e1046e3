import time, functools
import jax, jax.numpy as jnp, numpy as np
from evo_tpu import model as model_lib
from evo_tpu.ops import fftconv
from evo_tpu.models import config_for_model

cfg = config_for_model('evo-1-8k-base')
params = jax.jit(functools.partial(model_lib.init_params, cfg=cfg))(jax.random.PRNGKey(0))
ids = jnp.asarray(np.random.default_rng(0).integers(0, 256, (1, 8192)), jnp.int32)

def timeit(label, fwd):
    f = jax.jit(lambda p, i: jnp.sum(fwd(p, i), dtype=jnp.float32))
    float(f(params, ids))
    ts = []
    for _ in range(3):
        t0 = time.perf_counter(); float(f(params, ids)); ts.append(time.perf_counter()-t0)
    dt = min(ts)
    print(f'{label}: {dt*1000:.0f} ms  {8192/dt:.0f} tok/s', flush=True)

timeit('full', lambda p, i: model_lib.forward(p, cfg, i))

orig_mha = model_lib.mha_full
model_lib.mha_full = lambda blk, cfg_, h, **kw: (jnp.zeros_like(h), None)
timeit('attn->zero', lambda p, i: model_lib.forward(p, cfg, i))
model_lib.mha_full = orig_mha

orig_conv = fftconv.conv_matmul_chunked
def fake_conv(u, poles, residues, chunk=128, state=None, mesh=None):
    B, D, L = u.shape
    return u.astype(jnp.float32), jnp.zeros((B, D, poles.shape[1], 2), jnp.float32)
fftconv.conv_matmul_chunked = fake_conv
import evo_tpu.layers.hyena as hyena_mod
hyena_mod.fftconv.conv_matmul_chunked = fake_conv
timeit('conv->skip', lambda p, i: model_lib.forward(p, cfg, i))
fftconv.conv_matmul_chunked = orig_conv
hyena_mod.fftconv.conv_matmul_chunked = orig_conv

cfg_nofir = cfg.replace(use_pallas='never')
timeit('pallas off (jnp FIR + jnp attn)', lambda p, i: model_lib.forward(p, cfg_nofir, i))
