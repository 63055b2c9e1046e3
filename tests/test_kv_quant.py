"""int8 attention-KV-cache mode (`kv_quant: int8`) tests.

The mode exists for long-context serving: at 131k the bf16 KV is 6.4 GB
and every decode step reads all of it, so int8 KV halves both the cache
footprint and the per-step cache reads (layers/attention.py:kv_quantize;
docs/serving.md). These tests pin:

  * the cache structure / byte accounting,
  * quantize round-trip exactness on quantization-free values,
  * decode/resumed-prefill closeness to the bf16-cache oracle (the only
    deltas allowed are int8 roundings of k/v/q and of the softmax rows),
  * the resumable-generation (`_grow_cache`) and serving (slot scatter,
    per-row offsets) plumbing carrying the extra scale leaves intact.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from evo_tpu import model as model_lib
from evo_tpu.config import tiny_config
from evo_tpu.generation import Generator
from evo_tpu.models import EvoModel
from evo_tpu.tokenizer import CharLevelTokenizer


@pytest.fixture(scope='module')
def setup():
    cfg = tiny_config()
    params = model_lib.init_params(jax.random.PRNGKey(7), cfg)
    return cfg, params


def test_cache_structure_and_bytes(setup):
    cfg, _ = setup
    qcfg = cfg.replace(kv_quant='int8')
    B, T = 2, 64
    base = model_lib.init_cache(cfg, B, T)
    quant = model_lib.init_cache(qcfg, B, T)
    for layer in quant['layers']:
        if isinstance(layer, dict) and 'k' in layer:
            assert layer['k'].dtype == jnp.int8
            assert layer['v'].dtype == jnp.int8
            assert layer['ks'].shape == layer['k'].shape[:3]
            assert layer['vs'].dtype == jnp.float32

    def kv_bytes(c):
        return sum(x.size * x.dtype.itemsize
                   for layer in c['layers'] if isinstance(layer, dict)
                   for x in layer.values())

    # tiny config runs f32 compute: int8 data + f32/Dh scales ≈ 1/4 the
    # bytes (bf16 production caches halve instead)
    assert kv_bytes(quant) < 0.5 * kv_bytes(base)


def test_kv_quantize_roundtrip_exact():
    """Values that are exact int8 multiples of a per-(pos, head) scale
    survive quantize->dequantize to f32 ulp (the scale s = max/127 is not
    exactly representable, so the division contributes ~1e-7 relative —
    the plumbing adds no int8-rounding error of its own)."""
    from evo_tpu.layers.attention import kv_quantize
    rng = np.random.default_rng(0)
    ints = rng.integers(-127, 128, size=(2, 8, 4, 16)).astype(np.float32)
    # force each (b, t, h) row to contain a ±127 so the scale is exact
    ints[..., 0] = 127.0
    scales = rng.uniform(0.5, 2.0, size=(2, 8, 4, 1)).astype(np.float32)
    x = jnp.asarray(ints * scales)
    q, s = kv_quantize(x)
    back = q.astype(jnp.float32) * s[..., None]
    np.testing.assert_allclose(np.asarray(back), np.asarray(x),
                               rtol=1e-6, atol=0)


def _prefill_decode(cfg, params, n_steps=6):
    tok = CharLevelTokenizer(512)
    ids = jnp.asarray(np.asarray(tok.tokenize('ACGTACGTTGCA'))[None],
                      jnp.int32)
    cache = model_lib.init_cache(cfg, 1, ids.shape[1] + n_steps + 1)
    logits, cache = model_lib.prefill(params, cfg, ids, cache)
    outs = [logits[:, -1]]
    t = jnp.argmax(logits[:, -1], axis=-1).astype(jnp.int32)
    for _ in range(n_steps):
        lg, cache = model_lib.decode_step(params, cfg, t, cache)
        outs.append(lg)
        t = jnp.argmax(lg, axis=-1).astype(jnp.int32)
    return np.stack([np.asarray(o) for o in outs]), cache


def test_decode_close_to_bf16_cache(setup):
    """Greedy decode with the int8 cache tracks the bf16-cache run: the
    prefill logits are identical (fresh prefill never reads quantized
    state) and decode logits stay within the int8 rounding budget."""
    cfg, params = setup
    want, _ = _prefill_decode(cfg, params)
    got, _ = _prefill_decode(cfg.replace(kv_quant='int8'), params)
    # step 0 logits come straight from the unquantized prefill
    np.testing.assert_allclose(got[0], want[0], rtol=1e-6, atol=1e-6)
    scale = np.maximum(np.abs(want).max(), 1.0)
    rel = np.abs(got - want).max() / scale
    assert rel < 0.05, f'int8 KV decode diverged: rel={rel:.4f}'


def test_resumed_prefill_buffer_path(setup):
    """Segmented prefill (attend_buffer readback) under kv_quant: the
    second segment's logits must stay close to the bf16-cache run —
    exercises the in-chunk dequantize of the online-softmax path."""
    cfg, params = setup

    def run(c):
        ids = jnp.asarray(
            np.asarray(CharLevelTokenizer(512).tokenize(
                'ACGTACGTTGCAGGCCTTAA'))[None], jnp.int32)
        cache = model_lib.init_cache(c, 1, ids.shape[1] + 2)
        _, cache = model_lib.prefill(params, c, ids[:, :12], cache)
        lg, _ = model_lib.prefill(params, c, ids[:, 12:], cache,
                                  resume=True)
        return np.asarray(lg)

    want = run(cfg)
    got = run(cfg.replace(kv_quant='int8'))
    scale = np.maximum(np.abs(want).max(), 1.0)
    assert np.abs(got - want).max() / scale < 0.05


def test_generator_resume_grows_quantized_cache(setup, monkeypatch):
    """Generator resume (`inference_params_dict=`) pads the int8 data AND
    scale buffers (generation._grow_cache) and keeps decoding.

    The alignment is patched back to L+1 so a tiny resume budget forces
    a real grow (production caches are 128-aligned for Pallas buffer
    eligibility, which would absorb small resumes as padding) and the
    one-shot/resumed horizons stay short enough for exact greedy
    equality on random weights (long horizons flip argmax near-ties
    between differently-shaped cache programs)."""
    from evo_tpu import generation as gen_lib
    monkeypatch.setattr(gen_lib, '_aligned_cache_len',
                        lambda L, align=1024: L + 1)
    cfg, params = setup
    qcfg = cfg.replace(kv_quant='int8')
    model = EvoModel(qcfg, params)
    tok = CharLevelTokenizer(512)
    g = Generator(model, tok, top_k=1, temperature=0.0)
    gen1, _, ipd = g.generate(input_string='ACGTACGT', num_tokens=4)
    for layer in ipd['layers']:
        if isinstance(layer, dict) and 'k' in layer:
            assert layer['k'].dtype == jnp.int8
            T0 = layer['k'].shape[2]     # head-major: time is axis 2
    gen2, _, ipd2 = g.generate(
        input_ids=np.asarray(gen1)[:, -1:], num_tokens=8,
        inference_params_dict=ipd)
    for layer in ipd2['layers']:
        if isinstance(layer, dict) and 'k' in layer:
            assert layer['k'].shape[2] > T0
            assert layer['ks'].shape == layer['k'].shape[:3]
    # one-shot run of the same total budget agrees (resume seam is clean)
    g2 = Generator(model, tok, top_k=1, temperature=0.0)
    full, _, _ = g2.generate(input_string='ACGTACGT', num_tokens=12)
    np.testing.assert_array_equal(
        np.concatenate([np.asarray(gen1), np.asarray(gen2)], axis=1),
        np.asarray(full))


def test_server_composes_with_kv_quant(setup):
    """Continuous batching on the int8 cache: greedy server outputs equal
    the same config's Generator run token-for-token (per-row offsets,
    slot scatter of the scale buffers, admission path)."""
    from evo_tpu.serving import serve_requests
    cfg, params = setup
    qcfg = cfg.replace(kv_quant='int8')
    model = EvoModel(qcfg, params)
    tok = CharLevelTokenizer(512)
    prompts = ['ACGTACGTAC', 'TTGG', 'GATTACA']
    got = serve_requests(model, tok, prompts, num_tokens=6, max_slots=2,
                         steps_per_sync=4)
    for prompt, res in zip(prompts, got):
        g = Generator(model, tok, top_k=1, temperature=0.0)
        want, _, _ = g.generate(
            input_ids=np.asarray(tok.tokenize(prompt))[None], num_tokens=6)
        np.testing.assert_array_equal(res.token_ids, np.asarray(want)[0])


def test_server_cache_kernel_aligned(setup):
    """Under kv_quant the server sizes its decode cache at the int8
    buffer kernel's eligible multiple (4096-long k-blocks): a user-chosen
    max_len that isn't eligible would silently pessimize decode to the
    jnp int8 fallback (slower than bf16 — ADVICE r3). The user's max_len
    stays the admission bound."""
    from evo_tpu.serving import GenerationServer
    cfg, params = setup
    qcfg = cfg.replace(kv_quant='int8')
    from evo_tpu.ops.pallas_attention import flash_buffer_supported
    srv = GenerationServer(EvoModel(qcfg, params), max_slots=2,
                           max_len=300)
    assert srv.max_len == 300                    # admission bound kept
    assert flash_buffer_supported(srv._cache_len)
    assert srv._cache_len == 384                 # short server: 128-align
    # long server: 4096-align only when the padding is <= 25% (memory
    # cliff guard — 5000 -> 8192 would be 64% padding, falls to 128)
    srv_long = GenerationServer(EvoModel(qcfg, params), max_slots=1,
                                max_len=5000)
    assert srv_long._cache_len == 5120
    srv_big = GenerationServer(EvoModel(qcfg, params), max_slots=1,
                               max_len=8000)
    assert srv_big._cache_len == 8192            # 2.4% padding: worth it
    # cache['layers'] is indexed by SEGMENT, not layer: find the segment
    # holding the first attention layer (they coincide for tiny_config,
    # which previously masked a wrong layer-index lookup here)
    attn_seg = next(i for i, (kind, _) in enumerate(qcfg.layer_segments())
                    if kind == 'attn')
    k_buf = srv._cache['layers'][attn_seg]['k']
    assert k_buf.shape[2] == srv._cache_len      # head-major (B,H,T,Dh)
    # bf16 mode: cache stays exactly max_len (no silent growth)
    srv_bf16 = GenerationServer(EvoModel(cfg, params), max_slots=2,
                                max_len=300)
    assert srv_bf16._cache_len == 300


def _dequant_buffer_oracle(q, kq, kss, vq, vss, off):
    """Dense softmax over the DEQUANTIZED buffers — the exact function
    the int8 kernel/jnp paths compute, isolating plumbing from the int8
    rounding (which is the mode's own, separately-tested numerics).
    off: scalar or (B,) per-row offsets."""
    Dh = q.shape[-1]
    kd = kq.astype(jnp.float32) * kss[..., None]
    vd = vq.astype(jnp.float32) * vss[..., None]
    s = jnp.einsum('blhd,bthd->bhlt', q.astype(jnp.float32),
                   kd) / (Dh ** 0.5)
    T, Lq = kq.shape[1], q.shape[1]
    off = jnp.asarray(off)
    offb = off[:, None, None] if off.ndim == 1 else off
    mask = jnp.arange(T)[None, None, :] <= offb + \
        jnp.arange(Lq)[None, :, None]          # (B, Lq, T)
    s = jnp.where(mask[:, None], s, -jnp.inf)
    return jnp.einsum('bhlt,bthd->blhd', jax.nn.softmax(s, axis=-1), vd)


def test_flash_buffer_q8_kernel_matches_oracle(monkeypatch):
    """Interpret-mode int8-KV buffer kernel vs the dequantized dense
    oracle: scalar offset AND per-row (B,) offsets (the serving decode
    shape, Lq=1)."""
    from evo_tpu.layers.attention import kv_quantize
    from evo_tpu.ops.pallas_attention import flash_attention_buffer

    B, H, Dh, T = 2, 2, 128, 2048
    ks = jax.random.split(jax.random.PRNGKey(11), 3)
    kb = jax.random.normal(ks[1], (B, T, H, Dh), jnp.float32)
    vb = jax.random.normal(ks[2], (B, T, H, Dh), jnp.float32)
    kq, kss = kv_quantize(kb)
    vq, vss = kv_quantize(vb)
    # kernel consumes the HEAD-MAJOR cache layout (B, H, T, Dh)/(B, H, T)
    kq_h, vq_h = jnp.swapaxes(kq, 1, 2), jnp.swapaxes(vq, 1, 2)
    kss_h, vss_h = jnp.swapaxes(kss, 1, 2), jnp.swapaxes(vss, 1, 2)
    for Lq, off in [(64, 512), (1, jnp.asarray([700, 30], jnp.int32)),
                    (64, 0)]:
        q = jax.random.normal(jax.random.fold_in(ks[0], Lq),
                              (B, Lq, H, Dh), jnp.float32)
        got = flash_attention_buffer(q, kq_h, vq_h, off, kss_h, vss_h,
                                     interpret=True)
        want = _dequant_buffer_oracle(q, kq, kss, vq, vss, off)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=2e-3, atol=2e-3)


def test_flash_buffer_vector_offset_bf16_kernel(monkeypatch):
    """The unquantized buffer kernel also honors per-row offsets (it
    shares the off_ref[b] scalar-prefetch plumbing)."""
    from evo_tpu.ops.pallas_attention import flash_attention_buffer

    B, H, Dh, T, Lq = 2, 2, 128, 1024, 8
    ks = jax.random.split(jax.random.PRNGKey(13), 3)
    q = jax.random.normal(ks[0], (B, Lq, H, Dh), jnp.float32)
    kb = jax.random.normal(ks[1], (B, T, H, Dh), jnp.float32)
    vb = jax.random.normal(ks[2], (B, T, H, Dh), jnp.float32)
    off = jnp.asarray([100, 900], jnp.int32)
    got = flash_attention_buffer(q, kb, vb, off, interpret=True)
    per_row = [flash_attention_buffer(q[i:i + 1], kb[i:i + 1],
                                      vb[i:i + 1], int(off[i]),
                                      interpret=True) for i in range(B)]
    np.testing.assert_allclose(np.asarray(got),
                               np.asarray(jnp.concatenate(per_row)),
                               rtol=1e-5, atol=1e-5)


def test_mha_step_kernel_path_matches_oracle(setup, monkeypatch):
    """mha_step's int8-KV Pallas route (use_pallas=True) stays close to
    the dequantized oracle and to the jnp int8 x int8 fallback — the two
    paths differ only by which side carries the int8 rounding of q and
    of the softmax rows."""
    import evo_tpu.ops.pallas_attention as pa
    from evo_tpu.layers.attention import mha_step

    orig = pa.flash_attention_buffer
    monkeypatch.setattr(
        pa, 'flash_attention_buffer',
        lambda *a, **kw: orig(*a, interpret=True, **kw))

    cfg, _ = setup
    qcfg = cfg.replace(kv_quant='int8')
    D, H, Dh = 256, 2, 128
    acfg = qcfg.replace(hidden_size=D, num_attention_heads=H)
    ks = jax.random.split(jax.random.PRNGKey(5), 6)
    p = {'wqkv': jax.random.normal(ks[0], (D, 3, H, Dh)) * 0.05,
         'bqkv': jax.random.normal(ks[1], (3, H, Dh)) * 0.01,
         'wo': jax.random.normal(ks[2], (H, Dh, D)) * 0.05,
         'bo': jnp.zeros((D,))}
    B, T, off = 2, 1024, 37
    x_t = jax.random.normal(ks[3], (B, 1, D), jnp.float32)
    # head-major quantized cache layout (model.init_cache)
    st = {'k': jnp.zeros((B, H, T, Dh), jnp.int8),
          'v': jnp.zeros((B, H, T, Dh), jnp.int8),
          'ks': jnp.zeros((B, H, T), jnp.float32),
          'vs': jnp.zeros((B, H, T), jnp.float32)}
    # seed the live prefix with quantized random K/V
    from evo_tpu.layers.attention import kv_quantize
    kb = jax.random.normal(ks[4], (B, off, H, Dh), jnp.float32)
    vb = jax.random.normal(ks[5], (B, off, H, Dh), jnp.float32)
    kq, kss = kv_quantize(kb)
    vq, vss = kv_quantize(vb)
    st['k'] = st['k'].at[:, :, :off].set(jnp.swapaxes(kq, 1, 2))
    st['v'] = st['v'].at[:, :, :off].set(jnp.swapaxes(vq, 1, 2))
    st['ks'] = st['ks'].at[:, :, :off].set(jnp.swapaxes(kss, 1, 2))
    st['vs'] = st['vs'].at[:, :, :off].set(jnp.swapaxes(vss, 1, 2))
    got_k, st_k = mha_step(p, acfg, x_t, st, jnp.int32(off),
                           use_pallas=True)
    got_j, st_j = mha_step(p, acfg, x_t, st, jnp.int32(off),
                           use_pallas=False)
    scale = np.maximum(np.abs(np.asarray(got_j)).max(), 1.0)
    assert np.abs(np.asarray(got_k) - np.asarray(got_j)).max() / scale \
        < 0.05
    # the written buffers are identical regardless of the attend path
    for kk in st_k:
        np.testing.assert_array_equal(np.asarray(st_k[kk]),
                                      np.asarray(st_j[kk]))


def test_vector_offset_matches_scalar_quantized(setup):
    """(B,) per-slot offsets through the int8 decode path == scalar
    offsets (the serving correctness anchor, quantized edition)."""
    cfg, params = setup
    qcfg = cfg.replace(kv_quant='int8')
    tok = CharLevelTokenizer(512)
    B, P = 2, 6
    ids = jnp.asarray(
        np.stack([tok.tokenize('ACGTAC'), tok.tokenize('TTGGCC')]))
    cache = model_lib.init_cache(qcfg, B, 32)
    logits, cache_s = model_lib.prefill(params, qcfg, ids, cache)
    cache_v = dict(cache_s)
    cache_v['offset'] = jnp.full((B,), P, jnp.int32)
    t = jnp.argmax(logits[:, -1], axis=-1).astype(jnp.int32)
    ls, _ = model_lib.decode_step(params, qcfg, t, cache_s)
    lv, _ = model_lib.decode_step(params, qcfg, t, cache_v)
    np.testing.assert_allclose(np.asarray(ls), np.asarray(lv),
                               rtol=1e-5, atol=1e-5)
