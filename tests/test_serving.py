"""Continuous-batching server tests (evo_tpu/serving.py).

Correctness anchor: a slot-batched greedy generation must equal the
single-request Generator output token-for-token, for any mix of prompt
lengths, arrival orders, and slot counts — the per-slot offset machinery
(vector rotary positions, per-row KV writes, per-row masks) must be
invisible in the outputs.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from evo_tpu import model as model_lib
from evo_tpu.config import tiny_config
from evo_tpu.generation import Generator
from evo_tpu.models import EvoModel
from evo_tpu.serving import GenerationServer, serve_requests
from evo_tpu.tokenizer import CharLevelTokenizer


@pytest.fixture(scope='module')
def setup():
    cfg = tiny_config()
    params = model_lib.init_params(jax.random.PRNGKey(0), cfg)
    return EvoModel(cfg, params), CharLevelTokenizer(512)


def _greedy_reference(model, tok, prompt: str, n: int) -> np.ndarray:
    g = Generator(model, tok, top_k=1, temperature=0.0)
    gen, _, _ = g.generate(
        input_ids=np.asarray(tok.tokenize(prompt))[None], num_tokens=n)
    return np.asarray(gen)[0]


def test_vector_offset_decode_matches_scalar(setup):
    """decode_step with a uniform (B,) offset vector == scalar offset."""
    model, tok = setup
    cfg = model.config
    B, P = 2, 6
    ids = jnp.asarray(
        np.stack([tok.tokenize('ACGTAC'), tok.tokenize('TTGGCC')]))
    cache = model_lib.init_cache(cfg, B, 32)
    logits, cache_s = model_lib.prefill(model.params, cfg, ids, cache)
    cache_v = dict(cache_s)
    cache_v['offset'] = jnp.full((B,), P, jnp.int32)
    tok_next = jnp.argmax(logits[:, -1], axis=-1).astype(jnp.int32)
    ls, cs = model_lib.decode_step(model.params, cfg, tok_next, cache_s)
    lv, cv = model_lib.decode_step(model.params, cfg, tok_next, cache_v)
    np.testing.assert_allclose(np.asarray(ls), np.asarray(lv),
                               rtol=1e-5, atol=1e-5)
    assert np.all(np.asarray(cv['offset']) == P + 1)
    # a second step keeps agreeing (KV written at the right per-row slots)
    t2 = jnp.argmax(ls, axis=-1).astype(jnp.int32)
    ls2, _ = model_lib.decode_step(model.params, cfg, t2, cs)
    lv2, _ = model_lib.decode_step(model.params, cfg, t2, cv)
    np.testing.assert_allclose(np.asarray(ls2), np.asarray(lv2),
                               rtol=1e-5, atol=1e-5)


def test_server_uniform_prompts_match_generator(setup):
    model, tok = setup
    prompts = ['ACGTACGTAC', 'TTGGCCAATT']
    n = 10
    results = serve_requests(model, tok, prompts, num_tokens=n,
                             temperature=0.0, max_slots=2,
                             steps_per_sync=4)
    for prompt, res in zip(prompts, results):
        want = _greedy_reference(model, tok, prompt, n)
        np.testing.assert_array_equal(res.token_ids, want)
        assert res.sequence == tok.detokenize(want.tolist())


def test_server_ragged_staggered_more_requests_than_slots(setup):
    """5 ragged prompts through 2 slots: every output must match its
    individual greedy generation (slot reuse, mid-chunk completion,
    different offsets per row)."""
    model, tok = setup
    prompts = ['ACGT', 'TTGGCCAATTGGA', 'CCCCCCC', 'ACGTACGTACGTACGTAC',
               'GATTACA']
    lens = [7, 3, 11, 5, 6]   # ragged budgets force mid-chunk completions
    server = GenerationServer(model, tok, max_slots=2, max_len=64,
                              steps_per_sync=4)
    rids = [server.submit(prompt=p, num_tokens=n)
            for p, n in zip(prompts, lens)]
    results = server.run()
    assert len(results) == len(prompts)
    for rid, prompt, n in zip(rids, prompts, lens):
        want = _greedy_reference(model, tok, prompt, n)
        np.testing.assert_array_equal(results[rid].token_ids, want)


def test_server_late_submission_joins_running_batch(setup):
    model, tok = setup
    server = GenerationServer(model, tok, max_slots=2, max_len=64,
                              steps_per_sync=2)
    r0 = server.submit(prompt='ACGTACGT', num_tokens=12)
    server.step()
    server.step()
    # a request arriving while r0 is mid-flight
    r1 = server.submit(prompt='TTGG', num_tokens=5)
    results = server.run()
    np.testing.assert_array_equal(
        results[r0].token_ids, _greedy_reference(model, tok, 'ACGTACGT', 12))
    np.testing.assert_array_equal(
        results[r1].token_ids, _greedy_reference(model, tok, 'TTGG', 5))


def test_server_progress_is_monotonic_and_host_visible(setup):
    """progress(rid): 0 while queued, strictly grows across step() syncs,
    and ends at the request's budget — the hook the open-loop latency
    benchmark uses to timestamp first-token emission (bench.py)."""
    model, tok = setup
    server = GenerationServer(model, tok, max_slots=1, max_len=64,
                              steps_per_sync=2)
    r0 = server.submit(prompt='ACGTACGT', num_tokens=9)
    r1 = server.submit(prompt='TTGG', num_tokens=5)   # queued behind r0
    assert server.progress(r0) == 0 and server.progress(r1) == 0
    assert server.progress(12345) == 0                # unknown rid
    server.step()
    p0 = server.progress(r0)
    assert p0 >= 1                  # insertion samples the first token
    assert server.progress(r1) == 0  # single slot: r1 still queued
    server.step()
    assert server.progress(r0) > p0
    server.run()
    assert server.progress(r0) == 9 and server.progress(r1) == 5


def test_server_stop_token_ends_request_early(setup):
    model, tok = setup
    # greedy from this model is deterministic: find the first emitted token
    want = _greedy_reference(model, tok, 'ACGTACGTAC', 8)
    stop = int(want[3])
    server = GenerationServer(model, tok, max_slots=1, max_len=64,
                              steps_per_sync=4, stop_token=stop)
    rid = server.submit(prompt='ACGTACGTAC', num_tokens=8)
    res = server.run()[rid]
    stops = np.where(want == stop)[0]
    np.testing.assert_array_equal(res.token_ids, want[:stops[0] + 1])


def test_server_per_request_temperature_and_score(setup):
    model, tok = setup
    server = GenerationServer(model, tok, max_slots=2, max_len=64,
                              top_k=4, steps_per_sync=4, seed=7)
    r_greedy = server.submit(prompt='ACGTACGTAC', num_tokens=6,
                             temperature=0.0)
    r_hot = server.submit(prompt='ACGTACGTAC', num_tokens=6,
                          temperature=1.0)
    results = server.run()
    want = _greedy_reference(model, tok, 'ACGTACGTAC', 6)
    np.testing.assert_array_equal(results[r_greedy].token_ids, want)
    # scores are finite mean logprobs of the emitted tokens
    for res in results.values():
        assert np.isfinite(res.score) and res.score <= 0.0
    assert len(results[r_hot].token_ids) == 6


def test_server_per_request_top_k_top_p(setup):
    """Per-request top-k/top-p (traced per-slot vectors): a temp=1.0
    request with top_k=1 (or a vanishingly small top_p) keeps only the
    argmax in its filtered distribution, so its stream must EXACTLY
    equal greedy — while co-tenant rows sample with their own params."""
    model, tok = setup
    server = GenerationServer(model, tok, max_slots=3, max_len=64,
                              top_k=0, steps_per_sync=3, seed=11)
    want = _greedy_reference(model, tok, 'ACGTACGTAC', 7)
    r_k1 = server.submit(prompt='ACGTACGTAC', num_tokens=7,
                         temperature=1.0, top_k=1)
    r_p0 = server.submit(prompt='ACGTACGTAC', num_tokens=7,
                         temperature=1.0, top_p=1e-9)
    r_hot = server.submit(prompt='ACGTACGTAC', num_tokens=7,
                          temperature=1.0, top_k=4)
    results = server.run()
    np.testing.assert_array_equal(results[r_k1].token_ids, want)
    np.testing.assert_array_equal(results[r_p0].token_ids, want)
    assert len(results[r_hot].token_ids) == 7
    # and the per-request override round-trips independently of traffic:
    # the same top_k=4 request alone gives the same stream (per-slot keys)
    solo = GenerationServer(model, tok, max_slots=3, max_len=64,
                            top_k=0, steps_per_sync=3, seed=11)
    r_solo = solo.submit(prompt='ACGTACGTAC', num_tokens=7,
                         temperature=1.0, top_k=4, seed=r_hot)
    np.testing.assert_array_equal(solo.run()[r_solo].token_ids,
                                  results[r_hot].token_ids)


def test_interleaved_prefill_matches_and_decodes_between_chunks(setup):
    """prefill_chunks_per_sync: a long arriving prompt no longer stalls
    the running batch — decode chunks run between its prefill chunks —
    and every output is still exactly the single-request reference."""
    model, tok = setup
    server = GenerationServer(model, tok, max_slots=2, max_len=96,
                              steps_per_sync=2, prompt_chunk=4,
                              prefill_chunks_per_sync=1)
    r0 = server.submit(prompt='ACGTACGT', num_tokens=14)
    server.step()                   # r0 inserted + decoding
    long_prompt = 'GATTACA' * 4     # 28 tokens = 7 chunks of 4
    r1 = server.submit(prompt=long_prompt, num_tokens=5)
    before = len(server._requests[r0].tokens)
    # while r1 is mid-prefill (several steps), r0 keeps decoding
    server.step()
    server.step()
    assert server._fill is not None          # r1 still prefilling
    assert len(server._requests[r0].tokens) > before
    results = server.run()
    np.testing.assert_array_equal(
        results[r0].token_ids, _greedy_reference(model, tok, 'ACGTACGT', 14))
    np.testing.assert_array_equal(
        results[r1].token_ids, _greedy_reference(model, tok, long_prompt, 5))


def test_server_chunked_prompt_prefill_matches(setup):
    """prompt_chunk bounds the compiled prefill shapes; outputs must be
    bit-identical to the unchunked path (exact resumable-state carry)."""
    model, tok = setup
    prompts = ['ACGTACGTACGTA', 'TTGG', 'GATTACAGATTACA']
    n = 6
    base = serve_requests(model, tok, prompts, num_tokens=n,
                          temperature=0.0, max_slots=2)
    server = GenerationServer(model, tok, max_slots=2, max_len=64,
                              steps_per_sync=4, prompt_chunk=4)
    rids = [server.submit(prompt=p, num_tokens=n) for p in prompts]
    results = server.run()
    for rid, want in zip(rids, base):
        np.testing.assert_array_equal(results[rid].token_ids,
                                      want.token_ids)


def test_sampled_requests_deterministic_across_traffic_mixes(setup):
    """A stochastic request's output is a pure function of (server seed,
    request seed, prompt) — independent of co-tenants, arrival order, and
    slot assignment (per-slot PRNG keys folded from the request seed)."""
    model, tok = setup

    def run_alone():
        s = GenerationServer(model, tok, max_slots=2, max_len=64,
                             top_k=4, steps_per_sync=4, seed=11)
        rid = s.submit(prompt='ACGTACGTAC', num_tokens=8, temperature=1.0,
                       seed=123)
        return s.run()[rid].token_ids

    def run_crowded():
        s = GenerationServer(model, tok, max_slots=2, max_len=64,
                             top_k=4, steps_per_sync=4, seed=11)
        # different co-tenants, and the target request arrives SECOND
        # (different slot) with other traffic before and after
        s.submit(prompt='TTGGCCAATT', num_tokens=11, temperature=0.9,
                 seed=5)
        rid = s.submit(prompt='ACGTACGTAC', num_tokens=8, temperature=1.0,
                       seed=123)
        s.submit(prompt='GATTACA', num_tokens=3, temperature=0.5, seed=9)
        return s.run()[rid].token_ids

    np.testing.assert_array_equal(run_alone(), run_crowded())


def test_server_loop_threadsafe_submit_and_wait(setup):
    """ServerLoop: concurrent submitters each get their own (greedy-
    deterministic) result back."""
    import threading

    from evo_tpu.serving import ServerLoop
    model, tok = setup
    loop = ServerLoop(GenerationServer(model, tok, max_slots=2, max_len=64,
                                       steps_per_sync=4))
    prompts = ['ACGTACGT', 'TTGG', 'GATTACA']
    out = {}

    def client(p):
        rid = loop.submit(prompt=p, num_tokens=6, temperature=0.0)
        out[p] = loop.wait(rid, timeout=120)

    threads = [threading.Thread(target=client, args=(p,)) for p in prompts]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    loop.close()
    for p in prompts:
        assert out[p] is not None, p
        np.testing.assert_array_equal(out[p].token_ids,
                                      _greedy_reference(model, tok, p, 6))


def test_server_cancel_queued_and_active(setup):
    """cancel(): a queued request finalizes empty, an active request
    finalizes with its tokens-so-far (a greedy-reference prefix), the
    freed slot serves the next request, and double-cancel is False."""
    model, tok = setup
    server = GenerationServer(model, tok, max_slots=1, max_len=64,
                              steps_per_sync=2)
    r0 = server.submit(prompt='ACGTACGT', num_tokens=12)
    r1 = server.submit(prompt='TTGG', num_tokens=5)      # queued behind r0
    server.step()
    assert server.cancel(r1)
    res1 = server.result(r1)
    assert res1.cancelled and len(res1.token_ids) == 0
    p0 = server.progress(r0)
    assert p0 >= 1
    assert server.cancel(r0)
    res0 = server.result(r0)
    assert res0.cancelled and len(res0.token_ids) == p0
    np.testing.assert_array_equal(
        res0.token_ids, _greedy_reference(model, tok, 'ACGTACGT', 12)[:p0])
    assert not server.cancel(r0)                          # already done
    assert not server.cancel(98765)                       # unknown rid
    r2 = server.submit(prompt='GATTACA', num_tokens=6)    # reuses the slot
    results = server.run()
    np.testing.assert_array_equal(
        results[r2].token_ids, _greedy_reference(model, tok, 'GATTACA', 6))


def test_server_batched_prefill_matches_generator(setup):
    """prefill_batch=2: same-length prompts admitted through one 2-row
    prefill must match their individual greedy generations exactly —
    prefill row math never crosses the batch axis, so batching the
    admission is invisible in the outputs. One odd-length prompt rides
    along to exercise the B=1 fallback in the same run."""
    model, tok = setup
    prompts = ['ACGTACGTAC', 'TTGGCCAATT', 'GATTACAGAT', 'CCCCCCCCCC',
               'ACGT']
    lens = [8, 5, 9, 6, 7]
    server = GenerationServer(model, tok, max_slots=4, max_len=64,
                              steps_per_sync=4, prefill_batch=2)
    rids = [server.submit(prompt=p, num_tokens=n)
            for p, n in zip(prompts, lens)]
    results = server.run()
    assert len(results) == len(prompts)
    for rid, p, n in zip(rids, prompts, lens):
        np.testing.assert_array_equal(results[rid].token_ids,
                                      _greedy_reference(model, tok, p, n))


def test_server_batched_prefill_sampled_matches_unbatched(setup):
    """Sampled requests emit identical tokens with and without batched
    admission: each request's stream is a pure function of its own seed
    and the grouping changes no per-row numerics."""
    model, tok = setup
    prompts = ['ACGTACGTAC', 'TTGGCCAATT', 'GATTACAGAT', 'CCAATTGGCC']

    def run(pb):
        server = GenerationServer(model, tok, max_slots=4, max_len=64,
                                  steps_per_sync=4, prefill_batch=pb,
                                  seed=7)
        rids = [server.submit(prompt=p, num_tokens=9, temperature=0.9,
                              top_k=3, seed=13 + i)
                for i, p in enumerate(prompts)]
        res = server.run()
        return [res[r].token_ids for r in rids]

    for a, b in zip(run(0), run(4)):
        np.testing.assert_array_equal(a, b)


def test_server_batched_prefill_ladder_sizes(setup):
    """Group sizes come from the power-of-two ladder: 2 same-length
    prompts under prefill_batch=4 group at size 2 (never a padded
    4-row program), a lone odd-length prompt takes the B=1 path, and
    outputs still match their individual references."""
    model, tok = setup
    server = GenerationServer(model, tok, max_slots=4, max_len=64,
                              steps_per_sync=4, prefill_batch=4)
    r0 = server.submit(prompt='ACGTACGT', num_tokens=6)
    r1 = server.submit(prompt='TTGGCCAA', num_tokens=6)   # only 2 of len 8
    r2 = server.submit(prompt='GATTACA', num_tokens=6)    # lone len 7
    results = server.run()
    assert 4 not in server._prefill_caches          # no padded 4-row fill
    assert 2 in server._prefill_caches              # pair grouped at 2
    np.testing.assert_array_equal(
        results[r0].token_ids, _greedy_reference(model, tok, 'ACGTACGT', 6))
    np.testing.assert_array_equal(
        results[r1].token_ids, _greedy_reference(model, tok, 'TTGGCCAA', 6))
    np.testing.assert_array_equal(
        results[r2].token_ids, _greedy_reference(model, tok, 'GATTACA', 6))


def test_server_batched_prefill_cancel_one_row(setup):
    """Cancelling one request of an in-flight batched+chunked fill keeps
    the co-tenant row: the survivor still matches its greedy reference
    and the cancelled request finalizes empty."""
    model, tok = setup
    server = GenerationServer(model, tok, max_slots=2, max_len=64,
                              steps_per_sync=2, prefill_batch=2,
                              prompt_chunk=4, prefill_chunks_per_sync=1)
    pa, pb = 'ACGTACGTACGT', 'TTGGCCAATTGG'        # 12 = 2 head chunks
    ra = server.submit(prompt=pa, num_tokens=6)
    rb = server.submit(prompt=pb, num_tokens=6)
    server.step()                                   # fill started, mid-head
    assert server._fill is not None and len(server._fill['reqs']) == 2
    assert server.cancel(rb)
    results = server.run()
    resb = results[rb]
    assert resb.cancelled and len(resb.token_ids) == 0
    np.testing.assert_array_equal(
        results[ra].token_ids, _greedy_reference(model, tok, pa, 6))


def test_server_loop_stream_yields_full_sequence(setup):
    """ServerLoop.stream(): incremental tokens equal the final result."""
    from evo_tpu.serving import ServerLoop
    model, tok = setup
    loop = ServerLoop(GenerationServer(model, tok, max_slots=2, max_len=64,
                                       steps_per_sync=2))
    rid = loop.submit(prompt='ACGTACGT', num_tokens=9)
    toks = list(loop.stream(rid))
    loop.close()
    np.testing.assert_array_equal(
        np.asarray(toks, np.int32),
        _greedy_reference(model, tok, 'ACGTACGT', 9))


def test_serve_cli_jsonl_and_http(setup, tmp_path):
    """scripts/serve.py surfaces: JSONL batch mode and the HTTP server."""
    import json
    import threading
    import urllib.request

    from scripts.serve import make_http_server, run_jsonl
    model, tok = setup

    class A:                                   # argparse stand-in
        n_tokens = 5
        temperature = 0.0
        requests_jsonl = str(tmp_path / 'reqs.jsonl')
        output_jsonl = str(tmp_path / 'out.jsonl')
        http = 0
        request_timeout = 120.0

    reqs = [{'id': 'a', 'prompt': 'ACGTACGT', 'num_tokens': 6},
            {'id': 'b', 'prompt': 'TTGG'}]
    with open(A.requests_jsonl, 'w') as f:
        for r in reqs:
            f.write(json.dumps(r) + '\n')
    run_jsonl(A, GenerationServer(model, tok, max_slots=2, max_len=64,
                                  steps_per_sync=4))
    lines = [json.loads(x) for x in open(A.output_jsonl)]
    assert [x['id'] for x in lines] == ['a', 'b']
    assert lines[0]['num_tokens'] == 6 and lines[1]['num_tokens'] == 5
    want_a = _greedy_reference(model, tok, 'ACGTACGT', 6)
    assert lines[0]['sequence'] == tok.detokenize(want_a.tolist())

    httpd, loop = make_http_server(
        A, GenerationServer(model, tok, max_slots=2, max_len=64,
                            steps_per_sync=4))
    port = httpd.server_address[1]
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    try:
        body = json.dumps({'prompt': 'ACGTACGT', 'num_tokens': 6}).encode()
        resp = json.loads(urllib.request.urlopen(
            f'http://127.0.0.1:{port}/generate', data=body,
            timeout=120).read())
        assert resp['sequence'] == tok.detokenize(want_a.tolist())
        health = json.loads(urllib.request.urlopen(
            f'http://127.0.0.1:{port}/health', timeout=30).read())
        assert health['ok'] is True
        # /stream: NDJSON token lines then the final result line
        resp = urllib.request.urlopen(
            f'http://127.0.0.1:{port}/stream', data=body, timeout=120)
        lines = [json.loads(x) for x in resp.read().splitlines()]
        toks = [x['token'] for x in lines if 'token' in x]
        np.testing.assert_array_equal(np.asarray(toks, np.int32), want_a)
        assert lines[-1]['sequence'] == tok.detokenize(want_a.tolist())
        # /cancel on an unknown id is a clean negative
        resp = json.loads(urllib.request.urlopen(
            f'http://127.0.0.1:{port}/cancel',
            data=json.dumps({'id': 99999}).encode(), timeout=30).read())
        assert resp == {'id': 99999, 'cancelled': False}
    finally:
        httpd.shutdown()
        loop.close()


def test_prefix_cache_repeated_prompts_skip_prefill(setup):
    """sample_model's pattern (one prompt x n samples): repeats of the
    previous prompt insert from the prefix cache with zero prefill
    calls, and every output still matches its individual generation."""
    model, tok = setup

    calls = {'prefill': 0}
    real_call = model.__call__

    def counting_call(ids, inference_params_dict=None, **kw):
        if inference_params_dict is not None and ids.shape[1] > 1:
            calls['prefill'] += 1
        return real_call(ids, inference_params_dict=inference_params_dict,
                         **kw)

    class Spy:
        def __getattr__(self, name):
            return getattr(model, name)

        def __call__(self, *a, **kw):
            return counting_call(*a, **kw)

    server = GenerationServer(Spy(), tok, max_slots=2, max_len=64,
                              steps_per_sync=4, top_k=4, seed=3)
    # 4 requests over 2 unique prompts: greedy + stochastic forks
    r = [server.submit(prompt='ACGTACGTAC', num_tokens=6, temperature=0.0),
         server.submit(prompt='ACGTACGTAC', num_tokens=6, temperature=1.0,
                       seed=77),
         server.submit(prompt='TTGGCCAATT', num_tokens=5, temperature=0.0),
         server.submit(prompt='TTGGCCAATT', num_tokens=5, temperature=0.0)]
    results = server.run()
    assert calls['prefill'] == 2, calls      # one per unique prompt
    np.testing.assert_array_equal(
        results[r[0]].token_ids,
        _greedy_reference(model, tok, 'ACGTACGTAC', 6))
    for rid in (r[2], r[3]):
        np.testing.assert_array_equal(
            results[rid].token_ids,
            _greedy_reference(model, tok, 'TTGGCCAATT', 5))
    # the stochastic fork is deterministic per its own seed: rerun alone
    solo = GenerationServer(model, tok, max_slots=2, max_len=64,
                            steps_per_sync=4, top_k=4, seed=3)
    rid = solo.submit(prompt='ACGTACGTAC', num_tokens=6, temperature=1.0,
                      seed=77)
    np.testing.assert_array_equal(results[r[1]].token_ids,
                                  solo.run()[rid].token_ids)


def test_prefix_cache_survives_interleaved_new_prompts(setup):
    """A!=B alternation: only adjacent repeats hit the cache; outputs
    stay exact either way (the prefix swap never corrupts state)."""
    model, tok = setup
    server = GenerationServer(model, tok, max_slots=2, max_len=64,
                              steps_per_sync=2, prompt_chunk=4)
    prompts = ['ACGTACGT', 'GATTACAGATT', 'ACGTACGT', 'GATTACAGATT',
               'GATTACAGATT']
    rids = [server.submit(prompt=p, num_tokens=4) for p in prompts]
    results = server.run()
    for rid, p in zip(rids, prompts):
        np.testing.assert_array_equal(results[rid].token_ids,
                                      _greedy_reference(model, tok, p, 4))


def test_server_with_int8_weights_matches_int8_generator(setup):
    """The serving scheduler composes with the int8 weight-only mode: its
    greedy outputs equal the int8-quantized model's own Generator run
    (quantized numerics differ from bf16 by design, so the oracle is the
    same quantized tree, not the bf16 one)."""
    from evo_tpu.quant import quantize_params
    model, tok = setup
    qparams = quantize_params(model.params)
    qmodel = EvoModel(model.config, qparams)
    prompts = ['ACGTACGTAC', 'TTGG']
    got = serve_requests(qmodel, tok, prompts, num_tokens=6, max_slots=2,
                         steps_per_sync=4)
    for prompt, res in zip(prompts, got):
        want = _greedy_reference(qmodel, tok, prompt, 6)
        np.testing.assert_array_equal(res.token_ids, want)


def test_server_under_tp_mesh_matches_single_device(setup):
    """Continuous batching on a (dp=1, tp=2) mesh: TP-sharded params and
    GSPMD-propagated cache shardings produce the same greedy outputs as
    the single-device server."""
    from evo_tpu.parallel.mesh import make_mesh
    from evo_tpu.parallel.sharding import shard_params

    model, tok = setup
    cfg = model.config
    mesh = make_mesh(dp=1, tp=2, devices=jax.devices()[:2])
    sharded = shard_params(model.params, cfg, mesh)
    mmodel = EvoModel(cfg, sharded, mesh=mesh)
    prompts = ['ACGTACGTAC', 'TTGGCCAATT', 'GATTACA']
    got = serve_requests(mmodel, tok, prompts, num_tokens=7, max_slots=2,
                         steps_per_sync=4)
    for prompt, res in zip(prompts, got):
        np.testing.assert_array_equal(
            res.token_ids, _greedy_reference(model, tok, prompt, 7))


def test_server_validation_errors(setup):
    model, tok = setup
    server = GenerationServer(model, tok, max_slots=1, max_len=16)
    with pytest.raises(ValueError):
        server.submit(prompt='', num_tokens=4)
    with pytest.raises(ValueError):
        server.submit(prompt='ACGT', num_tokens=0)
    with pytest.raises(ValueError):
        server.submit(prompt='ACGTACGTACGT', num_tokens=8)  # > max_len
