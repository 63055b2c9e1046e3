"""Subprocess worker for the REAL multi-process distributed tests.

Not a test module — spawned by tests/test_multiprocess.py, two copies at a
time, each a separate OS process with 4 virtual CPU devices, joined through
`jax.distributed.initialize` into one 8-device / 2-process cluster. This is
the true shape of the reference north star ("per-host logits/scores merged
via collectives", BASELINE.md; reference scoring path
`/root/reference/evo/scoring.py:62-96` scaled out per SURVEY.md §5): the
single-process virtual-mesh tests elsewhere exercise the math, this worker
exercises coordinator bring-up, cross-process Gloo collectives,
`make_array_from_process_local_data` with non-addressable shards, and the
shard-manifest resume protocol under a real mid-job process death.

Modes
  score   per-process FASTA shard -> global dp-sharded batch -> tp/dp
          sharded tiny-model forward -> per-sequence mean logprobs ->
          process_allgather merge -> process 0 writes scores.tsv. Every
          process also recomputes its own slice UNSHARDED single-host and
          asserts the gathered global scores match it (exit != 0 on any
          mismatch).
  crash   score_fasta_sharded, but each process calls os._exit(17) when
          the second shard's scoring starts: shard csv left partial, no
          done-marker — a simulated preemption.
  resume  score_fasta_sharded again over the same work_dir: done shards
          must be skipped (call log proves it), the rest scored, and
          process 0 merges the full scores.csv.
"""

from __future__ import annotations

import argparse
import functools
import os
import sys
from pathlib import Path


def _init(args) -> None:
    import jax

    jax.config.update('jax_platforms', 'cpu')
    jax.config.update('jax_num_cpu_devices', 4)

    from evo_tpu.parallel.distributed import initialize_distributed

    active = initialize_distributed(args.coordinator,
                                    num_processes=args.num_processes,
                                    process_id=args.process_id,
                                    retries=3, retry_delay=1.0)
    assert active, 'initialize_distributed did not activate multi-process'
    assert jax.process_count() == args.num_processes, jax.process_count()
    assert jax.process_index() == args.process_id
    assert len(jax.local_devices()) == 4, jax.local_devices()
    assert len(jax.devices()) == 4 * args.num_processes, jax.devices()


def _mode_score(args) -> None:
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P

    from evo_tpu import model as model_lib
    from evo_tpu.config import tiny_config
    from evo_tpu.io.fasta import read_fasta
    from evo_tpu.parallel.distributed import (
        allgather_to_all_hosts, global_batch_from_local, split_for_process)
    from evo_tpu.parallel.mesh import make_mesh
    from evo_tpu.parallel.sharding import shard_params
    from evo_tpu.scoring import logits_to_logprobs, prepare_batch
    from evo_tpu.tokenizer import CharLevelTokenizer

    cfg = tiny_config()
    tok = CharLevelTokenizer(cfg.vocab_size)
    params = model_lib.init_params(jax.random.PRNGKey(0), cfg)
    mesh = make_mesh(dp=2, tp=4)          # dp groups == process boundaries
    sharded = shard_params(params, cfg, mesh)

    names, seqs = read_fasta(args.fasta)
    local_seqs = split_for_process(seqs)
    ids, lengths = prepare_batch(local_seqs, tok, prepend_bos=True)
    # all hosts must contribute the same (B_local, L): pad to a fixed L
    L = 48
    assert ids.shape[1] <= L, ids.shape
    ids = np.concatenate(
        [ids, np.full((ids.shape[0], L - ids.shape[1]), tok.pad_id,
                      np.int32)], axis=1)
    lengths = np.asarray(lengths, np.int32)

    gids = global_batch_from_local(ids, mesh)
    glens = jax.make_array_from_process_local_data(
        NamedSharding(mesh, P('dp')), lengths)

    @jax.jit
    def score(params, ids, lengths):
        logits = model_lib.forward(params, cfg, ids, mesh=mesh)
        lp = logits_to_logprobs(logits, ids, trim_bos=True)   # (B, L-1)
        mask = jnp.arange(lp.shape[1])[None, :] < lengths[:, None]
        return jnp.sum(lp * mask, axis=1) / lengths

    merged = np.asarray(allgather_to_all_hosts(score(sharded, gids, glens)))
    assert merged.shape == (len(seqs),), merged.shape

    # oracle: this process's slice recomputed unsharded on one host
    local_logits = model_lib.forward(params, cfg, jnp.asarray(ids))
    local_lp = np.asarray(logits_to_logprobs(local_logits, ids))
    want = np.array([local_lp[i, :lengths[i]].mean()
                     for i in range(len(local_seqs))], np.float32)
    off = args.process_id * len(local_seqs)
    np.testing.assert_allclose(merged[off:off + len(want)], want,
                               rtol=2e-4, atol=2e-4)

    if jax.process_index() == 0:
        out = Path(args.work_dir) / 'scores.tsv'
        with open(out, 'w') as f:
            for name, s in zip(names, merged):
                f.write(f'{name}\t{s:.6f}\n')
    print(f'proc {args.process_id}: score mode OK', flush=True)


def _mode_sharded(args) -> None:
    import time

    import jax

    from evo_tpu.parallel.distributed import score_fasta_sharded

    calls_log = Path(args.work_dir) / f'calls_p{args.process_id}.log'

    def score_fn(batch):
        with open(calls_log, 'a') as f:
            f.write(f'{len(batch)}\n')
        if args.mode == 'crash' and calls_log.read_text().count('\n') > 1:
            # simulated preemption as the second shard starts. Rendezvous
            # on the PEER's first-shard done-marker before dying so the
            # post-crash state is deterministic (exactly shards 0 and 2
            # done) — once either process exits, the coordination service
            # may kill the other at any moment.
            peer_first_shard = 2 if args.process_id == 0 else 0
            marker = Path(args.work_dir) / f'shard_{peer_first_shard}.done'
            for _ in range(600):
                if marker.exists():
                    break
                time.sleep(0.1)
            # grace period: the peer wrote that marker moments ago and is
            # about to log its own second call — don't trigger the
            # coordination-service kill before that line lands
            time.sleep(0.5)
            os._exit(17)
        return [float(len(s)) for s in batch]

    out = score_fasta_sharded(args.fasta, args.work_dir, score_fn,
                              num_shards=4, batch_size=4)
    if jax.process_index() == 0:
        assert out is not None and Path(out).exists()
    else:
        assert out is None
    print(f'proc {args.process_id}: {args.mode} mode OK', flush=True)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument('--coordinator', required=True)
    ap.add_argument('--num-processes', type=int, default=2)
    ap.add_argument('--process-id', type=int, required=True)
    ap.add_argument('--fasta', required=True)
    ap.add_argument('--work-dir', required=True)
    ap.add_argument('--mode', choices=['score', 'crash', 'resume'],
                    required=True)
    args = ap.parse_args()
    _init(args)
    if args.mode == 'score':
        _mode_score(args)
    else:
        _mode_sharded(args)


if __name__ == '__main__':
    sys.exit(main())
