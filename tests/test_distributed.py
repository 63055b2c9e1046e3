"""Multi-host utility tests (single process, 8 virtual devices): per-host
batch assembly, allgather, shard manifests, and restartable sharded
scoring."""

import numpy as np
import pytest

from evo_tpu.io.fasta import write_fasta
from evo_tpu.parallel import distributed as dist
from evo_tpu.parallel.mesh import make_mesh


def test_split_for_process():
    items = list(range(10))
    assert dist.split_for_process(items, 0, 3) == [0, 1, 2, 3]
    assert dist.split_for_process(items, 1, 3) == [4, 5, 6, 7]
    assert dist.split_for_process(items, 2, 3) == [8, 9]


def test_global_batch_and_allgather():
    mesh = make_mesh(dp=2, tp=4)
    local = np.arange(12, dtype=np.int32).reshape(4, 3)
    global_arr = dist.global_batch_from_local(local, mesh)
    assert global_arr.shape == (4, 3)       # single process: local == global
    gathered = dist.allgather_to_all_hosts(global_arr)
    np.testing.assert_array_equal(np.asarray(gathered), local)


def test_score_fasta_sharded_restartable(tmp_path):
    fasta = tmp_path / 'seqs.fasta'
    names = [f's{i}' for i in range(7)]
    seqs = ['ACGT' * (i + 1) for i in range(7)]
    write_fasta(str(fasta), names, seqs)
    calls = []

    def score_fn(batch):
        calls.append(len(batch))
        return [float(len(s)) for s in batch]

    out = dist.score_fasta_sharded(str(fasta), str(tmp_path / 'work'),
                                   score_fn, num_shards=3, batch_size=2)
    assert out is not None
    import csv
    with open(out) as f:
        rows = list(csv.DictReader(f))
    assert len(rows) == 7
    by_name = {r['name']: float(r['score']) for r in rows}
    assert by_name['s0'] == 4.0 and by_name['s6'] == 28.0

    # re-run: all shards done -> no new scoring calls
    n_calls = len(calls)
    dist.score_fasta_sharded(str(fasta), str(tmp_path / 'work'), score_fn,
                             num_shards=3, batch_size=2)
    assert len(calls) == n_calls
