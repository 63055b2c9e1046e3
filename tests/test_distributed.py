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


def test_sharded_scoring_duplicate_names(tmp_path):
    """Duplicate FASTA record names must be scored per-record, not
    deduplicated through a name dict."""
    from evo_tpu.io.fasta import write_fasta
    from evo_tpu.parallel.distributed import score_fasta_sharded
    fa = tmp_path / 'dup.fasta'
    write_fasta(str(fa), ['a', 'a', 'b'], ['ACGT', 'TT', 'GGGGGG'])
    out = score_fasta_sharded(str(fa), str(tmp_path / 'wd'),
                              score_fn=lambda batch: [float(len(s))
                                                      for s in batch],
                              num_shards=2, batch_size=2)
    import csv
    with open(out) as f:
        rows = list(csv.reader(f))[1:]
    # merged rows are in original input order (index column)
    assert [(i, n, float(s)) for i, n, s in rows] == [
        ('0', 'a', 4.0), ('1', 'a', 2.0), ('2', 'b', 6.0)]


def test_sharded_scoring_rejects_resharded_resume(tmp_path):
    from evo_tpu.io.fasta import write_fasta
    from evo_tpu.parallel.distributed import score_fasta_sharded
    fa = tmp_path / 'x.fasta'
    write_fasta(str(fa), ['a', 'b', 'c'], ['AC', 'GT', 'CC'])
    wd = str(tmp_path / 'wd')
    score_fasta_sharded(str(fa), wd, score_fn=lambda b: [0.0] * len(b),
                        num_shards=2)
    with pytest.raises(ValueError, match='different sharding'):
        score_fasta_sharded(str(fa), wd, score_fn=lambda b: [0.0] * len(b),
                            num_shards=3)
