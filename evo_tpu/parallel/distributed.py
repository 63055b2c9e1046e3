"""Multi-host execution: distributed init, per-host data sharding, result
merging, and restartable sharded scoring jobs.

The reference scales out at the Slurm level only (array-of-jobs over CPU
pipelines, SURVEY.md §1); the model path is single-GPU. Here multi-host is
in the engine: `jax.distributed` per host, FASTA batches split per process
and assembled into dp-sharded global arrays, per-host logits/scores merged
with `process_allgather` (BASELINE north star: "per-host logits/scores
merged via collectives"), and shard manifests + done-markers so a re-run
resumes where it stopped (the failure-recovery plan of SURVEY.md §5).
"""

from __future__ import annotations

import json
import os
import time
from pathlib import Path
from typing import Callable, Iterable, List, Optional, Sequence

import jax
import numpy as np


def initialize_distributed(coordinator_address: Optional[str] = None,
                           num_processes: Optional[int] = None,
                           process_id: Optional[int] = None,
                           retries: int = 5,
                           retry_delay: float = 10.0) -> bool:
    """`jax.distributed.initialize` with coordinator retry.

    Returns True when multi-host is active afterwards. Always ATTEMPTS
    initialization: on Cloud TPU slices jax auto-detects the cluster
    from the TPU runtime with no env vars set, so an env-var guard here
    would silently disable pods (every host would believe it is process
    0 of 1 and corrupt shared outputs). When nothing is configured and
    no cluster is detected, jax raises the 'coordinator_address should
    be defined' ValueError — that is the normal single-process exit.
    COORDINATOR_ADDRESS / JAX_COORDINATOR_ADDRESS env vars are forwarded
    explicitly (jax itself only reads the latter).
    """
    coordinator_address = (coordinator_address
                           or os.environ.get('JAX_COORDINATOR_ADDRESS')
                           or os.environ.get('COORDINATOR_ADDRESS'))
    explicit = (coordinator_address is not None
                or num_processes is not None)
    # auto-detect only when the environment hints at a managed cluster:
    # unconditional probing would stall single-machine CLI startup on
    # metadata queries (this box has zero egress), while requiring env
    # vars outright would break Cloud TPU pods (which set none of the
    # JAX_* ones — they carry the runtime hints below instead)
    hints = ('TPU_WORKER_HOSTNAMES', 'TPU_WORKER_ID',
             'MEGASCALE_COORDINATOR_ADDRESS', 'CLOUD_TPU_TASK_ID',
             'SLURM_STEP_NODELIST', 'OMPI_MCA_orte_hnp_uri')
    if not explicit and not any(h in os.environ for h in hints):
        return False                # single-process run
    last_err: Optional[Exception] = None
    for attempt in range(retries):
        try:
            jax.distributed.initialize(
                coordinator_address=coordinator_address,
                num_processes=num_processes, process_id=process_id)
            return jax.process_count() > 1
        except ValueError as e:
            if 'coordinator_address' in str(e) and not explicit:
                return False        # no cluster configured or detected
            raise                   # explicit-but-incomplete config:
                                    # unretryable, surface it immediately
        except RuntimeError as e:
            msg = str(e)
            # message texts as of jax 0.9 (jax/_src/distributed.py)
            if 'only be called once' in msg or 'already initialized' in msg:
                return jax.process_count() > 1    # idempotent re-entry
            if 'before any JAX' in msg or 'backend' in msg:
                raise RuntimeError(
                    'initialize_distributed must run before any other jax '
                    'call (the XLA backend is already initialized)') from e
            last_err = e            # coordinator not up yet etc. — retry
        except Exception as e:                        # noqa: BLE001
            last_err = e
        if attempt < retries - 1:
            time.sleep(retry_delay * (attempt + 1))
    raise RuntimeError(
        f'jax.distributed.initialize failed after {retries} attempts'
    ) from last_err


def split_for_process(items: Sequence, process_index: Optional[int] = None,
                      process_count: Optional[int] = None) -> List:
    """This host's contiguous slice of a global work list."""
    pi = jax.process_index() if process_index is None else process_index
    pc = jax.process_count() if process_count is None else process_count
    per = (len(items) + pc - 1) // pc
    return list(items[pi * per:(pi + 1) * per])


def global_batch_from_local(local_ids: np.ndarray, mesh):
    """Assemble per-host token batches into one dp-sharded global array.

    local_ids: this host's (B_local, L) int32 batch. All hosts must pass
    the same L and B_local. Returns a global (B_local * n_hosts, L) array
    sharded over the mesh's dp axis.
    """
    from jax.sharding import NamedSharding, PartitionSpec as P

    sharding = NamedSharding(mesh, P('dp', None))
    return jax.make_array_from_process_local_data(sharding, local_ids)


def allgather_to_all_hosts(x):
    """Gather a (possibly sharded) array to a full copy on every host
    (tiled: per-process pieces concatenate along axis 0, not stacked)."""
    from jax.experimental import multihost_utils

    return multihost_utils.process_allgather(x, tiled=True)


# ---------------------------------------------------------------------------
# Restartable sharded scoring jobs
# ---------------------------------------------------------------------------

def write_shard_manifest(work_dir: str, names: Sequence[str],
                         num_shards: int,
                         fingerprint: Optional[str] = None
                         ) -> List[List[str]]:
    """Split a sequence-name list into shards; persist manifest.json.

    fingerprint: content hash of the inputs (score_fasta_sharded hashes
    the sequences) — done-markers are only valid for the exact inputs
    they were written under, and names alone cannot detect an edited
    FASTA with unchanged headers.
    """
    shards = [list(names[i::num_shards]) for i in range(num_shards)]
    path = Path(work_dir)
    path.mkdir(parents=True, exist_ok=True)
    manifest = path / 'manifest.json'
    meta = {'num_shards': num_shards, 'shards': shards,
            'fingerprint': fingerprint}
    if not manifest.exists() and jax.process_index() == 0:
        # atomic publish: a reader can never observe a partial file
        tmp = path / f'.manifest.{os.getpid()}.tmp'
        with open(tmp, 'w') as f:
            json.dump(meta, f)
        os.replace(tmp, manifest)
    if not manifest.exists():
        # non-zero host on a shared filesystem: wait briefly for host 0's
        # publish (the rename above is atomic, so existence => complete)
        for _ in range(50):
            if manifest.exists():
                break
            time.sleep(0.2)
    if manifest.exists():
        # resume (or freshly published): the done-markers are only valid
        # for the sharding/inputs they were written under — refuse to
        # silently remix shard membership or merge stale scores
        with open(manifest) as f:
            prev = json.load(f)
        if (prev.get('num_shards') != num_shards
                or prev.get('shards') != shards
                or (fingerprint is not None
                    and prev.get('fingerprint') is not None
                    and prev.get('fingerprint') != fingerprint)):
            raise ValueError(
                f'{manifest} holds a different sharding or input '
                f'fingerprint (num_shards={prev.get("num_shards")} vs '
                f'{num_shards}); the inputs or settings changed — clear '
                'the work_dir or rerun with the originals')
    return shards


def shard_done(work_dir: str, shard_idx: int) -> bool:
    return (Path(work_dir) / f'shard_{shard_idx}.done').exists()


def mark_shard_done(work_dir: str, shard_idx: int) -> None:
    (Path(work_dir) / f'shard_{shard_idx}.done').write_text('done\n')


def score_fasta_sharded(
    fasta_path: str,
    work_dir: str,
    score_fn: Callable[[List[str]], List[float]],
    num_shards: Optional[int] = None,
    batch_size: int = 32,
) -> Optional[str]:
    """Score a FASTA across hosts with per-shard checkpointing.

    Each process scores its own shards (scores CSV + done marker per shard;
    already-done shards are skipped on re-run), then host 0 merges all
    shard CSVs into scores.csv. `score_fn(seq_batch) -> scores` is
    typically `lambda b: score_sequences(b, model, tokenizer)`.

    Returns the merged CSV path on process 0, None elsewhere.
    """
    import csv
    import hashlib

    from evo_tpu.io.fasta import read_fasta

    names, seqs = read_fasta(fasta_path)
    pc = jax.process_count()
    num_shards = num_shards or pc
    # shard by record INDEX, not name: FASTA names may repeat, and a
    # name->seq dict would silently score the last duplicate for all
    idx_shards = [list(range(len(names)))[i::num_shards]
                  for i in range(num_shards)]
    h = hashlib.sha1()
    for n, s in zip(names, seqs):
        h.update(n.encode()); h.update(b'\0')
        h.update(s.encode()); h.update(b'\0')
    write_shard_manifest(work_dir, names, num_shards,
                         fingerprint=h.hexdigest())
    my_shards = split_for_process(list(range(num_shards)))

    for shard_idx in my_shards:
        if shard_done(work_dir, shard_idx):
            continue
        idxs = idx_shards[shard_idx]
        out_path = Path(work_dir) / f'shard_{shard_idx}.csv'
        with open(out_path, 'w', newline='') as f:
            writer = csv.writer(f)
            writer.writerow(['index', 'name', 'score'])
            for i in range(0, len(idxs), batch_size):
                batch_idx = idxs[i:i + batch_size]
                scores = score_fn([seqs[j] for j in batch_idx])
                for j, s in zip(batch_idx, scores):
                    writer.writerow([j, names[j], s])
        mark_shard_done(work_dir, shard_idx)

    # barrier so host 0 merges only after everyone finished
    if pc > 1:
        from jax.experimental import multihost_utils
        multihost_utils.sync_global_devices('score_fasta_sharded_done')
    if jax.process_index() != 0:
        return None
    rows = []
    for shard_idx in range(num_shards):
        shard_csv = Path(work_dir) / f'shard_{shard_idx}.csv'
        if not shard_csv.exists():
            # all shards finished (barrier above) — a missing file
            # means work_dir is not a shared filesystem
            raise FileNotFoundError(
                f'{shard_csv} missing after the completion barrier: '
                'work_dir must be on a filesystem shared by all hosts')
        with open(shard_csv) as f:
            reader = csv.reader(f)
            next(reader, None)
            rows.extend(reader)
    rows.sort(key=lambda r: int(r[0]))     # restore input order
    merged = Path(work_dir) / 'scores.csv'
    with open(merged, 'w', newline='') as out:
        writer = csv.writer(out)
        writer.writerow(['index', 'name', 'score'])
        writer.writerows(rows)
    return str(merged)
