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
                           retry_delay: float = 10.0) -> None:
    """`jax.distributed.initialize` with coordinator retry.

    No-ops when the process is already initialized or when running
    single-process with no coordinator configured (env vars absent).
    """
    # Env guard FIRST, touching no jax state: calling jax.process_count()
    # (or any devices() path) initializes the local XLA backend, after
    # which jax.distributed.initialize unconditionally raises — the guard
    # itself would make multi-host init impossible.
    if coordinator_address is None \
            and 'JAX_COORDINATOR_ADDRESS' not in os.environ \
            and 'COORDINATOR_ADDRESS' not in os.environ:
        return                      # single-process run
    last_err: Optional[Exception] = None
    for attempt in range(retries):
        try:
            jax.distributed.initialize(
                coordinator_address=coordinator_address,
                num_processes=num_processes, process_id=process_id)
            return
        except RuntimeError as e:
            msg = str(e)
            if 'already initialized' in msg:
                return              # idempotent re-entry
            if 'backends are initialized' in msg or \
                    'backends_are_initialized' in msg:
                raise RuntimeError(
                    'initialize_distributed must run before any other jax '
                    'call (the XLA backend is already initialized)') from e
            last_err = e
            time.sleep(retry_delay * (attempt + 1))
        except Exception as e:                        # noqa: BLE001
            last_err = e            # coordinator not up yet etc. — retry
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
                         num_shards: int) -> List[List[str]]:
    """Split a sequence-name list into shards; persist manifest.json."""
    shards = [list(names[i::num_shards]) for i in range(num_shards)]
    path = Path(work_dir)
    path.mkdir(parents=True, exist_ok=True)
    manifest = path / 'manifest.json'
    if manifest.exists():
        # resume: the done-markers are only valid for the sharding they
        # were written under — refuse to silently remix shard membership
        with open(manifest) as f:
            prev = json.load(f)
        if prev.get('num_shards') != num_shards or \
                prev.get('shards') != shards:
            raise ValueError(
                f'{manifest} holds a different sharding (num_shards='
                f'{prev.get("num_shards")} vs {num_shards}, or changed '
                'inputs); clear the work_dir or rerun with the original '
                'settings')
    elif jax.process_index() == 0:
        with open(manifest, 'w') as f:
            json.dump({'num_shards': num_shards, 'shards': shards}, f)
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

    from evo_tpu.io.fasta import read_fasta

    names, seqs = read_fasta(fasta_path)
    pc = jax.process_count()
    num_shards = num_shards or pc
    # shard by record INDEX, not name: FASTA names may repeat, and a
    # name->seq dict would silently score the last duplicate for all
    idx_shards = [list(range(len(names)))[i::num_shards]
                  for i in range(num_shards)]
    write_shard_manifest(work_dir, names, num_shards)
    my_shards = split_for_process(list(range(num_shards)))

    for shard_idx in my_shards:
        if shard_done(work_dir, shard_idx):
            continue
        idxs = idx_shards[shard_idx]
        out_path = Path(work_dir) / f'shard_{shard_idx}.csv'
        with open(out_path, 'w', newline='') as f:
            writer = csv.writer(f)
            writer.writerow(['name', 'score'])
            for i in range(0, len(idxs), batch_size):
                batch_idx = idxs[i:i + batch_size]
                scores = score_fn([seqs[j] for j in batch_idx])
                for j, s in zip(batch_idx, scores):
                    writer.writerow([names[j], s])
        mark_shard_done(work_dir, shard_idx)

    # barrier so host 0 merges only after everyone finished
    if pc > 1:
        from jax.experimental import multihost_utils
        multihost_utils.sync_global_devices('score_fasta_sharded_done')
    if jax.process_index() != 0:
        return None
    merged = Path(work_dir) / 'scores.csv'
    with open(merged, 'w', newline='') as out:
        writer = csv.writer(out)
        writer.writerow(['name', 'score'])
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
                writer.writerows(reader)
    return str(merged)
