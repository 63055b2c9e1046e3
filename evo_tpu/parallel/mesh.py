"""Device-mesh construction.

Axes:
  dp — data parallel: FASTA batches sharded across hosts (rides DCN when
       multi-host, SURVEY.md §2.A parallelism table).
  tp — tensor parallel: weights Megatron-sharded across chips (rides ICI).

A `cp` (context/sequence-parallel) axis for 131k prefill composes with these
via `the context-parallel attention ops (evo_tpu.ops.ring_attention / ulysses_attention)` (ring attention / channel-local FFT).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh


def make_mesh(dp: int = 1, tp: Optional[int] = None,
              devices: Optional[Sequence] = None) -> Mesh:
    """Build a (dp, tp) mesh. tp defaults to all-devices/dp; dp=-1 means
    all-devices/tp (auto-scale with slice size).

    Uses `jax.make_mesh` when building from the default device set so the
    logical mesh follows the physical ICI topology (contiguous tp groups).
    """
    # AxisType.Auto = classic GSPMD propagation: the compiler infers
    # intermediate shardings from the annotated params/inputs (jax>=0.9
    # defaults new meshes to Explicit mode, which instead demands
    # out_sharding at every sharded contraction).
    auto = (jax.sharding.AxisType.Auto,) * 2
    if devices is None:
        n = jax.device_count()
        if dp == -1:
            # auto: tp chips per host on ICI, dp = the rest (pod launchers
            # pass -1 so one launch line works on any slice size)
            dp = max(1, n // (tp or n))
        if tp is None:
            tp = n // dp
        if dp * tp != n:
            raise ValueError(f'dp*tp = {dp}*{tp} != device_count {n}')
        return jax.make_mesh((dp, tp), ('dp', 'tp'), axis_types=auto)
    devices = list(devices)
    if dp == -1:
        dp = max(1, len(devices) // (tp or len(devices)))
    if tp is None:
        tp = len(devices) // dp
    if dp * tp != len(devices):
        raise ValueError(f'dp*tp = {dp}*{tp} != len(devices) {len(devices)}')
    return Mesh(np.asarray(devices).reshape(dp, tp), ('dp', 'tp'),
                axis_types=auto)


def local_mesh(dp: int = 1, tp: Optional[int] = None) -> Mesh:
    """Mesh over this process's local devices only (single-host runs)."""
    return make_mesh(dp=dp, tp=tp, devices=jax.local_devices())
