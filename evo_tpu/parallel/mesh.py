"""Device-mesh construction.

Axes (outermost to innermost):
  dp — data parallel: FASTA batches sharded across hosts (rides DCN when
       multi-host, SURVEY.md §2.A parallelism table).
  cp — context/sequence parallel: the residual stream's sequence axis is
       sharded across cp for long prefill; Hyena mixers reshard to
       channel-sharded/full-sequence around the conv (communication-free
       conv), attention runs Ulysses/ring/zigzag over this axis
       (SURVEY.md §5 long-context plan). Defaults to 1.
  tp — tensor parallel: weights Megatron-sharded across chips. Innermost
       so tp groups sit on ICI-nearest neighbors.

All meshes are 3-axis; cp=1 meshes behave exactly like the round-1
(dp, tp) meshes (size-1 axes shard nothing).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh

AXES = ('dp', 'cp', 'tp')


def make_mesh(dp: int = 1, tp: Optional[int] = None, cp: int = 1,
              devices: Optional[Sequence] = None) -> Mesh:
    """Build a (dp, cp, tp) mesh. tp defaults to all-devices/(dp*cp);
    dp=-1 means all-devices/(tp*cp) (auto-scale with slice size).

    Uses `jax.make_mesh` when building from the default device set so the
    logical mesh follows the physical ICI topology (contiguous tp groups).
    """
    # AxisType.Auto = classic GSPMD propagation: the compiler infers
    # intermediate shardings from the annotated params/inputs (jax>=0.9
    # defaults new meshes to Explicit mode, which instead demands
    # out_sharding at every sharded contraction).
    auto = (jax.sharding.AxisType.Auto,) * 3
    if devices is None:
        n = jax.device_count()
        if dp == -1:
            # auto: tp*cp chips per host on ICI, dp = the rest (pod
            # launchers pass -1 so one launch line works on any slice size)
            dp = max(1, n // ((tp or n) * cp))
        if tp is None:
            tp = n // (dp * cp)
        if dp * cp * tp != n:
            raise ValueError(
                f'dp*cp*tp = {dp}*{cp}*{tp} != device_count {n}')
        return jax.make_mesh((dp, cp, tp), AXES, axis_types=auto)
    devices = list(devices)
    if dp == -1:
        dp = max(1, len(devices) // ((tp or len(devices)) * cp))
    if tp is None:
        tp = len(devices) // (dp * cp)
    if dp * cp * tp != len(devices):
        raise ValueError(
            f'dp*cp*tp = {dp}*{cp}*{tp} != len(devices) {len(devices)}')
    return Mesh(np.asarray(devices).reshape(dp, cp, tp), AXES,
                axis_types=auto)


def local_mesh(dp: int = 1, tp: Optional[int] = None, cp: int = 1) -> Mesh:
    """Mesh over this process's local devices only (single-host runs)."""
    return make_mesh(dp=dp, tp=tp, cp=cp, devices=jax.local_devices())


def has_cp(mesh: Optional[Mesh]) -> bool:
    """True when `mesh` carries an active (size > 1) context-parallel axis."""
    return (mesh is not None and 'cp' in mesh.axis_names
            and mesh.shape['cp'] > 1)


def channel_axes(mesh: Optional[Mesh]):
    """Mesh axes that shard mixer channels/heads: tp alone on (dp, tp)
    meshes; (tp, cp) when context parallelism is active — inside a mixer
    the sequence axis is gathered, so the cp devices take extra channel
    shards instead of idling."""
    return ('tp', 'cp') if has_cp(mesh) else 'tp'
