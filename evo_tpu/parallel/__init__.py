"""SPMD parallelism: device meshes, GSPMD shardings, multi-host utilities.

The reference is single-process/single-GPU at inference (SURVEY.md §1); its
engine exposes `model_parallel_size` but ships it pinned to 1.  Here
multi-chip is the first-class path: a (dp, tp) `jax.sharding.Mesh`, Megatron
layouts expressed as `NamedSharding`s over TP-friendly parameter shapes, and
XLA-inserted collectives over ICI (NCCL equivalent per SURVEY.md §2.A N6).
"""

from evo_tpu.parallel.mesh import make_mesh, local_mesh  # noqa: F401
from evo_tpu.parallel.sharding import (  # noqa: F401
    param_shardings, cache_shardings, data_sharding, shard_params,
)
