"""Runtime debug / tracing / observability controls (SURVEY.md §5).

The reference has only ad-hoc `torch.cuda.memory_allocated` prints under a
`verbose` flag (`evo/generation.py:122-124, 201-202`) and no profiler
integration. Here the TPU-native equivalents are first-class:

  * `configure(...)`    — one call to set the jit escape hatches
    (`jax_debug_nans`, `jax_disable_jit`), the persistent compilation
    cache, and default matmul precision;
  * `trace(...)`        — context manager around `jax.profiler` trace
    capture (used by `bench.py --profile`);
  * `device_memory_report()` — per-device HBM usage string (the
    `memory_allocated` analogue printed by generation's verbose mode);
  * `log(...)`          — structured per-host logging: every line carries
    the process index so interleaved multi-host output stays attributable
    (host 0 prints by default, others opt in — the single-controller
    illusion of SURVEY.md §7 hard part #5).
"""

from __future__ import annotations

import contextlib
import sys
from typing import Optional

import jax


def configure(*, debug_nans: Optional[bool] = None,
              disable_jit: Optional[bool] = None,
              compilation_cache_dir: Optional[str] = None,
              highest_matmul_precision: Optional[bool] = None) -> None:
    """Set global jax debug/runtime flags. Only touches what is passed."""
    if debug_nans is not None:
        jax.config.update('jax_debug_nans', debug_nans)
    if disable_jit is not None:
        jax.config.update('jax_disable_jit', disable_jit)
    if compilation_cache_dir is not None:
        jax.config.update('jax_compilation_cache_dir', compilation_cache_dir)
    if highest_matmul_precision is not None:
        jax.config.update(
            'jax_default_matmul_precision',
            'highest' if highest_matmul_precision else 'default')


@contextlib.contextmanager
def trace(trace_dir: Optional[str]):
    """Capture a jax.profiler trace into `trace_dir` (no-op when None)."""
    if not trace_dir:
        yield
        return
    with jax.profiler.trace(trace_dir):
        yield


def device_memory_report() -> str:
    """One line per device: bytes in use / limit (when the backend reports)."""
    lines = []
    for d in jax.local_devices():
        try:
            stats = d.memory_stats() or {}
        except Exception:       # backends without memory_stats (e.g. CPU)
            stats = {}
        used = stats.get('bytes_in_use')
        limit = stats.get('bytes_limit')
        if used is None:
            lines.append(f'{d.device_kind} {d.id}: n/a')
        else:
            gib = 1024 ** 3
            lim = f'/{limit / gib:.2f}' if limit else ''
            lines.append(f'{d.device_kind} {d.id}: {used / gib:.2f}{lim} GiB')
    return '; '.join(lines)


def log(msg: str, *, all_hosts: bool = False, file=None) -> None:
    """Per-host structured print. Host 0 only unless `all_hosts`."""
    idx = jax.process_index()
    if idx == 0 or all_hosts:
        print(f'[host {idx}] {msg}', file=file or sys.stdout, flush=True)
