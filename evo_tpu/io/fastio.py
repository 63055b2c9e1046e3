"""Native FASTA fast path: builds and binds the C++ scanner via ctypes.

`read_fasta_fast(path)` parses genome-scale FASTA files in one native pass
(header spans + packed sequence bytes) — the TPU-side replacement for the
reference stack's reliance on C tooling for data handling (SURVEY.md §2.A
N7). `evo_tpu.io.fasta.read_fasta` uses it transparently when the shared
library builds; the pure-Python parser remains the fallback and the
semantics oracle (tests assert byte-identical outputs).

The library is compiled on first use with the local toolchain
(g++ -O3 -shared -fPIC) and cached next to this module.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import List, Optional, Tuple

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, '_fastio.cpp')
_LIB = os.path.join(_HERE, '_fastio.so')

_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_build_failed = False


def _load() -> Optional[ctypes.CDLL]:
    """Build (once) and load the native library; None if unavailable."""
    global _lib, _build_failed
    if _lib is not None:
        return _lib
    if _build_failed:
        return None
    with _lock:
        if _lib is not None or _build_failed:
            return _lib
        try:
            if not os.path.exists(_LIB) or \
                    os.path.getmtime(_LIB) < os.path.getmtime(_SRC):
                subprocess.run(
                    ['g++', '-O3', '-shared', '-fPIC', '-o', _LIB, _SRC],
                    check=True, capture_output=True)
            lib = ctypes.CDLL(_LIB)
            lib.fastio_scan.restype = ctypes.c_long
            lib.fastio_scan.argtypes = [
                ctypes.c_char_p, ctypes.c_long,
                ctypes.POINTER(ctypes.c_char), ctypes.POINTER(ctypes.c_long),
                ctypes.POINTER(ctypes.c_long), ctypes.POINTER(ctypes.c_long),
                ctypes.c_long]
            lib.fastio_count_records.restype = ctypes.c_long
            lib.fastio_count_records.argtypes = [ctypes.c_char_p,
                                                 ctypes.c_long]
            _lib = lib
        except (subprocess.CalledProcessError, OSError) as e:
            print(f'evo_tpu.io.fastio: native build unavailable ({e}); '
                  'using the pure-Python FASTA parser')
            _build_failed = True
        return _lib


def available() -> bool:
    return _load() is not None


def parse_fasta_bytes(data: bytes) -> Tuple[List[str], List[str]]:
    """Parse a FASTA buffer natively -> (names, seqs).

    Matches the pure-Python parser's observable behavior: full headers sans
    '>', line breaks stripped, interior spaces preserved (EOS semantics),
    leading junk ignored. Raises RuntimeError when the library is missing.
    """
    lib = _load()
    if lib is None:
        raise RuntimeError('native fastio library unavailable')
    n = len(data)
    if n == 0:
        return [], []
    max_records = int(lib.fastio_count_records(data, n)) or 0
    if max_records == 0:
        return [], []
    out_seq = ctypes.create_string_buffer(n)
    name_starts = np.empty(max_records, dtype=np.int64)
    name_ends = np.empty(max_records, dtype=np.int64)
    seq_ends = np.empty(max_records, dtype=np.int64)
    num = int(lib.fastio_scan(
        data, n, out_seq,
        name_starts.ctypes.data_as(ctypes.POINTER(ctypes.c_long)),
        name_ends.ctypes.data_as(ctypes.POINTER(ctypes.c_long)),
        seq_ends.ctypes.data_as(ctypes.POINTER(ctypes.c_long)),
        max_records))
    if num < 0:
        raise RuntimeError('fastio_scan record overflow')
    packed = out_seq.raw
    names, seqs = [], []
    prev = 0
    for i in range(num):
        names.append(
            data[name_starts[i]:name_ends[i]].decode(
                'utf-8', errors='replace').strip())
        end = int(seq_ends[i])
        seqs.append(packed[prev:end].decode('utf-8', errors='replace'))
        prev = end
    return names, seqs


def read_fasta_fast(path: str) -> Tuple[List[str], List[str]]:
    with open(path, 'rb') as f:
        data = f.read()
    if data[:2] == b'\x1f\x8b':          # gzip magic: .fa.gz genome dumps
        import gzip
        data = gzip.decompress(data)
    return parse_fasta_bytes(data)
