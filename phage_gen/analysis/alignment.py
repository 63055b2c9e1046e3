"""Dependency-free sequence-alignment utilities.

Vectorized global (Needleman-Wunsch) alignment with linear gap penalty.
The row recurrence cur[j] = max(diag_or_up[j-1], cur[j-1] + gap) unrolls to
a prefix-maximum — cur[j] = max_k (diag_or_up[k-1] + (j-k)*gap) — so each DP
row is a single `np.maximum.accumulate`, making genome-scale (5-10 kb)
alignments take milliseconds instead of the minutes a scalar DP needs.
Traceback decisions are stored as two per-cell bits.

Also a minimal text-SAM reader (replaces pysam for the competition
analysis): flags, CIGAR-derived reference->query position maps, and NM tags.
"""

from __future__ import annotations

import re
from dataclasses import dataclass
from typing import Dict, Iterator, List, Optional, Tuple

import numpy as np


# ---------------------------------------------------------------------------
# Global alignment
# ---------------------------------------------------------------------------

def global_align(a: str, b: str, match: int = 1, mismatch: int = -1,
                 gap: int = -2,
                 terminal_free: bool = False) -> Tuple[str, str, int]:
    """Needleman-Wunsch with linear gaps -> (aligned_a, aligned_b, score).

    terminal_free=True leaves leading/trailing gaps unpenalized (the
    biotite `align_optimal(terminal_penalty=False)` convention used by the
    reference pipeline's identity filter)."""
    n, m = len(a), len(b)
    if n == 0 or m == 0:
        return '-' * m + a, b + '-' * n, 0 if terminal_free else gap * (n + m)
    av = np.frombuffer(a.upper().encode(), dtype=np.uint8)
    bv = np.frombuffer(b.upper().encode(), dtype=np.uint8)

    prev = (np.zeros(m + 1) if terminal_free
            else np.arange(m + 1) * gap).astype(np.int64)
    # traceback bits: from_left[i, j], diag_ge_up[i, j]
    from_left = np.zeros((n + 1, m + 1), dtype=bool)
    diag_ge_up = np.zeros((n + 1, m + 1), dtype=bool)
    from_left[0, 1:] = True

    last_col = np.zeros(n + 1, dtype=np.int64)
    offsets = np.arange(m + 1) * gap           # j * gap
    for i in range(1, n + 1):
        sub = np.where(bv == av[i - 1], match, mismatch)
        diag = prev[:-1] + sub                  # len m (j-1 indexed)
        up = prev[1:] + gap
        best_du = np.maximum(diag, up)          # (m,)
        # candidates entering from the left chain:
        # cur[j] = max(cur0 + j*gap, max_{k<=j} best_du[k-1] + (j-k)*gap)
        # with free terminal gaps the first COLUMN is free too (leading
        # overhang of `a`); freeing only the first row made alignment
        # asymmetric and penalized a-side overhangs
        cur0 = 0 if terminal_free else prev[0] + gap
        t = np.empty(m + 1, dtype=np.int64)
        t[0] = cur0                             # k = 0 sentinel
        t[1:] = best_du - offsets[1:]           # best_du[k-1] - k*gap
        chain = np.maximum.accumulate(t) + offsets
        cur = np.empty(m + 1, dtype=np.int64)
        cur[0] = cur0
        cur[1:] = np.maximum(best_du, chain[1:])
        from_left[i, 1:] = chain[1:] > best_du
        from_left[i, 0] = False
        diag_ge_up[i, 1:] = diag >= up
        prev = cur
        if terminal_free:
            last_col[i] = cur[m]
    score = int(prev[m])

    # traceback start: with free terminal gaps the alignment may end
    # anywhere on the last row/column (the cheaper endpoint wins)
    end_i, end_j = n, m
    tail_a, tail_b = '', ''
    if terminal_free:
        bi = int(np.argmax(last_col[1:]) + 1)
        bj = int(np.argmax(prev))
        if last_col[bi] >= prev[bj]:
            score = int(last_col[bi])
            end_i, end_j = bi, m
            tail_a, tail_b = a[bi:], '-' * (n - bi)
        else:
            score = int(prev[bj])
            end_i, end_j = n, bj
            tail_a, tail_b = '-' * (m - bj), b[bj:]

    out_a: List[str] = []
    out_b: List[str] = []
    i, j = end_i, end_j
    while i > 0 or j > 0:
        if i == 0:
            out_a.append('-')
            out_b.append(b[j - 1])
            j -= 1
        elif j == 0 or (i > 0 and j > 0 and not from_left[i, j]
                        and not diag_ge_up[i, j]):
            # up move (gap in b)
            out_a.append(a[i - 1])
            out_b.append('-')
            i -= 1
        elif from_left[i, j]:
            out_a.append('-')
            out_b.append(b[j - 1])
            j -= 1
        else:
            out_a.append(a[i - 1])
            out_b.append(b[j - 1])
            i -= 1
            j -= 1
    return (''.join(reversed(out_a)) + tail_a,
            ''.join(reversed(out_b)) + tail_b, score)


def percent_identity(a: str, b: str, mode: str = 'aligned',
                     **align_kwargs) -> float:
    """Global-alignment identity, 0-100.

    mode='aligned': matches / mutually aligned (non-gap) columns.
    mode='not_terminal': biotite's default — matches / all columns
    between the first and last mutually aligned column, so INTERNAL gap
    columns count against identity (an insertion lowers the score) while
    terminal overhangs do not.
    """
    aa, bb, _ = global_align(a, b, **align_kwargs)
    pair_cols = [k for k, (x, y) in enumerate(zip(aa, bb))
                 if x != '-' and y != '-']
    if not pair_cols:
        return 0.0
    matches = sum(1 for x, y in zip(aa, bb)
                  if x != '-' and y != '-' and x == y)
    if mode == 'aligned':
        return matches / len(pair_cols) * 100
    if mode == 'not_terminal':
        span = pair_cols[-1] - pair_cols[0] + 1
        return matches / span * 100
    raise ValueError(f'unknown identity mode {mode!r}')


# ---------------------------------------------------------------------------
# Minimal SAM reader
# ---------------------------------------------------------------------------

_CIGAR_RE = re.compile(r'(\d+)([MIDNSHP=X])')

FLAG_UNMAPPED = 0x4
FLAG_SECONDARY = 0x100
FLAG_SUPPLEMENTARY = 0x800


@dataclass
class SamRead:
    """One SAM alignment line (subset of pysam's AlignedSegment API)."""

    query_name: str
    flag: int
    reference_name: str
    reference_start: int          # 0-based
    mapq: int
    cigar: str
    query_sequence: Optional[str]
    tags: Dict[str, str]

    @property
    def is_unmapped(self) -> bool:
        return bool(self.flag & FLAG_UNMAPPED)

    @property
    def is_secondary(self) -> bool:
        return bool(self.flag & FLAG_SECONDARY)

    @property
    def is_supplementary(self) -> bool:
        return bool(self.flag & FLAG_SUPPLEMENTARY)

    def has_tag(self, name: str) -> bool:
        return name in self.tags

    def get_tag(self, name: str):
        raw = self.tags[name]
        type_char, value = raw.split(':', 1)
        if type_char == 'i':
            return int(value)
        if type_char == 'f':
            return float(value)
        return value

    @property
    def query_alignment_length(self) -> int:
        """Aligned query bases (M/=/X + I consume query within alignment;
        soft clips excluded)."""
        total = 0
        for count, op in _CIGAR_RE.findall(self.cigar):
            if op in 'MI=X':
                total += int(count)
        return total

    def get_aligned_pairs(self, matches_only: bool = False
                          ) -> List[Tuple[Optional[int], Optional[int]]]:
        """(query_pos, ref_pos) pairs from the CIGAR, pysam semantics."""
        pairs: List[Tuple[Optional[int], Optional[int]]] = []
        qpos, rpos = 0, self.reference_start
        for count, op in _CIGAR_RE.findall(self.cigar):
            count = int(count)
            if op in 'M=X':
                for _ in range(count):
                    pairs.append((qpos, rpos))
                    qpos += 1
                    rpos += 1
            elif op in 'IS':
                if not matches_only and op == 'I':
                    for _ in range(count):
                        pairs.append((qpos, None))
                        qpos += 1
                else:
                    qpos += count
            elif op in 'DN':
                if not matches_only and op == 'D':
                    for _ in range(count):
                        pairs.append((None, rpos))
                        rpos += 1
                else:
                    rpos += count
            # H/P consume nothing we track
        return pairs


def iter_sam(path: str) -> Iterator[SamRead]:
    """Yield alignment records from a text SAM file."""
    with open(path) as f:
        for line in f:
            if line.startswith('@'):
                continue
            fields = line.rstrip('\n').split('\t')
            if len(fields) < 11:
                continue
            tags = {}
            for tag_field in fields[11:]:
                parts = tag_field.split(':', 2)
                if len(parts) == 3:
                    tags[parts[0]] = f'{parts[1]}:{parts[2]}'
            seq = fields[9] if fields[9] != '*' else None
            yield SamRead(
                query_name=fields[0], flag=int(fields[1]),
                reference_name=fields[2],
                reference_start=int(fields[3]) - 1, mapq=int(fields[4]),
                cigar=fields[5], query_sequence=seq, tags=tags)
