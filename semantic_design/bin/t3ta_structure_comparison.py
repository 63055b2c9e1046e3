"""RNA secondary-structure similarity search CLI.

Functional parity with reference
`semantic_design/bin/t3ta_structure_comparison.py` — identical CLI flags
and output-CSV schema, the same staged search (cheap structural-property
prefilter -> structural-motif Jaccard -> feature-vector cosine -> exact
base-pair Jaccard scored 0.7*structure + 0.3*MFE) — reimplemented compactly
with plain set arithmetic (no sklearn) and process-pool parallelism.

Usage:
    python -m semantic_design.bin.t3ta_structure_comparison \
        --query q.csv --target t.csv --output hits.csv \
        [--structure-type both] [--min-similarity 0.7] ...
"""

from __future__ import annotations

import argparse
import ast
import math
import os
from concurrent.futures import ProcessPoolExecutor
from typing import Any, Dict, List, Optional, Sequence, Set, Tuple

import numpy as np


# ---------------------------------------------------------------------------
# Structure descriptors
# ---------------------------------------------------------------------------

def parse_hairpins(value: Any) -> List[Tuple[int, int, int, int]]:
    if value is None or (isinstance(value, float) and math.isnan(value)):
        return []
    if isinstance(value, list):
        return value
    text = str(value).strip()
    if not text or text == '[]':
        return []
    try:
        return ast.literal_eval(text)
    except (ValueError, SyntaxError):
        return []


def _runs(structure: str):
    """Yield (char, run_length) for consecutive runs in the structure."""
    if not structure:
        return
    prev, count = structure[0], 1
    for ch in structure[1:]:
        if ch == prev:
            count += 1
        else:
            yield prev, count
            prev, count = ch, 1
    yield prev, count


def extract_structure_features(structure: Any, mfe: Any,
                               hairpins: Any) -> np.ndarray:
    """10-dim numeric descriptor of a dot-bracket structure (same features
    as the reference: length, pairs, pairing ratio, stem/loop stats, MFE,
    MFE/nt, hairpin count)."""
    if structure is None or (isinstance(structure, float)
                             and math.isnan(structure)) or not structure:
        return np.zeros(10)
    s = str(structure)
    n = len(s)
    pairs = s.count('(')
    stems = [c for ch, c in _runs(s) if ch in '()']
    loops = [c for ch, c in _runs(s) if ch == '.']
    try:
        mfe_val = float(mfe)
        if math.isnan(mfe_val):
            mfe_val = 0.0
    except (TypeError, ValueError):
        mfe_val = 0.0
    return np.array([
        n, pairs, pairs / n if n else 0.0,
        float(np.mean(stems)) if stems else 0.0,
        float(np.mean(loops)) if loops else 0.0,
        float(max(stems)) if stems else 0.0,
        len(stems), mfe_val, mfe_val / n if n else 0.0,
        len(parse_hairpins(hairpins)),
    ])


def extract_structural_motifs(structure: str) -> Set[str]:
    """Motif vocabulary: STEM_n / HAIRPIN_stem:loop for each (-run . -run
    )-run triple, BULGE for interrupted stems, DEPTH_max nesting, and
    UNPAIRED_len (capped at 10) for unpaired runs >= 3."""
    if not structure:
        return set()
    motifs: Set[str] = set()
    runs = list(_runs(structure))
    for i, (ch, count) in enumerate(runs):
        if ch != '(':
            continue
        j = i + 1
        loop = 0
        if j < len(runs) and runs[j][0] == '.':
            loop = runs[j][1]
            j += 1
        if j < len(runs) and runs[j][0] == ')':
            close = runs[j][1]
            if loop == 0:
                motifs.add(f'STEM_{min(count, close)}')
            else:
                motifs.add(f'HAIRPIN_{min(count, close)}:{loop}')
    # bulges: balanced spans containing dots between multiple stem runs
    depth = 0
    max_depth = 0
    span_opens = span_dots = 0
    span_stem_runs = 0
    prev = ''
    for ch in structure:
        if ch == '(':
            depth += 1
            max_depth = max(max_depth, depth)
            span_opens += 1
            if prev != '(':
                span_stem_runs += 1
        elif ch == ')':
            depth -= 1
            if depth == 0 and span_opens:
                if span_dots > 0 and span_opens > 1:
                    motifs.add(f'BULGE_{span_opens}:{span_dots}')
                span_opens = span_dots = span_stem_runs = 0
        elif ch == '.' and depth > 0:
            span_dots += 1
        prev = ch
    if max_depth > 0:
        motifs.add(f'DEPTH_{max_depth}')
    for ch, count in _runs(structure):
        if ch == '.' and count >= 3:
            motifs.add(f'UNPAIRED_{min(count, 10)}')
    return motifs


def base_pairs(structure: str) -> Set[Tuple[int, int]]:
    pairs: Set[Tuple[int, int]] = set()
    stack: List[int] = []
    for i, ch in enumerate(structure):
        if ch == '(':
            stack.append(i)
        elif ch == ')' and stack:
            pairs.add((stack.pop(), i))
    return pairs


def base_pair_distance(struct1: str, struct2: str) -> float:
    """1 - Jaccard(base-pair sets); 1.0 for very different lengths."""
    if not struct1 or not struct2:
        return 1.0
    max_len = max(len(struct1), len(struct2))
    if abs(len(struct1) - len(struct2)) / max_len > 0.5:
        return 1.0
    p1, p2 = base_pairs(struct1), base_pairs(struct2)
    if not p1 and not p2:
        return 0.0
    union = len(p1 | p2)
    return 1.0 - len(p1 & p2) / union if union else 1.0


def _quick_score(q: str, t: str) -> float:
    """Length + pairing-ratio prefilter score (reference stage 1)."""
    if not q or not t:
        return 0.0
    len_sim = 1.0 - abs(len(q) - len(t)) / max(len(q), len(t))
    if len_sim < 0.5:
        return 0.0
    q_ratio = q.count('(') / len(q)
    t_ratio = t.count('(') / len(t)
    return 0.6 * len_sim + 0.4 * (1.0 - abs(q_ratio - t_ratio))


def _jaccard(a: Set[str], b: Set[str]) -> float:
    if not a and not b:
        return 0.0
    union = len(a | b)
    return len(a & b) / union if union else 0.0


def _cosine(q: np.ndarray, t: np.ndarray) -> float:
    qn = np.linalg.norm(q) + 1e-8
    tn = np.linalg.norm(t) + 1e-8
    return float(np.dot(q, t) / (qn * tn))


# ---------------------------------------------------------------------------
# Search
# ---------------------------------------------------------------------------

_STRUCT_COLS = {'consensus': 'Consensus', 'full': 'Full'}


class _TargetIndex:
    """Precomputed per-structure-type descriptors for the target table."""

    def __init__(self, target_rows: List[dict], structure_types):
        self.rows = target_rows
        self.structures: Dict[str, List[str]] = {}
        self.motifs: Dict[str, List[Set[str]]] = {}
        self.features: Dict[str, np.ndarray] = {}
        for st in structure_types:
            pref = _STRUCT_COLS[st]
            structs = [str(r.get(f'{pref} Structure') or '')
                       if not _isnan(r.get(f'{pref} Structure')) else ''
                       for r in target_rows]
            self.structures[st] = structs
            self.motifs[st] = [extract_structural_motifs(s) for s in structs]
            self.features[st] = np.stack([
                extract_structure_features(s, r.get(f'{pref} MFE'),
                                           r.get(f'{pref} Hairpins'))
                for s, r in zip(structs, target_rows)])


def _isnan(v) -> bool:
    return isinstance(v, float) and math.isnan(v)


def search_one(query_row: dict, index: _TargetIndex, structure_types,
               min_similarity: float, pre_filter_threshold: float
               ) -> List[dict]:
    """Staged search of one query against all targets (reference
    `optimized_similarity_search` contract and output fields)."""
    results = []
    for st in structure_types:
        pref = _STRUCT_COLS[st]
        q_struct = query_row.get(f'{pref} Structure')
        if not q_struct or _isnan(q_struct):
            continue
        q_struct = str(q_struct)
        q_motifs = extract_structural_motifs(q_struct)
        q_feat = extract_structure_features(
            q_struct, query_row.get(f'{pref} MFE'),
            query_row.get(f'{pref} Hairpins'))
        comp = 'full' if st == 'consensus' else 'consensus'
        comp_pref = _STRUCT_COLS.get(comp, comp.title())

        for ti, t_struct in enumerate(index.structures[st]):
            if not t_struct:
                continue
            t_row = index.rows[ti]
            if str(query_row.get('Root ID')) == str(t_row.get('Root ID')):
                continue
            # stage 1: structural-property prefilter
            if _quick_score(q_struct, t_struct) < 0.3:
                continue
            # stage 2: motif Jaccard
            if _jaccard(q_motifs, index.motifs[st][ti]) < 0.2:
                continue
            # stage 3: feature cosine
            if _cosine(q_feat, index.features[st][ti]) \
                    < pre_filter_threshold:
                continue
            # stage 4: exact base-pair similarity + MFE agreement
            struct_sim = 1.0 - base_pair_distance(q_struct, t_struct)
            if struct_sim < min_similarity:
                continue
            q_mfe, t_mfe = query_row.get(f'{pref} MFE'), \
                t_row.get(f'{pref} MFE')
            try:
                mfe_sim = max(0.0, 1.0 - abs(float(q_mfe) - float(t_mfe))
                              / 10.0)
            except (TypeError, ValueError):
                mfe_sim = 0.0
            combined = 0.7 * struct_sim + 0.3 * mfe_sim
            if combined < min_similarity:
                continue
            # complementary structure comparison (reported, not filtered)
            cq = query_row.get(f'{comp_pref} Structure') or ''
            ct = t_row.get(f'{comp_pref} Structure') or ''
            comp_struct_sim = comp_mfe_sim = comp_combined = 0.0
            if cq and ct and not _isnan(cq) and not _isnan(ct):
                comp_struct_sim = 1.0 - base_pair_distance(str(cq), str(ct))
                try:
                    comp_mfe_sim = max(0.0, 1.0 - abs(
                        float(query_row.get(f'{comp_pref} MFE'))
                        - float(t_row.get(f'{comp_pref} MFE'))) / 10.0)
                except (TypeError, ValueError):
                    comp_mfe_sim = 0.0
                comp_combined = 0.7 * comp_struct_sim + 0.3 * comp_mfe_sim
            results.append({
                'Query_ID': query_row.get('Root ID'),
                'Target_ID': t_row.get('Root ID'),
                'Structure_Type': st,
                'Similarity_Score': combined,
                'Structure_Similarity': struct_sim,
                'MFE_Similarity': mfe_sim,
                'Query_MFE': q_mfe,
                'Target_MFE': t_mfe,
                'Query_Structure': q_struct,
                'Target_Structure': t_struct,
                'Query_Hairpins': query_row.get(f'{pref} Hairpins'),
                'Target_Hairpins': t_row.get(f'{pref} Hairpins'),
                'Complementary_Type': comp,
                'Complementary_Similarity_Score': comp_combined,
                'Complementary_Structure_Similarity': comp_struct_sim,
                'Complementary_MFE_Similarity': comp_mfe_sim,
                'Query_Complementary_Structure': cq,
                'Target_Complementary_Structure': ct,
                'Query_Complementary_MFE':
                    query_row.get(f'{comp_pref} MFE'),
                'Target_Complementary_MFE': t_row.get(f'{comp_pref} MFE'),
                'Query_Complementary_Hairpins':
                    query_row.get(f'{comp_pref} Hairpins', []),
                'Target_Complementary_Hairpins':
                    t_row.get(f'{comp_pref} Hairpins', []),
                'Query_Consensus_RNA': query_row.get('Consensus RNA', ''),
                'Query_Consensus_DNA': query_row.get('Sequence', ''),
                'Query_Full_RNA': query_row.get('Full RNA', ''),
                'Query_Full_DNA': query_row.get('Full TRF Region', ''),
                'Target_Consensus_RNA': t_row.get('Consensus RNA', ''),
                'Target_Consensus_DNA': t_row.get('Sequence', ''),
                'Target_Full_RNA': t_row.get('Full RNA', ''),
                'Target_Full_DNA': t_row.get('Full TRF Region', ''),
            })
    return results


_WORKER_STATE: Dict[str, Any] = {}


def _worker_init(target_rows, structure_types, min_similarity,
                 pre_filter_threshold):
    _WORKER_STATE['index'] = _TargetIndex(target_rows, structure_types)
    _WORKER_STATE['args'] = (structure_types, min_similarity,
                             pre_filter_threshold)


def _worker_search(query_row):
    st, ms, pft = _WORKER_STATE['args']
    return search_one(query_row, _WORKER_STATE['index'], st, ms, pft)


def optimized_structural_search(
    query_csv, target_csv, output_csv,
    structure_type: str = 'both', min_similarity: float = 0.7,
    max_results: Optional[int] = None, n_cpus: Optional[int] = None,
    pre_filter_threshold: float = 0.6, batch_size: int = 100,
):
    """Search every query structure against the target set; write the
    ranked hits CSV. Returns the results DataFrame."""
    import pandas as pd

    structure_types = (['consensus', 'full'] if structure_type == 'both'
                       else [structure_type])
    query_rows = pd.read_csv(query_csv).to_dict('records')
    target_rows = pd.read_csv(target_csv).to_dict('records')
    print(f'Query sequences: {len(query_rows)}; '
          f'targets: {len(target_rows)}')

    if n_cpus is None:
        n_cpus = min(os.cpu_count() or 1, 16)
    all_results: List[dict] = []
    if n_cpus > 1 and len(query_rows) > 8:
        with ProcessPoolExecutor(
                max_workers=n_cpus, initializer=_worker_init,
                initargs=(target_rows, structure_types, min_similarity,
                          pre_filter_threshold)) as ex:
            for hits in ex.map(_worker_search, query_rows,
                               chunksize=max(1, batch_size // n_cpus)):
                all_results.extend(hits)
    else:
        index = _TargetIndex(target_rows, structure_types)
        for row in query_rows:
            all_results.extend(search_one(row, index, structure_types,
                                          min_similarity,
                                          pre_filter_threshold))

    if not all_results:
        print('No matches found above similarity threshold')
        pd.DataFrame().to_csv(output_csv, index=False)
        return pd.DataFrame()
    df = pd.DataFrame(all_results).sort_values('Similarity_Score',
                                               ascending=False)
    if max_results:
        df = df.head(max_results)
    df.to_csv(output_csv, index=False)
    print(f'Matches found: {len(df)}; results saved to {output_csv}')
    return df


def main():
    parser = argparse.ArgumentParser(
        description='RNA structure similarity search')
    parser.add_argument('--query', required=True)
    parser.add_argument('--target', required=True)
    parser.add_argument('--output', required=True)
    parser.add_argument('--structure-type', default='both',
                        choices=['consensus', 'full', 'both'])
    parser.add_argument('--min-similarity', type=float, default=0.7)
    parser.add_argument('--pre-filter-threshold', type=float, default=0.6)
    parser.add_argument('--max-results', type=int)
    parser.add_argument('--cpus', type=int)
    parser.add_argument('--batch-size', type=int, default=100)
    args = parser.parse_args()
    return optimized_structural_search(
        query_csv=args.query, target_csv=args.target,
        output_csv=args.output, structure_type=args.structure_type,
        min_similarity=args.min_similarity, max_results=args.max_results,
        n_cpus=args.cpus, pre_filter_threshold=args.pre_filter_threshold,
        batch_size=args.batch_size)


if __name__ == '__main__':
    main()
