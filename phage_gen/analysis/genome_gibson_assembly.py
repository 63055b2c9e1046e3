"""Gibson-assembly fragment design for circular genomes.

Parity with reference `phage_gen/analysis/genome_gibson_assembly.py`:
evaluate every junction of the circular genome as a potential Gibson
overlap (nearest-neighbor melting temperature, GC content, GC clamps,
homopolymer penalties), pick two splits balancing fragment sizes, emit the
two overlapping fragments plus quality metrics per genome, and batch over a
CSV with the same output columns.

The melting temperature reproduces the reference's BioPython
`mt.Tm_NN(seq)` call exactly: the DEFAULT `Tm_NN` table is DNA_NN3
(Allawi & SantaLucia 1997 — NOT the 2004 unified table, which differs on
AA/TT and the initiation terms and shifts Tm by ~1 C, enough to change
junction ranking), 25 nM strand concentrations, 50 mM Na+,
SantaLucia-1998 entropy salt correction. No BioPython dependency needed.

Usage:
    python -m phage_gen.analysis.genome_gibson_assembly \
        --input-csv seqs.csv --output-csv seqs_with_gibson.csv
"""

from __future__ import annotations

import argparse
import math
from typing import Any, Dict, List, Tuple


class GibsonDesignError(ValueError):
    """Gibson assembly design failure (no viable junctions, oversize,
    undecodable bases). Subclasses ValueError for caller compatibility."""


# Allawi & SantaLucia 1997 NN parameters — BioPython MeltingTemp's
# DNA_NN3, the DEFAULT table of the reference's `mt.Tm_NN(seq)` call:
# (dH kcal/mol, dS cal/K/mol)
_NN = {
    'AA': (-7.9, -22.2), 'TT': (-7.9, -22.2),
    'AT': (-7.2, -20.4), 'TA': (-7.2, -21.3),
    'CA': (-8.5, -22.7), 'TG': (-8.5, -22.7),
    'GT': (-8.4, -22.4), 'AC': (-8.4, -22.4),
    'CT': (-7.8, -21.0), 'AG': (-7.8, -21.0),
    'GA': (-8.2, -22.2), 'TC': (-8.2, -22.2),
    'CG': (-10.6, -27.2), 'GC': (-9.8, -24.4),
    'GG': (-8.0, -19.9), 'CC': (-8.0, -19.9),
}
_INIT = (0.0, 0.0)
_INIT_AT = (2.3, 4.1)       # per terminal A or T (DNA_NN3 'init_A/T')
_INIT_GC = (0.1, -2.8)      # per terminal G or C (DNA_NN3 'init_G/C')
_R = 1.987                  # cal/(K mol)


def melting_temperature(sequence: str, dnac1: float = 25.0,
                        dnac2: float = 25.0, na_mm: float = 50.0) -> float:
    """Nearest-neighbor Tm in Celsius (duplex with its complement)."""
    seq = sequence.upper()
    if len(seq) < 2:
        raise GibsonDesignError('sequence too short for NN Tm')
    if any(ch not in 'ACGT' for ch in seq):
        # ambiguity codes (N, ...) make the NN model undefined; raise the
        # per-sequence error type so batch runs skip the row instead of
        # dying before writing any output
        raise GibsonDesignError('non-ACGT base in overlap candidate')
    dh, ds = _INIT
    for terminal in (seq[0], seq[-1]):
        if terminal in 'AT':
            dh += _INIT_AT[0]
            ds += _INIT_AT[1]
        else:
            dh += _INIT_GC[0]
            ds += _INIT_GC[1]
    for i in range(len(seq) - 1):
        pair = seq[i:i + 2]
        if pair not in _NN:
            raise ValueError(f'non-ACGT dinucleotide {pair!r}')
        dh += _NN[pair][0]
        ds += _NN[pair][1]
    # SantaLucia 1998 entropy salt correction
    ds += 0.368 * (len(seq) - 1) * math.log(na_mm / 1000.0)
    k = (dnac1 - dnac2 / 2.0) * 1e-9
    return dh * 1000.0 / (ds + _R * math.log(k)) - 273.15


def check_overlap_quality(sequence: str) -> Dict[str, Any]:
    """Tm, GC content, GC-clamp, and homopolymer issues for one overlap."""
    gc_content = (sequence.count('G') + sequence.count('C')) / len(sequence)
    has_gc_clamp = sequence[0] in 'GC' and sequence[-1] in 'GC'
    problems = []
    homopolymer_penalty = 0
    for base in 'ATCG':
        if base * 6 in sequence:
            problems.append(f'Contains {base}6+ homopolymer')
            homopolymer_penalty += 10
        if base * 4 in sequence:
            problems.append(f'Contains {base}4+ homopolymer')
            homopolymer_penalty += 5
    return {
        'tm': melting_temperature(sequence),
        'gc_content': gc_content,
        'problems': problems,
        'homopolymer_penalty': homopolymer_penalty,
        'has_gc_clamp': has_gc_clamp,
    }


def find_top_overlaps(sequence: str, overlap_length: int = 40,
                      tm_target: float = 65,
                      tm_range: Tuple[float, float] = (60, 75),
                      gc_range: Tuple[float, float] = (0.4, 0.6),
                      top_n: int = 20) -> List[Dict[str, Any]]:
    """Rank every circular junction by Tm/GC/clamp quality."""
    seq_len = len(sequence)
    circular = sequence + sequence[:overlap_length]
    candidates = []
    for i in range(seq_len):
        overlap = circular[i:i + overlap_length]
        metrics = check_overlap_quality(overlap)
        if not (tm_range[0] <= metrics['tm'] <= tm_range[1]):
            continue
        if not (gc_range[0] <= metrics['gc_content'] <= gc_range[1]):
            continue
        if not metrics['has_gc_clamp'] or metrics['problems']:
            continue
        score = (abs(metrics['tm'] - tm_target)
                 + abs(metrics['gc_content'] - 0.5) * 50
                 + metrics['homopolymer_penalty'])
        candidates.append({'position': i, 'overlap': overlap,
                           'tm': metrics['tm'],
                           'gc_content': metrics['gc_content'],
                           'has_gc_clamp': metrics['has_gc_clamp'],
                           'score': score})
    return sorted(candidates, key=lambda c: c['score'])[:top_n]


def select_optimal_splits(sequence: str,
                          top_candidates: List[Dict[str, Any]],
                          target_distance: int = 2500
                          ) -> List[Dict[str, Any]]:
    """Best junction + the partner minimizing fragment-size imbalance."""
    if len(top_candidates) < 2:
        raise GibsonDesignError('Not enough suitable overlap junctions '
                                'found.')
    seq_len = len(sequence)
    best = top_candidates[0]

    def penalty(other):
        frag1 = (other['position'] - best['position']) % seq_len
        frag2 = seq_len - frag1
        return abs(frag1 - target_distance) + abs(frag2 - target_distance)

    second = min(top_candidates[1:], key=penalty)
    return [best, second]


def design_circular_gibson_fragments(
        sequence: str, overlap_length: int = 30, tm_target: float = 65,
        target_distance: int = 2700, max_fragment_length: int = 5000,
        top_n_overlaps: int = 50) -> Dict[str, Any]:
    """Two overlapping fragments covering the circular genome."""
    sequence = sequence.upper()
    seq_len = len(sequence)
    top = find_top_overlaps(sequence, overlap_length=overlap_length,
                            tm_target=tm_target, top_n=top_n_overlaps)
    if not top:
        raise GibsonDesignError('No suitable overlap junctions found.')
    splits = select_optimal_splits(sequence, top,
                                   target_distance=target_distance)
    split1, split2 = sorted([splits[0]['position'], splits[1]['position']])

    def circ(start: int, length: int) -> str:
        # wrap-around slice on the circular genome: a junction within
        # overlap_length of the end must take its overlap from the start
        d = sequence + sequence
        return d[start:start + length]

    fragment_1 = sequence[split1:split2] + circ(split2, overlap_length)
    fragment_2 = sequence[split2:] + sequence[:split1] + \
        circ(split1, overlap_length)
    if max(len(fragment_1), len(fragment_2)) > max_fragment_length:
        raise GibsonDesignError(
            f'Fragments exceed maximum allowed length of '
            f'{max_fragment_length} bp.')
    assert len(fragment_1) + len(fragment_2) - 2 * overlap_length \
        == seq_len
    return {
        'fragment_1': fragment_1,
        'fragment_2': fragment_2,
        'split_1_overlap': splits[0],
        'split_2_overlap': splits[1],
        'overlap_tm_difference': abs(splits[0]['tm'] - splits[1]['tm']),
        'fragment_1_length': len(fragment_1),
        'fragment_2_length': len(fragment_2),
    }


_OUTPUT_COLUMNS = [
    'gibson_fragment1_sequence', 'gibson_fragment2_sequence',
    'gibson_fragment1_len', 'gibson_fragment2_len',
    'gibson_overlap1_sequence', 'gibson_overlap2_sequence',
    'gibson_overlap1_tm', 'gibson_overlap2_tm',
    'gibson_overlap_tm_difference',
    'gibson_overlap1_gc', 'gibson_overlap2_gc',
]


def design_gibson_for_dataframe(input_csv: str, output_csv: str,
                                overlap_length: int = 30,
                                tm_target: float = 65,
                                target_distance: int = 2700,
                                max_fragment_length: int = 5000,
                                top_n_overlaps: int = 50) -> None:
    """Batch Gibson design over a CSV with a 'sequence' column."""
    import pandas as pd

    df = pd.read_csv(input_csv)
    if 'sequence' not in df.columns:
        raise ValueError("Input CSV must contain a 'sequence' column.")
    for col in _OUTPUT_COLUMNS:
        df[col] = None
    for index, row in df.iterrows():
        try:
            r = design_circular_gibson_fragments(
                str(row['sequence']).upper(),
                overlap_length=overlap_length, tm_target=tm_target,
                target_distance=target_distance,
                max_fragment_length=max_fragment_length,
                top_n_overlaps=top_n_overlaps)
        except GibsonDesignError as e:
            print(f'Error processing sequence at index {index}: {e}')
            continue
        df.at[index, 'gibson_fragment1_sequence'] = r['fragment_1']
        df.at[index, 'gibson_fragment2_sequence'] = r['fragment_2']
        df.at[index, 'gibson_fragment1_len'] = r['fragment_1_length']
        df.at[index, 'gibson_fragment2_len'] = r['fragment_2_length']
        df.at[index, 'gibson_overlap1_sequence'] = \
            r['split_1_overlap']['overlap']
        df.at[index, 'gibson_overlap2_sequence'] = \
            r['split_2_overlap']['overlap']
        df.at[index, 'gibson_overlap1_tm'] = r['split_1_overlap']['tm']
        df.at[index, 'gibson_overlap2_tm'] = r['split_2_overlap']['tm']
        df.at[index, 'gibson_overlap_tm_difference'] = \
            r['overlap_tm_difference']
        df.at[index, 'gibson_overlap1_gc'] = \
            r['split_1_overlap']['gc_content']
        df.at[index, 'gibson_overlap2_gc'] = \
            r['split_2_overlap']['gc_content']
    df.to_csv(output_csv, index=False)
    print(f'Gibson assembly data saved to {output_csv}')


def main():
    parser = argparse.ArgumentParser(
        description='Design Gibson assembly fragments for circular genomes')
    parser.add_argument('--input-csv', required=True)
    parser.add_argument('--output-csv', required=True)
    parser.add_argument('--overlap-length', type=int, default=30)
    parser.add_argument('--tm-target', type=float, default=65)
    parser.add_argument('--target-distance', type=int, default=2700)
    parser.add_argument('--max-fragment-length', type=int, default=5000)
    parser.add_argument('--top-n-overlaps', type=int, default=50)
    args = parser.parse_args()
    design_gibson_for_dataframe(
        args.input_csv, args.output_csv,
        overlap_length=args.overlap_length, tm_target=args.tm_target,
        target_distance=args.target_distance,
        max_fragment_length=args.max_fragment_length,
        top_n_overlaps=args.top_n_overlaps)


if __name__ == '__main__':
    main()
