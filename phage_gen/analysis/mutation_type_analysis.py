"""Mutation-type analysis: classify differences between query genomes and
their closest annotated relatives.

Parity with reference `phage_gen/analysis/mutation_type_analysis.py`: for
each dataset of PhiX174-like genomes, BLASTn each genome against NCBI nt
(cached XML), fetch annotated GenBank records for the top hits (cached),
align query to hit, and classify every difference by type — synonymous /
nonsynonymous substitutions inside CDS features (codon-aware, strand-aware,
overlapping genes counted per gene), intergenic substitutions, and indels
(contiguous gap runs) — then aggregate per-gene counts across datasets.

Implementation differences: GenBank CDS parsing and pairwise alignment are
dependency-free (own flat-file parser + the vectorized Needleman-Wunsch in
`phage_gen.analysis.alignment`; MAFFT is used instead when available), and
the network steps (NCBI BLAST URL API, Entrez efetch) are optional cached
wrappers so the classification core runs fully offline.

Usage:
    python -m phage_gen.analysis.mutation_type_analysis \
        --dataset name=path.fasta [...] --cache-dir cache/ --out-dir out/
    python -m phage_gen.analysis.mutation_type_analysis --test
"""

from __future__ import annotations

import argparse
import csv
import logging
import os
import re
import shutil
import subprocess
import tempfile
from collections import defaultdict
from pathlib import Path
from typing import Dict, List, Optional, Tuple

from evo_tpu.io.fasta import iter_fasta
from evo_tpu.utils import CODON_TO_AA, reverse_complement
from phage_gen.analysis.alignment import global_align

log = logging.getLogger('mutation_type_analysis')

GENE_ORDER = ['A', 'A*', 'B', 'K', 'C', 'D', 'E', 'J', 'F', 'G', 'H',
              'intergenic']
_GENE_SET = {'A', 'A*', 'B', 'C', 'D', 'E', 'F', 'G', 'H', 'J', 'K'}

GENE_NAME_MAP = {
    'rpoA': 'A', 'gpA': 'A', 'A protein': 'A', 'protein A': 'A',
    'A* protein': 'A*', 'protein A*': 'A*',
    'B protein': 'B', 'protein B': 'B',
    'C protein': 'C', 'protein C': 'C',
    'D protein': 'D', 'protein D': 'D',
    'E protein': 'E', 'protein E': 'E', 'lysis protein': 'E',
    'F protein': 'F', 'protein F': 'F', 'major coat protein': 'F',
    'G protein': 'G', 'protein G': 'G', 'major spike protein': 'G',
    'H protein': 'H', 'protein H': 'H', 'minor spike protein': 'H',
    'J protein': 'J', 'protein J': 'J', 'core protein': 'J',
    'K protein': 'K', 'protein K': 'K',
}


def _translate(codon: str) -> str:
    return CODON_TO_AA.get(codon.upper(), 'X')


# ---------------------------------------------------------------------------
# GenBank flat-file CDS parsing (dependency-free)
# ---------------------------------------------------------------------------

class CdsFeature:
    def __init__(self, gene: Optional[str], spans: List[Tuple[int, int]],
                 strand: int):
        self.gene = gene
        self.spans = spans            # list of (start0, end0-exclusive)
        self.strand = strand

    @property
    def positions(self) -> List[int]:
        out: List[int] = []
        for start, end in self.spans:
            out.extend(range(start, end))
        return out


def _parse_location(loc: str) -> Tuple[List[Tuple[int, int]], int]:
    """GenBank location string -> (0-based spans, strand)."""
    strand = 1
    loc = loc.replace(' ', '')
    if loc.startswith('complement(') and loc.endswith(')'):
        strand = -1
        loc = loc[len('complement('):-1]
    if loc.startswith('join(') and loc.endswith(')'):
        loc = loc[len('join('):-1]
    spans = []
    for part in loc.split(','):
        m = re.match(r'[<>]?(\d+)\.\.[<>]?(\d+)$', part)
        if m:
            spans.append((int(m.group(1)) - 1, int(m.group(2))))
            continue
        m = re.match(r'[<>]?(\d+)$', part)
        if m:                                   # single-base feature
            pos = int(m.group(1)) - 1
            spans.append((pos, pos + 1))
    return spans, strand


def parse_genbank_cds(text: str) -> Tuple[str, List[CdsFeature]]:
    """Minimal GenBank parser -> (sequence, CDS features with genes)."""
    lines = text.splitlines()
    features: List[CdsFeature] = []
    seq_chunks: List[str] = []
    i = 0
    in_features = in_origin = False
    while i < len(lines):
        line = lines[i]
        if line.startswith('FEATURES'):
            in_features = True
            i += 1
            continue
        if line.startswith('ORIGIN'):
            in_features = False
            in_origin = True
            i += 1
            continue
        if in_origin:
            if line.startswith('//'):
                break
            seq_chunks.append(re.sub(r'[\d\s]', '', line))
            i += 1
            continue
        if in_features and len(line) > 5 and line[5] != ' ' \
                and line[:5].strip() == '' and line.strip():
            ftype = line[5:21].strip()
            loc = line[21:].strip()
            i += 1
            # location continuation lines
            while i < len(lines) and lines[i][:21].strip() == '' and \
                    not lines[i].strip().startswith('/') and \
                    lines[i].strip():
                loc += lines[i].strip()
                i += 1
            # qualifiers
            quals: Dict[str, str] = {}
            while i < len(lines) and lines[i][:21].strip() == '' and \
                    lines[i].strip().startswith('/'):
                q = lines[i].strip()[1:]
                i += 1
                while i < len(lines) and lines[i][:21].strip() == '' and \
                        not lines[i].strip().startswith('/') and \
                        lines[i].strip() and not lines[i].startswith(
                            'ORIGIN'):
                    q += ' ' + lines[i].strip()
                    i += 1
                if '=' in q:
                    key, val = q.split('=', 1)
                    quals[key] = val.strip('"')
                else:
                    quals[q] = ''
            if ftype == 'CDS':
                spans, strand = _parse_location(loc)
                gene = _gene_from_qualifiers(quals)
                if spans:
                    features.append(CdsFeature(gene, spans, strand))
            continue
        i += 1
    return ''.join(seq_chunks).upper(), features


def _gene_from_qualifiers(quals: Dict[str, str]) -> Optional[str]:
    """Gene letter from gene/standard_name/product qualifiers (reference
    `get_gene_name` heuristics)."""
    for key in ('gene', 'standard_name', 'product'):
        val = quals.get(key)
        if not val:
            continue
        if val in GENE_NAME_MAP:
            return GENE_NAME_MAP[val]
        up = val.strip().upper()
        if up in _GENE_SET:
            return up
        m = re.search(r'\b(gene\s+)?([A-K]\*?)(?:\s|$)', val, re.IGNORECASE)
        if m and m.group(2).upper() in _GENE_SET:
            return m.group(2).upper()
        m = re.match(r'gp([A-K]\*?)(?:\b|\s|$)', val, re.IGNORECASE)
        if m and m.group(1).upper() in _GENE_SET:
            return m.group(1).upper()
    return None


def build_cds_map(sequence: str, features: List[CdsFeature]):
    """0-based genome position -> list of CDS entries (gene, cds_positions,
    strand); overlapping genes yield multiple entries per position."""
    pos_to_cds = defaultdict(list)
    for feat in features:
        if feat.gene is None:
            continue
        positions = feat.positions
        entry = {'gene': feat.gene, 'cds_positions': positions,
                 'strand': feat.strand,
                 'pos_index': {p: k for k, p in enumerate(positions)}}
        for pos in positions:
            pos_to_cds[pos].append(entry)
    return dict(pos_to_cds)


# ---------------------------------------------------------------------------
# Mutation classification
# ---------------------------------------------------------------------------

def classify_substitution(hit_pos: int, cds_entry, query_aln: str,
                          hit_aln: str, hitpos_to_col: Dict[int, int]
                          ) -> str:
    """Synonymous vs nonsynonymous for one substituted position, by
    comparing the translated codons around it (strand-aware)."""
    positions = cds_entry['cds_positions']
    cds_idx = cds_entry['pos_index'].get(hit_pos)
    if cds_idx is None:
        return 'nonsynonymous'
    codon_start = (cds_idx // 3) * 3
    if codon_start + 3 > len(positions):
        return 'nonsynonymous'                  # partial trailing codon
    hit_codon, query_codon = [], []
    for cpos in positions[codon_start:codon_start + 3]:
        acol = hitpos_to_col.get(cpos)
        if acol is None:
            return 'nonsynonymous'
        h, q = hit_aln[acol], query_aln[acol]
        if h == '-' or q == '-':
            return 'nonsynonymous'              # gap within codon
        hit_codon.append(h)
        query_codon.append(q)
    hc, qc = ''.join(hit_codon), ''.join(query_codon)
    if cds_entry['strand'] == -1:
        hc, qc = reverse_complement(hc), reverse_complement(qc)
    return 'synonymous' if _translate(hc) == _translate(qc) \
        else 'nonsynonymous'


def classify_mutations(query_seq: str, hit_seq: str, pos_to_cds):
    """Classify all differences between aligned query/hit sequences.

    Returns {gene_or_intergenic: {synonymous, nonsynonymous, indel
    [, substitution for intergenic]}}. Contiguous gap runs count as one
    indel per overlapped gene."""
    counts = defaultdict(lambda: {'synonymous': 0, 'nonsynonymous': 0,
                                  'indel': 0})
    aln_len = len(query_seq)
    col_to_hit_pos: List[Optional[int]] = []
    hit_pos = -1
    for col in range(aln_len):
        if hit_seq[col] != '-':
            hit_pos += 1
            col_to_hit_pos.append(hit_pos)
        else:
            col_to_hit_pos.append(None)
    hitpos_to_col = {p: c for c, p in enumerate(col_to_hit_pos)
                     if p is not None}

    in_gap = False
    gap_genes: set = set()
    for col in range(aln_len):
        q, h = query_seq[col], hit_seq[col]
        if q == '-' or h == '-':
            if not in_gap:
                in_gap = True
                gap_genes = set()
            hp = col_to_hit_pos[col]
            if hp is not None:
                entries = pos_to_cds.get(hp)
                if entries:
                    gap_genes.update(e['gene'] for e in entries)
                else:
                    gap_genes.add('intergenic')
            else:
                # insertion relative to hit: assign by upstream context
                for offset in range(1, 20):
                    if col - offset >= 0 and \
                            col_to_hit_pos[col - offset] is not None:
                        near = pos_to_cds.get(col_to_hit_pos[col - offset])
                        if near:
                            gap_genes.update(e['gene'] for e in near)
                        else:
                            gap_genes.add('intergenic')
                        break
                else:
                    gap_genes.add('intergenic')
            continue
        if in_gap:
            for gene in (gap_genes or {'intergenic'}):
                counts[gene]['indel'] += 1
            in_gap = False
        if q != h:
            hp = col_to_hit_pos[col]
            entries = pos_to_cds.get(hp) if hp is not None else None
            if entries:
                for entry in entries:
                    mut = classify_substitution(hp, entry, query_seq,
                                                hit_seq, hitpos_to_col)
                    counts[entry['gene']][mut] += 1
            else:
                counts['intergenic'].setdefault('substitution', 0)
                counts['intergenic']['substitution'] += 1
    if in_gap:
        for gene in (gap_genes or {'intergenic'}):
            counts[gene]['indel'] += 1
    return dict(counts)


# ---------------------------------------------------------------------------
# Alignment (MAFFT if available; built-in NW otherwise)
# ---------------------------------------------------------------------------

def run_pairwise_alignment(query_seq: str, hit_seq: str,
                           cache_dir: Optional[Path] = None,
                           cache_key: Optional[str] = None
                           ) -> Tuple[str, str]:
    if cache_dir and cache_key:
        cache_path = Path(cache_dir) / f'{cache_key}.fasta'
        if cache_path.exists():
            aligned = dict(iter_fasta(str(cache_path)))
            if 'query' in aligned and 'hit' in aligned:
                return aligned['query'].upper(), aligned['hit'].upper()
    if shutil.which('mafft'):
        with tempfile.NamedTemporaryFile('w', suffix='.fasta',
                                         delete=False) as tf:
            tf.write(f'>query\n{query_seq}\n>hit\n{hit_seq}\n')
            path = tf.name
        try:
            result = subprocess.run(['mafft', '--auto', '--thread', '1',
                                     path],
                                    capture_output=True, text=True)
            if result.returncode == 0:
                import io
                aligned = {n: s.upper() for n, s in
                           iter_fasta(io.StringIO(result.stdout))}
                qa, ha = aligned.get('query'), aligned.get('hit')
                if qa and ha:
                    _maybe_cache(cache_dir, cache_key, qa, ha)
                    return qa, ha
        finally:
            Path(path).unlink(missing_ok=True)
    qa, ha, _ = global_align(query_seq.upper(), hit_seq.upper(),
                             match=1, mismatch=-1, gap=-2)
    _maybe_cache(cache_dir, cache_key, qa, ha)
    return qa, ha


def _maybe_cache(cache_dir, cache_key, qa, ha):
    if cache_dir and cache_key:
        Path(cache_dir).mkdir(parents=True, exist_ok=True)
        (Path(cache_dir) / f'{cache_key}.fasta').write_text(
            f'>query\n{qa}\n>hit\n{ha}\n')


def sanitize_filename(name: str) -> str:
    return re.sub(r'[^A-Za-z0-9._-]', '_', name)[:100]


# ---------------------------------------------------------------------------
# Dataset analysis + aggregation
# ---------------------------------------------------------------------------

def analyze_query_against_genbank(query_id: str, query_seq: str,
                                  genbank_text: str,
                                  cache_dir: Optional[Path] = None,
                                  hit_acc: str = ''):
    """Align one query to one annotated GenBank record and classify.

    The alignment cache key includes the hit accession: keying by query id
    alone would silently reuse an alignment against a DIFFERENT hit when
    the hit_map changes between runs."""
    hit_seq, features = parse_genbank_cds(genbank_text)
    pos_to_cds = build_cds_map(hit_seq, features)
    key = sanitize_filename(f'{query_id}__{hit_acc}' if hit_acc
                            else query_id)
    qa, ha = run_pairwise_alignment(
        query_seq, hit_seq, cache_dir,
        cache_key=key if cache_dir else None)
    return classify_mutations(qa, ha, pos_to_cds)


def analyze_dataset(dataset_name: str, fasta_path: str,
                    genbank_dir: str, hit_map: Dict[str, str],
                    cache_dir: Optional[Path] = None) -> List[dict]:
    """Classify every query in the dataset FASTA against its assigned
    (cached) GenBank hit. hit_map: query id -> accession; GenBank records
    live as {accession}.gb under genbank_dir."""
    rows = []
    for name, seq in iter_fasta(fasta_path):
        qid = name.split()[0]
        acc = hit_map.get(qid)
        if not acc:
            log.warning('%s: no hit accession; skipping', qid)
            continue
        gb_path = Path(genbank_dir) / f'{acc}.gb'
        if not gb_path.exists():
            log.warning('%s: GenBank record %s missing', qid, acc)
            continue
        counts = analyze_query_against_genbank(qid, seq,
                                               gb_path.read_text(),
                                               cache_dir, hit_acc=acc)
        for gene, c in counts.items():
            rows.append({'dataset': dataset_name, 'query': qid,
                         'hit': acc, 'gene': gene,
                         'synonymous': c.get('synonymous', 0),
                         'nonsynonymous': c.get('nonsynonymous', 0),
                         'indel': c.get('indel', 0),
                         'intergenic_substitution':
                             c.get('substitution', 0)})
    return rows


def aggregate_results(all_rows: List[dict], out_csv: str) -> None:
    """Write per-gene totals per dataset (reference output schema)."""
    import pandas as pd

    df = pd.DataFrame(all_rows)
    if df.empty:
        df.to_csv(out_csv, index=False)
        return
    agg = df.groupby(['dataset', 'gene'])[
        ['synonymous', 'nonsynonymous', 'indel',
         'intergenic_substitution']].sum().reset_index()
    agg['gene'] = pd.Categorical(agg['gene'], categories=GENE_ORDER,
                                 ordered=True)
    agg = agg.sort_values(['dataset', 'gene'])
    agg.to_csv(out_csv, index=False)


# ---------------------------------------------------------------------------
# NCBI web wrappers (cached; require network)
# ---------------------------------------------------------------------------

def blast_query_ncbi(sequence: str, cache_path: Path,
                     hitlist_size: int = 10) -> str:
    """BLASTn via the NCBI URL API, cached to XML. Requires network."""
    if cache_path.exists():
        return cache_path.read_text()
    import time
    import urllib.parse
    import urllib.request

    put = urllib.request.urlopen(
        'https://blast.ncbi.nlm.nih.gov/Blast.cgi',
        data=urllib.parse.urlencode({
            'CMD': 'Put', 'PROGRAM': 'blastn', 'DATABASE': 'nt',
            'QUERY': sequence, 'HITLIST_SIZE': str(hitlist_size),
        }).encode()).read().decode()
    rid = re.search(r'RID = (\S+)', put).group(1)
    while True:
        time.sleep(20)
        status = urllib.request.urlopen(
            'https://blast.ncbi.nlm.nih.gov/Blast.cgi?CMD=Get&'
            f'FORMAT_OBJECT=SearchInfo&RID={rid}').read().decode()
        if 'Status=READY' in status:
            break
        if 'Status=FAILED' in status or 'Status=UNKNOWN' in status:
            raise RuntimeError(f'BLAST search {rid} failed')
    xml = urllib.request.urlopen(
        'https://blast.ncbi.nlm.nih.gov/Blast.cgi?CMD=Get&'
        f'FORMAT_TYPE=XML&RID={rid}').read().decode()
    cache_path.parent.mkdir(parents=True, exist_ok=True)
    cache_path.write_text(xml)
    return xml


def fetch_genbank_record(accession: str, cache_dir: Path) -> str:
    """Entrez efetch of one GenBank record, cached. Requires network."""
    path = cache_dir / f'{accession}.gb'
    if path.exists():
        return path.read_text()
    import urllib.request
    url = ('https://eutils.ncbi.nlm.nih.gov/entrez/eutils/efetch.fcgi?'
           f'db=nucleotide&id={accession}&rettype=gbwithparts&retmode=text')
    text = urllib.request.urlopen(url).read().decode()
    cache_dir.mkdir(parents=True, exist_ok=True)
    path.write_text(text)
    return text


# ---------------------------------------------------------------------------
# CLI + self-test
# ---------------------------------------------------------------------------

def run_test() -> bool:
    """Offline self-check: classify a synthetic query against a synthetic
    annotated record and verify every mutation class is produced.
    (The reference's run_test BLASTs PhiX174 via the NCBI web API — an
    online oracle; this offline variant checks the classification core.)"""
    hit = 'ATGAAACCCGGGTAA' + 'TTTT' + 'ATGCATCATTAG'
    #      gene X: 0..14            gene Y: 19..30
    gb = '\n'.join([
        'LOCUS       TEST 31 bp DNA linear',
        'FEATURES             Location/Qualifiers',
        '     CDS             1..15',
        '                     /gene="A"',
        '     CDS             20..31',
        '                     /gene="B"',
        'ORIGIN',
        '        1 ' + hit.lower(),
        '//',
    ])
    # query: synonymous AAA->AAG in A, nonsynonymous CAT->GAT in B,
    # one intergenic substitution, one intergenic 1-bp deletion
    # (mutations kept far apart so global-alignment gap placement is
    # unambiguous for the classes being checked)
    query = list(hit)
    query[5] = 'G'            # AAA -> AAG (Lys, synonymous)
    query[22] = 'G'           # CAT -> GAT (His -> Asp, nonsynonymous)
    query[16] = 'G'           # intergenic substitution
    del query[17]             # intergenic deletion (within the T run)
    counts = analyze_query_against_genbank('selftest', ''.join(query), gb)
    ok = (counts.get('A', {}).get('synonymous') == 1
          and counts.get('B', {}).get('nonsynonymous') == 1
          and counts.get('intergenic', {}).get('indel') == 1
          and counts.get('intergenic', {}).get('substitution', 0) >= 1)
    print(f'self-test counts: {counts}')
    print('PASS' if ok else 'FAIL')
    return ok


def main():
    parser = argparse.ArgumentParser(
        description='CDS-aware mutation-type analysis')
    parser.add_argument('--dataset', action='append', default=[],
                        help='name=fasta_path (repeatable)')
    parser.add_argument('--hit-map', default=None,
                        help='CSV with columns query,accession')
    parser.add_argument('--genbank-dir', default='cache/genbank_records')
    parser.add_argument('--cache-dir', default='cache/alignments')
    parser.add_argument('--out-csv', default='mutation_type_counts.csv')
    parser.add_argument('--test', action='store_true')
    args = parser.parse_args()
    logging.basicConfig(level=logging.INFO)
    if args.test:
        raise SystemExit(0 if run_test() else 1)
    hit_map: Dict[str, str] = {}
    if args.hit_map:
        with open(args.hit_map) as f:
            for row in csv.DictReader(f):
                hit_map[row['query']] = row['accession']
    all_rows = []
    for spec in args.dataset:
        name, path = spec.split('=', 1)
        all_rows.extend(analyze_dataset(name, path, args.genbank_dir,
                                        hit_map, Path(args.cache_dir)))
    aggregate_results(all_rows, args.out_csv)
    print(f'Wrote {args.out_csv} ({len(all_rows)} rows)')


if __name__ == '__main__':
    main()
