"""Mutation-type analysis tests: GenBank CDS parsing (joins, complement,
gene-name heuristics), codon-aware substitution classification, indel run
counting, and the offline self-test."""

import pytest

from phage_gen.analysis import mutation_type_analysis as mta


def test_parse_location():
    spans, strand = mta._parse_location('1..15')
    assert spans == [(0, 15)] and strand == 1
    spans, strand = mta._parse_location('complement(5..10)')
    assert spans == [(4, 10)] and strand == -1
    spans, strand = mta._parse_location('join(1..3,7..9)')
    assert spans == [(0, 3), (6, 9)] and strand == 1
    spans, _ = mta._parse_location('<1..>15')
    assert spans == [(0, 15)]


def test_gene_name_heuristics():
    assert mta._gene_from_qualifiers({'gene': 'A*'}) == 'A*'
    assert mta._gene_from_qualifiers({'product': 'major spike protein'}) \
        == 'G'
    assert mta._gene_from_qualifiers({'product': 'gene H protein'}) == 'H'
    assert mta._gene_from_qualifiers({'product': 'gpJ'}) == 'J'
    assert mta._gene_from_qualifiers({'product': 'replicase'}) is None


def test_parse_genbank_cds():
    gb = '\n'.join([
        'LOCUS       X 12 bp DNA',
        'FEATURES             Location/Qualifiers',
        '     source          1..12',
        '     CDS             join(1..3,7..9)',
        '                     /gene="D"',
        '     CDS             complement(4..6)',
        '                     /product="protein E"',
        'ORIGIN',
        '        1 atgaaacccg gg',
        '//',
    ])
    seq, feats = mta.parse_genbank_cds(gb)
    assert seq == 'ATGAAACCCGGG'
    assert len(feats) == 2
    assert feats[0].gene == 'D' and feats[0].positions == [0, 1, 2, 6, 7, 8]
    assert feats[1].gene == 'E' and feats[1].strand == -1


def test_classify_substitution_strand_aware():
    # CDS on the minus strand: genome ATGAAA..., CDS complement(1..6)
    # genome codons read reverse-complemented
    seq = 'ATGAAA'
    feats = [mta.CdsFeature('A', [(0, 6)], -1)]
    pos_map = mta.build_cds_map(seq, feats)
    # substitution at genome pos 0 A->G: rc codon changes
    counts = mta.classify_mutations('GTGAAA', seq, pos_map)
    assert counts['A']['nonsynonymous'] + counts['A']['synonymous'] == 1


def test_overlapping_genes_count_twice():
    seq = 'ATGAAACCC'
    feats = [mta.CdsFeature('A', [(0, 9)], 1),
             mta.CdsFeature('B', [(0, 9)], 1)]
    pos_map = mta.build_cds_map(seq, feats)
    counts = mta.classify_mutations('ATGAAACCA', seq, pos_map)
    # CCC->CCA is synonymous (Pro) in both overlapping genes
    assert counts['A']['synonymous'] == 1
    assert counts['B']['synonymous'] == 1


def test_indel_run_counts_once():
    seq = 'ATGAAACCCTTT'
    feats = [mta.CdsFeature('A', [(0, 12)], 1)]
    pos_map = mta.build_cds_map(seq, feats)
    # one 3-bp gap run -> one indel
    counts = mta.classify_mutations('ATG---CCCTTT', seq, pos_map)
    assert counts['A']['indel'] == 1


def test_self_test_passes():
    assert mta.run_test()
