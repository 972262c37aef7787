"""Oracle self-consistency tests (SURVEY.md §4.2 exhaustive micro-cases).

The oracle is the correctness bar for everything else, so it gets its own
closed-form checks first.
"""

import os

from oracle.scalar import (
    canonical_str,
    count_fasta_file,
    count_kmers_in_records,
    count_kmers_in_text,
    revcomp_str,
    spectrum_lines,
)


def test_revcomp():
    assert revcomp_str("ACGT") == "ACGT"
    assert revcomp_str("AAAA") == "TTTT"
    assert revcomp_str("AACG") == "CGTT"
    assert canonical_str("TTTT") == "AAAA"
    assert canonical_str("ACGT") == "ACGT"


def test_acgt_repeat_closed_form():
    # "ACGT"*n has 4n-k+1 windows, cycling through 4 distinct k-mers
    for n in (2, 5, 10):
        for k in (1, 2, 3, 4, 5):
            seq = "ACGT" * n
            c = count_kmers_in_text(seq, k)
            assert sum(c.values()) == 4 * n - k + 1
            assert len(c) == min(4, 4 * n - k + 1)


def test_n_reset():
    c = count_kmers_in_text("ACGTNACGT", 4)
    assert c == {"ACGT": 2}
    c = count_kmers_in_text("ACGNTACG", 4)
    assert c == {"TACG": 1}  # only the post-reset run has 4 valid bases
    c = count_kmers_in_text("ACGNTAC", 4)
    assert c == {}  # no 4 consecutive valid bases anywhere
    c = count_kmers_in_text("ACGT", 5)
    assert c == {}  # shorter than k


def test_case_insensitive():
    assert count_kmers_in_text("acgtACGT", 4) == count_kmers_in_text(
        "ACGTACGT", 4
    )


def test_records_isolated():
    joined = count_kmers_in_text("AAAATTTT", 4)
    split = count_kmers_in_records(["AAAA", "TTTT"], 4)
    assert sum(joined.values()) == 5
    assert sum(split.values()) == 2
    assert split == {"AAAA": 1, "TTTT": 1}


def test_canonical_totals_match():
    seq = "ACGTTGCANNACGTACGT"
    plain = count_kmers_in_text(seq, 4)
    canon = count_kmers_in_text(seq, 4, canonical=True)
    assert sum(plain.values()) == sum(canon.values())
    # canonical spectrum = fold of plain spectrum
    folded = {}
    for kmer, n in plain.items():
        folded[canonical_str(kmer)] = folded.get(canonical_str(kmer), 0) + n
    assert folded == canon


def test_debruijn_fixture(fixtures_dir):
    c = count_fasta_file(os.path.join(fixtures_dir, "debruijn4.fa"), 4)
    assert len(c) == 256
    assert set(c.values()) == {1}


def test_spectrum_lines_order():
    c = {"TTTT": 2, "AAAA": 1}
    lines = spectrum_lines(c, 4)
    assert lines == ["AAAA\t1", "TTTT\t2"]
    z = spectrum_lines(c, 4, zeros=True)
    assert len(z) == 256
    assert z[0] == "AAAA\t1" and z[-1] == "TTTT\t2"
    assert z[1] == "AAAC\t0"


def test_fasta_parsing(fixtures_dir):
    c = count_fasta_file(os.path.join(fixtures_dir, "tiny.fa"), 4)
    # t1: ACGTACGTNNACGT -> ACGT x2 + CGTA, GTAC, TACG; reset; ACGT x1
    # t2: acgtACGT -> ACGT x2 + CGTA, GTAC, TACG
    assert c["ACGT"] == 5
    assert c["CGTA"] == 2
    assert sum(c.values()) == 6 + 5
