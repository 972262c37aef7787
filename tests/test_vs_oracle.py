"""End-to-end engine vs scalar oracle — the correctness bar
(SURVEY.md §0.3, §4.2 oracle tests).  Every configuration axis is exercised:
k small/large, canonical, dense/sparse tables, hist algorithms, adversarial
chunk geometry, N/lowercase/IUPAC noise, multi-record edge cases."""

import io
import os

import numpy as np
import pytest

from conftest import random_dna
from findkmer_tpu.config import Config
from findkmer_tpu.io.fasta import FastaReader, read_records
from findkmer_tpu import pipeline
from findkmer_tpu.ops.window import code_to_str
from oracle.scalar import count_fasta_file, count_kmers_in_records


def spectrum_to_dict(spectrum, k):
    """Engine spectrum (dense array or sparse tuple) -> {kmer_str: count}."""
    if isinstance(spectrum, tuple):
        codes, counts = spectrum
        return {
            code_to_str(int(c), k): int(n) for c, n in zip(codes, counts)
        }
    counts = np.asarray(spectrum)
    (nz,) = np.nonzero(counts)
    return {code_to_str(int(i), k): int(counts[i]) for i in nz}


def count_text(text, cfg):
    """Run the full pipeline on in-memory FASTA text."""
    from findkmer_tpu.models.counter import KmerCounter

    counter = KmerCounter(cfg)
    state = counter.init_state()
    reader = FastaReader(io.BytesIO(text.encode()))
    stats = pipeline.StreamStats()
    for rows in pipeline.batches_from_codes(
        pipeline.code_stream(reader, stats=stats), cfg, stats=stats
    ):
        state = counter.step(state, rows)
    return counter.finalize(state), stats


def oracle_dict(text, k, canonical=False):
    from oracle.scalar import parse_fasta_text

    return count_kmers_in_records(
        (s for _, s in parse_fasta_text(text)), k, canonical=canonical
    )


def check(text, cfg):
    spectrum, _ = count_text(text, cfg)
    got = spectrum_to_dict(spectrum, cfg.k)
    want = oracle_dict(text, cfg.k, cfg.canonical)
    assert got == want


# ---------------------------------------------------------------- dense
@pytest.mark.parametrize("k", [1, 2, 4, 8, 11])
def test_dense_random(rng, k):
    seq = random_dna(rng, 5000, n_prob=0.02, lower_prob=0.1, iupac_prob=0.01)
    check(">r\n" + seq + "\n", Config(k=k, chunk_len=256, batch_rows=4))


@pytest.mark.parametrize("hist", ["scatter", "sort", "onehot"])
def test_dense_hist_methods(rng, hist):
    seq = random_dna(rng, 3000, n_prob=0.05)
    check(">r\n" + seq + "\n", Config(k=6, hist=hist, chunk_len=128, batch_rows=2))


def test_dense_canonical(rng):
    seq = random_dna(rng, 4000, n_prob=0.02)
    check(">r\n" + seq + "\n", Config(k=7, canonical=True, chunk_len=200, batch_rows=3))


# --------------------------------------------------------------- sparse
@pytest.mark.parametrize("k", [16, 17, 21, 31])
def test_sparse_random(rng, k):
    seq = random_dna(rng, 3000, n_prob=0.02, lower_prob=0.05)
    cfg = Config(
        k=k, chunk_len=256, batch_rows=2, sparse_capacity=8192,
    )
    check(">r\n" + seq + "\n", cfg)


def test_sparse_canonical(rng):
    seq = random_dna(rng, 2500, n_prob=0.01)
    cfg = Config(
        k=21, canonical=True, chunk_len=250, batch_rows=2,
        sparse_capacity=8192,
    )
    check(">r\n" + seq + "\n", cfg)


def test_sparse_small_k_matches_dense(rng):
    seq = random_dna(rng, 2000, n_prob=0.03)
    text = ">r\n" + seq + "\n"
    dense, _ = count_text(text, Config(k=9, chunk_len=128, batch_rows=2))
    sparse, _ = count_text(
        text,
        Config(k=9, table_mode="sparse", chunk_len=128, batch_rows=2,
               sparse_capacity=8192),
    )
    assert spectrum_to_dict(dense, 9) == spectrum_to_dict(sparse, 9)


# ------------------------------------------------------ chunk adversaries
@pytest.mark.parametrize("chunk_len", [16, 17, 31, 64])
@pytest.mark.parametrize("batch_rows", [1, 2, 5])
def test_chunk_geometry_invariance(rng, chunk_len, batch_rows):
    """chunked(seq, any geometry) == oracle: windows at chunk joints are
    counted exactly once (SURVEY.md §7 hard part 2)."""
    seq = random_dna(rng, 1000, n_prob=0.05)
    cfg = Config(k=8, chunk_len=chunk_len, batch_rows=batch_rows)
    check(">r\n" + seq + "\n", cfg)


def test_n_straddles_chunk_joint(rng):
    # place Ns exactly at chunk boundaries
    L = 32
    seq = list(random_dna(rng, 400))
    for pos in (L - 1, L, L + 1, 2 * L, 3 * L - 1):
        seq[pos] = "N"
    cfg = Config(k=8, chunk_len=L, batch_rows=2)
    check(">r\n" + "".join(seq) + "\n", cfg)


def test_record_boundary_inside_halo(rng):
    # records shorter than k and shorter than chunk_len, back to back
    text = "".join(
        f">r{i}\n{random_dna(rng, n)}\n"
        for i, n in enumerate([3, 8, 1, 0, 40, 7, 8, 100])
    )
    cfg = Config(k=8, chunk_len=16, batch_rows=2)
    check(text, cfg)


def test_chunk_smaller_than_seq_padding(rng):
    # last batch partially filled; trailing rows fully INVALID
    seq = random_dna(rng, 100)
    cfg = Config(k=5, chunk_len=64, batch_rows=8)
    check(">r\n" + seq + "\n", cfg)


# ------------------------------------------------------------- fixtures
@pytest.mark.parametrize("k", [4, 8])
def test_fixture_files(fixtures_dir, k):
    for name in ("tiny.fa", "multi.fa", "debruijn4.fa"):
        path = os.path.join(fixtures_dir, name)
        cfg = Config(k=k, chunk_len=128, batch_rows=4)
        stats = pipeline.StreamStats()
        spectrum = pipeline.count_file(path, cfg, stats=stats)
        got = spectrum_to_dict(spectrum, k)
        want = count_kmers_in_records(
            [s.decode() for _, s in read_records(path)], k
        )
        assert got == want


def test_ecoli_fragment(fixtures_dir):
    path = os.path.join(fixtures_dir, "ecoli_frag.fa")
    cfg = Config(k=4, chunk_len=1024, batch_rows=8)
    spectrum = pipeline.count_file(path, cfg)
    got = spectrum_to_dict(spectrum, 4)
    want = count_fasta_file(path, 4)
    assert got == want
    # conservation: sum == windows
    assert sum(got.values()) == 50000 - 4 + 1


# ------------------------------------------------------------ properties
def test_total_window_conservation(rng):
    """Sum(counts) == sum over valid runs of max(0, run_len - k + 1)."""
    k = 6
    seq = random_dna(rng, 2000, n_prob=0.1)
    spectrum, _ = count_text(
        ">r\n" + seq + "\n", Config(k=k, chunk_len=100, batch_rows=3)
    )
    total = int(np.asarray(spectrum).sum())
    runs, cur = [], 0
    for ch in seq:
        if ch in "ACGT":
            cur += 1
        else:
            runs.append(cur)
            cur = 0
    runs.append(cur)
    want = sum(max(0, r - k + 1) for r in runs)
    assert total == want


def test_record_permutation_invariance(rng):
    recs = [random_dna(rng, n) for n in (100, 57, 23, 200)]
    text_a = "".join(f">r{i}\n{s}\n" for i, s in enumerate(recs))
    text_b = "".join(f">r{i}\n{s}\n" for i, s in enumerate(reversed(recs)))
    cfg = Config(k=5, chunk_len=64, batch_rows=2)
    sa, _ = count_text(text_a, cfg)
    sb, _ = count_text(text_b, cfg)
    np.testing.assert_array_equal(np.asarray(sa), np.asarray(sb))
