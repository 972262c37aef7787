"""Public Python API (findkmer_tpu.count / Spectrum)."""

import os

import findkmer_tpu as fk
from oracle.scalar import count_fasta_file


def test_count_file_api(fixtures_dir):
    path = os.path.join(fixtures_dir, "tiny.fa")
    spec = fk.count(path, 4)
    want = count_fasta_file(path, 4)
    assert spec.to_dict() == want
    assert spec["ACGT"] == want["ACGT"]
    assert spec["TTTT"] == 0
    assert spec.total() == sum(want.values())
    assert spec.distinct() == len(want)


def test_count_sparse_api(fixtures_dir):
    path = os.path.join(fixtures_dir, "tiny.fa")
    spec = fk.count(path, 17, sparse_capacity=4096, chunk_len=64,
                    batch_rows=2)
    want = count_fasta_file(path, 17)
    assert spec.to_dict() == want
    assert spec["A" * 17] == 0


def test_count_text_api():
    spec = fk.count_text(">r\nACGTACGT\n", 4)
    assert spec.to_dict() == {"ACGT": 2, "CGTA": 1, "GTAC": 1, "TACG": 1}


def test_histo(fixtures_dir):
    path = os.path.join(fixtures_dir, "debruijn4.fa")
    spec = fk.count(path, 4)
    h = spec.histo()
    assert h[1] == 256 and h[2:].sum() == 0


def test_spectrum_write_roundtrip(tmp_path, fixtures_dir):
    path = os.path.join(fixtures_dir, "multi.fa")
    spec = fk.count(path, 5, chunk_len=128, batch_rows=2)
    out = tmp_path / "s.tsv"
    spec.write(str(out))
    from findkmer_tpu.spectra import read_spectrum

    assert read_spectrum(str(out)) == spec.to_dict()


def test_canonical_api(fixtures_dir):
    path = os.path.join(fixtures_dir, "ecoli_frag.fa")
    spec = fk.count(path, 5, canonical=True, chunk_len=1024, batch_rows=4)
    want = count_fasta_file(path, 5, canonical=True)
    assert spec.to_dict() == want

def test_count_per_record_api(fixtures_dir):
    """count_per_record yields (header, Spectrum) per record; non-fused
    encode path (use_native_encode=False) exercises batches_from_codes
    per-record slicing."""
    import os

    import findkmer_tpu as fk
    from oracle.scalar import count_kmers_in_text, parse_fasta_text

    path = os.path.join(fixtures_dir, "multi.fa")
    records = parse_fasta_text(open(path).read())
    for fused in (True, False):
        got = list(
            fk.count_per_record(
                path, 4, chunk_len=64, batch_rows=2,
                use_native_encode=fused,
            )
        )
        assert [h for h, _ in got] == [h for h, _ in records]
        for (h, spec), (_, seq) in zip(got, records):
            assert spec.to_dict() == count_kmers_in_text(seq, 4), h


def test_sketch_and_similarity_api(fixtures_dir, tmp_path):
    """fk.sketch_sample / fk.similarity round-trip: sequence-input sketch vs
    spectrum-file sketch, sketch-dict and file comparison, and the
    exact path when neither side is a sketch."""
    import os

    import findkmer_tpu as fk
    from findkmer_tpu import sketch as sketch_mod

    fa = os.path.join(fixtures_dir, "tiny.fa")
    spec_path = str(tmp_path / "t.tsv")
    fk.count(fa, 4).write(spec_path)

    sk_seq = fk.sketch_sample(fa, 4, s=500)
    sk_spec = fk.sketch_sample(spec_path, s=500)
    assert sk_seq["hashes"] == sk_spec["hashes"]

    d = fk.similarity(sk_seq, sk_spec)
    assert d["jaccard"] == 1.0

    sk_file = str(tmp_path / "t.sk.json")
    with open(sk_file, "wb") as f:
        sketch_mod.write_sketch(sk_seq, f)
    d = fk.similarity(sk_file, spec_path)  # mixed file inputs
    assert d["jaccard"] == 1.0

    d = fk.similarity(spec_path, spec_path)  # exact path
    assert d["jaccard"] == 1.0 and "containment_a_in_b" in d


def test_filter_reads_api(tmp_path, fixtures_dir):
    """fk.filter_reads: single-end + paired, both matching the CLI
    semantics (engine-agnostic; host engine on CPU)."""
    import findkmer_tpu as fk

    fq = tmp_path / "r.fastq"
    fq.write_text("@r1\nACGTACGTAC\n+\nIIIIIIIIII\n"
                  "@r2\nGGGGGGGGGG\n+\nJJJJJJJJJJ\n")
    (tmp_path / "spec.tsv").write_text("ACGTA\t3\n")
    kept, seen = fk.filter_reads(
        str(fq), str(tmp_path / "spec.tsv"), str(tmp_path / "out.fq")
    )
    assert (kept, seen) == (1, 2)
    assert "@r1" in (tmp_path / "out.fq").read_text()
    # paired
    r1 = tmp_path / "R1.fq"
    r2 = tmp_path / "R2.fq"
    r1.write_text("@a/1\nACGTA\n+\nIIIII\n@b/1\nGGGGG\n+\nIIIII\n")
    r2.write_text("@a/2\nTTTTT\n+\nIIIII\n@b/2\nCCCCC\n+\nIIIII\n")
    kept, seen = fk.filter_reads(
        (str(r1), str(r2)), str(tmp_path / "spec.tsv"),
        (str(tmp_path / "o1.fq"), str(tmp_path / "o2.fq")), paired=True,
    )
    assert (kept, seen) == (1, 2)
    assert "@a/2" in (tmp_path / "o2.fq").read_text()
    # .gz output is gzip-compressed like the CLI's (round-3 review)
    import gzip

    kept, seen = fk.filter_reads(
        str(fq), str(tmp_path / "spec.tsv"),
        str(tmp_path / "out.fq.gz"),
    )
    assert (kept, seen) == (1, 2)
    with gzip.open(tmp_path / "out.fq.gz", "rb") as f:
        assert b"@r1" in f.read()


def test_expr_api(tmp_path):
    import findkmer_tpu as fk

    (tmp_path / "a.tsv").write_text("AAAA\t3\nACGT\t1\n")
    (tmp_path / "b.tsv").write_text("ACGT\t5\nCCCC\t2\n")
    inputs = {"A": str(tmp_path / "a.tsv"), "B": str(tmp_path / "b.tsv")}
    assert fk.expr("A + B", inputs) == {"AAAA": 3, "ACGT": 6, "CCCC": 2}
    assert fk.expr("A * B", inputs) == {"ACGT": 1}
    assert fk.expr("A - B", inputs) == {"AAAA": 3}
    n = fk.expr("A ~ B", inputs, str(tmp_path / "o.tsv"))
    assert n == 1
    assert (tmp_path / "o.tsv").read_text() == "AAAA\t3\n"
    # canonical: ACGT is its own revcomp; AAAA folds with TTTT
    (tmp_path / "c.tsv").write_text("TTTT\t2\n")
    got = fk.expr("A * C", {"A": str(tmp_path / "a.tsv"),
                            "C": str(tmp_path / "c.tsv")},
                  canonical=True)
    assert got == {"AAAA": 2}


def test_count_config_canonical_not_clobbered(tmp_path, rng):
    """api.count(config=Config(canonical=True)) must produce a
    canonical spectrum — the old canonical=False keyword default
    silently overrode the config (round-5 review)."""
    from conftest import random_dna
    from findkmer_tpu.config import Config

    src = tmp_path / "in.fa"
    src.write_text(f">r\n{random_dna(rng, 500)}\n")
    via_config = fk.count(str(src), 5, config=Config(k=5, canonical=True))
    via_kw = fk.count(str(src), 5, canonical=True)
    assert via_config.to_dict() == via_kw.to_dict()
    plain = fk.count(str(src), 5)
    assert via_config.to_dict() != plain.to_dict()


def test_similarity_canonical_vs_plain_sketch_rejected_early(tmp_path, rng):
    """canonical=True against a non-canonical sketch errors up front
    (the CLI already did; the API used to fail only after sketching
    the whole spectrum side — round-5 review)."""
    from conftest import random_dna

    src = tmp_path / "in.fa"
    src.write_text(f">r\n{random_dna(rng, 400)}\n")
    spec = fk.count(str(src), 5)
    spec_path = tmp_path / "s.tsv"
    spec.write(str(spec_path))
    from findkmer_tpu import sketch as sketch_mod

    sk = sketch_mod.sketch_sequences([str(src)], 5, s=64, canonical=False)
    sk_path = tmp_path / "a.sketch.json"
    with open(sk_path, "wb") as f:
        sketch_mod.write_sketch(sk, f)
    import pytest

    with pytest.raises(ValueError, match="non-canonical"):
        fk.similarity(str(sk_path), str(spec_path), canonical=True)
