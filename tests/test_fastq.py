"""FASTQ + gzip input (round-2 capability breadth, VERDICT item 8).

Oracle-diff strategy: every FASTQ test builds the equivalent FASTA
(reads as records) and requires identical spectra — read isolation,
N-masking, and quality-line skipping all fall out of that equality.
"""

import gzip
import io

import numpy as np
import pytest

from conftest import random_dna
from findkmer_tpu.config import Config
from findkmer_tpu.io.fastq import FastqReader, sniff_format
from test_vs_oracle import oracle_dict


def _spectra_equal(path_fastq, text_fasta, k, **cfg_kw):
    from findkmer_tpu import api

    cfg = Config(k=k, chunk_len=64, batch_rows=2, **cfg_kw)
    spec = api.count([str(path_fastq)], k, config=cfg)
    assert spec.to_dict() == {
        kmer: cnt for kmer, cnt in oracle_dict(text_fasta, k).items()
    }


def _make_fastq(rng, n_reads, read_len, tricky=True):
    reads, fq, fa = [], [], []
    for i in range(n_reads):
        seq = random_dna(rng, read_len, n_prob=0.03)
        reads.append(seq)
        # adversarial quality lines: start with '@' or '+' and contain
        # newline-adjacent junk the parser must never interpret
        q = ("@" if tricky and i % 2 == 0 else "+") + "I" * (read_len - 1)
        fq.append(f"@read{i} extra meta\n{seq}\n+\n{q}\n")
        fa.append(f">read{i}\n{seq}\n")
    return "".join(fq), "".join(fa)


def test_fastq_reader_parses_reads(rng, tmp_path):
    fq_text, _ = _make_fastq(rng, 20, 50)
    p = tmp_path / "r.fastq"
    p.write_text(fq_text)
    with FastqReader(str(p)) as r:
        recs = list(r.records())
    assert len(recs) == 20
    assert recs[0][0] == "read0 extra meta"
    assert len(recs[0][1]) == 50


def test_fastq_spectrum_matches_fasta_oracle(rng, tmp_path):
    fq_text, fa_text = _make_fastq(rng, 30, 80)
    p = tmp_path / "r.fastq"
    p.write_text(fq_text)
    _spectra_equal(p, fa_text, 6)


def test_fastq_gzip_and_sniff(rng, tmp_path):
    fq_text, fa_text = _make_fastq(rng, 15, 60)
    p = tmp_path / "r.fastq.gz"
    p.write_bytes(gzip.compress(fq_text.encode()))
    assert sniff_format(str(p)) == "fastq"
    _spectra_equal(p, fa_text, 5)


def test_fasta_gzip(rng, tmp_path):
    from findkmer_tpu import api

    seq = random_dna(rng, 3000, n_prob=0.02)
    text = ">r\n" + seq + "\n"
    p = tmp_path / "g.fa.gz"
    p.write_bytes(gzip.compress(text.encode()))
    assert sniff_format(str(p)) == "fasta"
    cfg = Config(k=7, chunk_len=128, batch_rows=2)
    spec = api.count([str(p)], 7, config=cfg)
    assert spec.to_dict() == oracle_dict(text, 7)


def test_fastq_crlf_and_final_newline_missing(rng, tmp_path):
    fq_text, fa_text = _make_fastq(rng, 5, 40)
    crlf = fq_text.replace("\n", "\r\n").rstrip("\r\n")  # no final EOL
    p = tmp_path / "crlf.fastq"
    p.write_text(crlf, newline="")
    _spectra_equal(p, fa_text, 4)


def test_fastq_malformed_errors(tmp_path):
    p = tmp_path / "bad.fastq"
    p.write_text("@r1\nACGT\nGARBAGE\nIIII\n")
    with pytest.raises(ValueError, match="multi-line FASTQ"):
        with FastqReader(str(p)) as r:
            list(r.chunks())
    p2 = tmp_path / "bad2.fastq"
    p2.write_text("ACGT\nACGT\n+\nIIII\n")
    with pytest.raises(ValueError, match="expected '@header'"):
        with FastqReader(str(p2)) as r:
            list(r.chunks())


def test_fastq_truncated_final_record_errors(tmp_path, monkeypatch):
    """A file whose last record is cut off after its sequence line must
    ERROR on BOTH counting flows (FINDKMER_FASTQ_FAST=1/0) — the legacy
    reader was lenient here while the offsets flow raised, so the two
    paths silently diverged (round-4 review finding)."""
    from findkmer_tpu import pipeline
    from findkmer_tpu.models.counter import make_counter

    cfg = Config(k=4, chunk_len=128, batch_rows=4)
    for tail in ("@r1\nACGTACGTACGT\n",           # header + seq only
                 "@r1\nACGTACGTACGT\n+\n"):       # missing quality line
        p = tmp_path / "trunc.fastq"
        p.write_text("@r0\nACGTACGT\n+\nIIIIIIII\n" + tail)
        for fast in ("1", "0"):
            monkeypatch.setenv("FINDKMER_FASTQ_FAST", fast)
            counter = make_counter(cfg)
            state = counter.init_state()
            with pytest.raises(ValueError, match="truncated FASTQ"):
                for rows in pipeline.batches_from_file(str(p), cfg):
                    state = counter.step(state, rows)


def test_fastq_offsets_counting_path_matches_legacy(tmp_path, monkeypatch):
    """The offsets-based FASTQ counting path (pipeline._fastq_code_stream,
    C record scanner + gather-encode) must produce the identical
    spectrum and stream stats as the FastqReader path — adversarial
    input: lowercase, Ns, IUPAC, empty reads, blanks, CRLF."""
    import numpy as np

    from findkmer_tpu.config import Config
    from findkmer_tpu.io import native
    from findkmer_tpu import pipeline

    if not native.available():
        pytest.skip("native library not built")
    rng = np.random.default_rng(11)
    recs = []
    for i in range(300):
        L = int(rng.integers(0, 90))
        seq = "".join(rng.choice(list("ACGTacgtNR"), L,
                                 p=[.2, .2, .2, .2, .06, .06, .02, .02,
                                    .02, .02]))
        recs.append(f"@x{i}\n{seq}\n+\n{'I' * L}\n")
        if i % 50 == 0:
            recs.append("\n")
    p = tmp_path / "reads.fastq"
    p.write_text("".join(recs))
    crlf = tmp_path / "crlf.fastq"
    crlf.write_bytes(p.read_bytes().replace(b"\n", b"\r\n"))

    cfg = Config(k=7, chunk_len=128, batch_rows=4)

    def run(path):
        from findkmer_tpu.models.counter import make_counter

        counter = make_counter(cfg)
        state = counter.init_state()
        stats = pipeline.StreamStats()
        for rows in pipeline.batches_from_file(str(path), cfg,
                                               stats=stats):
            state = counter.step(state, rows)
        return np.asarray(counter.finalize(state)), stats

    for path in (p, crlf):
        monkeypatch.setenv("FINDKMER_FASTQ_FAST", "1")
        fast, st_f = run(path)
        monkeypatch.setenv("FINDKMER_FASTQ_FAST", "0")
        legacy, st_l = run(path)
        np.testing.assert_array_equal(fast, legacy)
        assert (st_f.bases, st_f.valid_bases, st_f.records) == (
            st_l.bases, st_l.valid_bases, st_l.records
        )


def test_trailing_space_line_rejected_by_both_flows(tmp_path):
    """A space-only trailing line is malformed in BOTH FASTQ parsers
    (round-5 review finding: the offsets scanner's tail check stripped
    ALL whitespace and silently accepted what the strict line reader
    rejects)."""
    import pytest

    from findkmer_tpu.filter import _fastq_blocks, _fastq_records_block
    from findkmer_tpu.io.fastq import FastqReader
    from findkmer_tpu.io import native

    p = tmp_path / "t.fastq"
    p.write_bytes(b"@r\nACGT\n+\nIIII\n \n")
    with pytest.raises(ValueError):
        list(FastqReader(str(p)).chunks())
    if native.available():
        with pytest.raises(ValueError):
            list(_fastq_blocks(str(p)))
    with pytest.raises(ValueError):
        list(_fastq_records_block(str(p)))
