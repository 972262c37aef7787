"""Hypothesis property tests (SURVEY.md §4.2): the engine equals the
oracle on arbitrary generated inputs and is invariant to chunk geometry
and record order."""

import numpy as np
from hypothesis import HealthCheck, given, settings, strategies as st

from findkmer_tpu.config import Config
from oracle.scalar import canonical_str
from test_vs_oracle import count_text as engine_count_text
from test_vs_oracle import oracle_dict, spectrum_to_dict

# sequences over a DNA-ish alphabet incl. noise bytes
SEQ = st.text(alphabet="ACGTacgtNnRYX", min_size=0, max_size=300)
SETTINGS = settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)


def _fasta(records):
    return "".join(f">r{i}\n{s}\n" for i, s in enumerate(records))


@SETTINGS
@given(records=st.lists(SEQ, min_size=1, max_size=4),
       k=st.integers(1, 9),
       chunk_len=st.integers(16, 64),
       batch_rows=st.integers(1, 3))
def test_engine_equals_oracle(records, k, chunk_len, batch_rows):
    cfg = Config(k=k, chunk_len=max(chunk_len, k), batch_rows=batch_rows)
    text = _fasta(records)
    spectrum, _ = engine_count_text(text, cfg)
    assert spectrum_to_dict(spectrum, k) == oracle_dict(text, k)


@SETTINGS
@given(records=st.lists(SEQ, min_size=1, max_size=4), k=st.integers(1, 7))
def test_chunk_geometry_invariant(records, k):
    text = _fasta(records)
    a, _ = engine_count_text(
        text, Config(k=k, chunk_len=max(16, k), batch_rows=1)
    )
    b, _ = engine_count_text(
        text, Config(k=k, chunk_len=max(48, k), batch_rows=3)
    )
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


@SETTINGS
@given(records=st.lists(SEQ, min_size=2, max_size=4), k=st.integers(1, 6))
def test_record_order_invariant(records, k):
    a, _ = engine_count_text(
        _fasta(records), Config(k=k, chunk_len=max(32, k), batch_rows=2)
    )
    b, _ = engine_count_text(
        _fasta(list(reversed(records))),
        Config(k=k, chunk_len=max(32, k), batch_rows=2),
    )
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


@SETTINGS
@given(records=st.lists(SEQ, min_size=1, max_size=3), k=st.integers(2, 6))
def test_canonical_is_fold_of_plain(records, k):
    text = _fasta(records)
    plain, _ = engine_count_text(
        text, Config(k=k, chunk_len=max(32, k), batch_rows=2)
    )
    canon, _ = engine_count_text(
        text, Config(k=k, canonical=True, chunk_len=max(32, k),
                     batch_rows=2)
    )
    folded = {}
    for kmer, n in spectrum_to_dict(plain, k).items():
        c = canonical_str(kmer)
        folded[c] = folded.get(c, 0) + n
    assert spectrum_to_dict(canon, k) == folded


@SETTINGS
@given(records=st.lists(SEQ, min_size=1, max_size=3), k=st.integers(1, 6))
def test_total_window_conservation(records, k):
    text = _fasta(records)
    spectrum, _ = engine_count_text(
        text, Config(k=k, chunk_len=max(32, k), batch_rows=2)
    )
    total = int(np.asarray(spectrum).sum())
    want = 0
    for s in records:
        run = 0
        for ch in s:
            if ch.upper() in "ACGT":
                run += 1
            else:
                want += max(0, run - k + 1)
                run = 0
        want += max(0, run - k + 1)
    assert total == want


@SETTINGS
@given(records=st.lists(SEQ, min_size=1, max_size=3),
       k=st.integers(2, 8))
def test_canonize_file_equals_canonical_count(records, k, tmp_path_factory):
    """canonize(plain spectrum) == counting with canonical=True, for
    arbitrary inputs (including all-invalid and empty records)."""
    import io

    from findkmer_tpu import spectra
    from oracle.scalar import count_kmers_in_text, parse_fasta_text

    text = _fasta(records)
    plain = {}
    canon = {}
    for _, seq in parse_fasta_text(text):
        count_kmers_in_text(seq, k, counts=plain)
        count_kmers_in_text(seq, k, canonical=True, counts=canon)
    tmp = tmp_path_factory.mktemp("canon") / "plain.tsv"
    tmp.write_text(
        "".join(f"{km}\t{plain[km]}\n" for km in sorted(plain))
    )
    out = io.BytesIO()
    spectra.canonize_spectrum_file(str(tmp), out)
    got = {}
    for line in bytes(out.getvalue()).decode().splitlines():
        km, c = line.split("\t")
        got[km] = int(c)
    assert got == canon


@SETTINGS
@given(seq=SEQ, k=st.integers(2, 8))
def test_filter_hits_bounded_and_oracle(seq, k):
    """FilterSpec.hits: hits <= valid windows; equals the per-read
    oracle for a spectrum built from the read's own k-mers."""
    from findkmer_tpu.filter import FilterSpec
    from oracle.scalar import count_kmers_in_text

    plain = count_kmers_in_text(seq, k)
    import tempfile, os

    with tempfile.NamedTemporaryFile("w", suffix=".tsv",
                                     delete=False) as f:
        for km in sorted(plain):
            f.write(f"{km}\t{plain[km]}\n")
        path = f.name
    try:
        if not plain:
            return
        spec = FilterSpec.load(path)
        hits, windows = spec.hits(seq.encode())
        assert hits <= windows
        assert windows == sum(plain.values())
        assert hits == windows  # every window of seq is in its own spectrum
    finally:
        os.unlink(path)
