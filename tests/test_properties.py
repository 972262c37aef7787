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
