"""Window-code extraction kernel tests vs a naive Python reference
(SURVEY.md §4.2 kernel unit tests)."""

import numpy as np
import pytest

from findkmer_tpu.ops.window import (
    code_to_str,
    revcomp_code,
    str_to_code,
    window_codes,
    window_codes_wide,
)


def naive_windows(row, k):
    """Python reference: (codes, valid) for one row of uint8 codes."""
    R = len(row)
    W = R - k + 1
    codes, valid = [], []
    for i in range(W):
        win = row[i : i + k]
        ok = all(c < 4 for c in win)
        code = 0
        for c in win:
            code = code * 4 + (int(c) & 3)
        codes.append(code)
        valid.append(ok)
    return np.array(codes, np.int64), np.array(valid, bool)


@pytest.mark.parametrize("k", [1, 2, 4, 8, 15])
def test_window_codes_vs_naive(rng, k):
    B, R = 4, 64
    rows = rng.integers(0, 5, (B, R)).astype(np.uint8)
    codes, valid = window_codes(rows, k)
    codes, valid = np.asarray(codes), np.asarray(valid)
    for b in range(B):
        ncodes, nvalid = naive_windows(rows[b], k)
        np.testing.assert_array_equal(valid[b], nvalid)
        np.testing.assert_array_equal(codes[b][nvalid], ncodes[nvalid])


@pytest.mark.parametrize("k", [16, 17, 21, 31])
def test_window_codes_wide_vs_naive(rng, k):
    B, R = 3, 80
    rows = rng.integers(0, 5, (B, R)).astype(np.uint8)
    hi, lo, valid = window_codes_wide(rows, k)
    hi, lo, valid = map(np.asarray, (hi, lo, valid))
    full = hi.astype(np.uint64) << np.uint64(32) | lo.astype(np.uint64)
    for b in range(B):
        ncodes, nvalid = naive_windows(rows[b], k)
        np.testing.assert_array_equal(valid[b], nvalid)
        np.testing.assert_array_equal(
            full[b][nvalid], ncodes[nvalid].astype(np.uint64)
        )


@pytest.mark.parametrize("k", [2, 4, 8, 15])
def test_canonical_narrow(rng, k):
    B, R = 2, 40
    rows = rng.integers(0, 4, (B, R)).astype(np.uint8)  # all valid
    canon, valid = window_codes(rows, k, canonical=True)
    plain, _ = window_codes(rows, k, canonical=False)
    canon, plain = np.asarray(canon), np.asarray(plain)
    want = np.minimum(
        plain,
        np.vectorize(lambda c: revcomp_code(int(c), k))(plain),
    )
    np.testing.assert_array_equal(canon, want)


@pytest.mark.parametrize("k", [16, 21, 31])
def test_canonical_wide(rng, k):
    B, R = 2, 70
    rows = rng.integers(0, 4, (B, R)).astype(np.uint8)
    hi, lo, _ = window_codes_wide(rows, k, canonical=True)
    phi, plo, _ = window_codes_wide(rows, k, canonical=False)
    canon = (
        np.asarray(hi).astype(np.uint64) << np.uint64(32)
    ) | np.asarray(lo).astype(np.uint64)
    plain = (
        np.asarray(phi).astype(np.uint64) << np.uint64(32)
    ) | np.asarray(plo).astype(np.uint64)
    want = np.minimum(
        plain,
        np.vectorize(lambda c: np.uint64(revcomp_code(int(c), k)))(plain),
    )
    np.testing.assert_array_equal(canon, want)


def test_code_str_roundtrip():
    for k in (1, 4, 8):
        for code in (0, 1, 4**k - 1, 4**k // 3):
            s = code_to_str(code, k)
            assert len(s) == k
            assert str_to_code(s) == code
    assert code_to_str(0, 4) == "AAAA"
    assert code_to_str(4**4 - 1, 4) == "TTTT"
    assert str_to_code("ACGT") == 0b00011011


def test_revcomp_code():
    assert revcomp_code(str_to_code("AACG"), 4) == str_to_code("CGTT")
    assert revcomp_code(str_to_code("ACGT"), 4) == str_to_code("ACGT")
