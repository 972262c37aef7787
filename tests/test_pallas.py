"""Pallas fused window+histogram kernel vs the XLA paths
(SURVEY.md §4.2 kernel unit tests; interpreter mode on CPU)."""

import numpy as np
import jax.numpy as jnp
import pytest

from conftest import random_dna
from findkmer_tpu.config import Config
from findkmer_tpu.ops.pallas.histogram_kernel import (
    fused_count_available,
    fused_window_histogram,
)
from findkmer_tpu.ops.histogram import histogram
from findkmer_tpu.ops.window import window_codes

pytestmark = pytest.mark.skipif(
    not fused_count_available(), reason="pallas unavailable"
)


@pytest.mark.parametrize("k", [4, 6, 8, 9, 10])
def test_fused_matches_xla(rng, k):
    B, L = 8, 128
    R = L + k - 1
    rows = rng.integers(0, 5, (B, R)).astype(np.uint8)
    got = np.asarray(
        fused_window_histogram(jnp.asarray(rows), k, interpret=True)
    )
    codes, valid = window_codes(jnp.asarray(rows), k)
    want = np.asarray(histogram(codes, valid, 4**k))
    np.testing.assert_array_equal(got, want)


def test_fused_canonical(rng):
    k = 5
    B, L = 4, 64
    rows = rng.integers(0, 4, (B, L + k - 1)).astype(np.uint8)
    got = np.asarray(
        fused_window_histogram(
            jnp.asarray(rows), k, canonical=True, interpret=True
        )
    )
    codes, valid = window_codes(jnp.asarray(rows), k, canonical=True)
    want = np.asarray(histogram(codes, valid, 4**k))
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("k", [6, 9, 10])
def test_counter_pallas_method_vs_oracle(rng, k):
    from test_vs_oracle import check

    seq = random_dna(rng, 2000, n_prob=0.03)
    cfg = Config(k=k, hist="pallas", chunk_len=128, batch_rows=4)
    check(">r\n" + seq + "\n", cfg)


@pytest.mark.parametrize("k", [4, 8, 10])
def test_histogram_pallas_matches_bincount(rng, k):
    import jax.numpy as jnp
    from findkmer_tpu.ops.pallas.histogram_kernel import histogram_pallas

    codes = jnp.asarray(rng.integers(0, 4**k, (8, 300)).astype(np.int32))
    valid = jnp.asarray(rng.random((8, 300)) < 0.8)
    got = np.asarray(histogram_pallas(codes, valid, k, interpret=True))
    want = np.bincount(
        np.asarray(codes)[np.asarray(valid)], minlength=4**k
    ).astype(np.int32)
    np.testing.assert_array_equal(got, want)


def test_odd_geometry(rng):
    # B not divisible by default row_tile; W not divisible by n_chunk
    k = 4
    B, L = 6, 50
    rows = rng.integers(0, 5, (B, L + k - 1)).astype(np.uint8)
    got = np.asarray(
        fused_window_histogram(jnp.asarray(rows), k, interpret=True)
    )
    codes, valid = window_codes(jnp.asarray(rows), k)
    want = np.asarray(histogram(codes, valid, 4**k))
    np.testing.assert_array_equal(got, want)
