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


@pytest.mark.parametrize("k", [4, 6, 8])
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


def test_counter_pallas_method_vs_oracle(rng):
    from test_vs_oracle import check

    seq = random_dna(rng, 2000, n_prob=0.03)
    cfg = Config(k=6, hist="pallas", chunk_len=128, batch_rows=4)
    check(">r\n" + seq + "\n", cfg)


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
