"""Pallas TPU kernel: fused window extraction + outer-product histogram.

This is the Pallas replacement for the reference's entire hot loop
(SURVEY.md §3.1 E2+E3) in one kernel: a tile of encoded rows is DMA'd to
VMEM, window codes are built with k shifted slices on the VPU, and counts
are accumulated on the MXU — never materializing window codes in HBM.

Why an outer-product histogram: TPU has no vectorized scatter, so the
idiomatic exact histogram maps bin-matching onto the MXU.  A full one-hot
against 4^k bins costs 4^k bytes of VPU one-hot materialization per window
— hopeless for k=8.  Splitting the code into hi/lo halves (T = T1*T2,
T1,T2 <= 4^ceil(k/2)) needs only T1+T2 one-hot bytes per window, and the
(T1, n) x (n, T2) int8 matmul

    acc[hi, lo] += sum_n onehot_hi[n, hi] * onehot_lo[n, lo]

does the binning at MXU rate.  The (T1, T2) int32 accumulator lives in
VMEM across the whole grid (output revisiting), so HBM traffic is exactly:
rows in (1 B/base), table out (4*4^k once).

Grid: 1-D over row tiles; XLA double-buffers the row DMA automatically via
the BlockSpec pipeline.  Determinism: grid iterations are sequential on
TPU, every add is an int32 matmul accumulate — bit-exact, no atomics
(the race detector cross-check in tests diffs this against jnp.bincount).

Used for k <= pallas_max_k (default 8; 4^8 accumulator = 256 KiB VMEM).
Falls back to ops/histogram.py XLA paths elsewhere (SURVEY.md §7 M2/hard
part 6: capability first, speed second).
"""

from __future__ import annotations

import functools
import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax import lax

try:  # pallas import is environment-sensitive; degrade gracefully
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    _PALLAS_OK = True
except Exception:  # pragma: no cover
    _PALLAS_OK = False


def fused_count_available() -> bool:
    return _PALLAS_OK


def _split_bits(k: int) -> Tuple[int, int]:
    """Split a 2k-bit code into (hi_bits, lo_bits) halves, lo >= hi."""
    total = 2 * k
    lo = (total + 1) // 2
    # lane dimension (lo one-hot width) likes multiples of 128 -> >= 7 bits
    lo = max(lo, min(total, 7))
    return total - lo, lo


def _kernel(rows_ref, out_ref, *, k: int, canonical: bool, n_chunk: int,
            hi_bits: int, lo_bits: int):
    Bt, R = rows_ref.shape
    W = R - k + 1
    T1, T2 = 1 << hi_bits, 1 << lo_bits

    @pl.when(pl.program_id(0) == 0)
    def _init():
        out_ref[:] = jnp.zeros_like(out_ref)

    c = rows_ref[:].astype(jnp.int32)  # (Bt, R)

    code = None
    rc = None
    valid = None
    for j in range(k):
        cj = lax.slice_in_dim(c, j, j + W, axis=1)
        b = cj & 3
        v = cj < 4
        code = b if code is None else (code << 2) | b
        valid = v if valid is None else valid & v
        if canonical:
            r = (3 - b) << (2 * j)
            rc = r if rc is None else rc | r
    if canonical:
        code = jnp.minimum(code, rc)

    T = 1 << (2 * k)
    idx = jnp.where(valid, code, T).reshape(-1)  # (Bt*W,)
    n = idx.shape[0]
    num_chunks = n // n_chunk

    hi_iota = lax.broadcasted_iota(jnp.int32, (n_chunk, T1), 1)
    lo_iota = lax.broadcasted_iota(jnp.int32, (n_chunk, T2), 1)

    # static (unrolled) chunk loop: Mosaic has no dynamic_slice on values,
    # and num_chunks is small and static anyway
    acc = jnp.zeros((T1, T2), jnp.int32)
    for ci in range(num_chunks):
        chunk = lax.slice_in_dim(idx, ci * n_chunk, (ci + 1) * n_chunk)
        # invalid windows carry idx == 4^k: hi == T1 matches no column of
        # hi_iota, so the all-zero oh_hi row nulls the whole contribution
        hi = (chunk >> lo_bits)[:, None]
        lo = (chunk & (T2 - 1))[:, None]
        oh_hi = (hi == hi_iota).astype(jnp.int8)  # (n_chunk, T1)
        oh_lo = (lo == lo_iota).astype(jnp.int8)  # (n_chunk, T2)
        acc = acc + lax.dot_general(
            oh_hi, oh_lo,
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
    out_ref[:] += acc


@functools.partial(
    jax.jit,
    static_argnames=("k", "canonical", "row_tile", "n_chunk", "interpret"),
)
def fused_window_histogram(
    rows: jnp.ndarray,
    k: int,
    canonical: bool = False,
    row_tile: int = 8,
    n_chunk: int = 2048,
    interpret: bool = False,
) -> jnp.ndarray:
    """rows (B, R) uint8 -> (4^k,) int32 histogram of valid window codes.

    B must be divisible by row_tile; row_tile*(R-k+1) divisible by n_chunk
    (callers pad rows; models/counter.py guarantees geometry).
    """
    assert _PALLAS_OK, "pallas unavailable"
    B, R = rows.shape
    W = R - k + 1
    hi_bits, lo_bits = _split_bits(k)
    T1, T2 = 1 << hi_bits, 1 << lo_bits
    row_tile = math.gcd(B, row_tile)
    n = row_tile * W
    if n % n_chunk != 0:
        # pick the largest chunk size dividing n (<= requested)
        c = math.gcd(n, n_chunk)
        n_chunk = c

    kernel = functools.partial(
        _kernel, k=k, canonical=canonical, n_chunk=n_chunk,
        hi_bits=hi_bits, lo_bits=lo_bits,
    )
    out = pl.pallas_call(
        kernel,
        grid=(B // row_tile,),
        in_specs=[
            pl.BlockSpec(
                (row_tile, R), lambda i: (i, 0), memory_space=pltpu.VMEM
            )
        ],
        out_specs=pl.BlockSpec(
            (T1, T2), lambda i: (0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((T1, T2), jnp.int32),
        interpret=interpret,
    )(rows)
    return out.reshape(-1)


def add_counts_pallas(
    codes_rows: jnp.ndarray,
    table: jnp.ndarray,
    k: int,
    canonical: bool,
    interpret: bool = False,
) -> jnp.ndarray:
    """table += fused histogram of rows (convenience accumulation wrapper)."""
    delta = fused_window_histogram(
        codes_rows, k, canonical, interpret=interpret
    )
    return table + delta.astype(table.dtype)
