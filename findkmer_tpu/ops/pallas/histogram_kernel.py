"""Pallas TPU kernels: outer-product histogram on the MXU.

TPU has no vectorized scatter, so the idiomatic exact histogram maps bin
matching onto the MXU.  A full one-hot against 4^k bins costs 4^k one-hot
bytes per window — hopeless beyond tiny k.  Splitting the code into hi/lo
halves (4^k = T1*T2) needs only T1+T2 one-hot bytes per window, and an
int8 matmul

    acc[hi, lo] += sum_n onehot_hi[n, hi] * onehot_lo[n, lo]

does the binning at MXU rate: this is a 2-level radix histogram executed
as one outer product.  The (T1, T2) int32 accumulator lives in VMEM across
the whole sequential grid (output revisiting), so table traffic to HBM is
one write at the end.

Two variants:

  * histogram_pallas — histogram of pre-extracted window codes (hi/lo
    bytes + validity as uint8 planes, built by XLA in ops/window.py).
    Clean non-overlapping 2-D grid blocks; one matmul per grid step (the
    axon remote Mosaic compiler rejects in-kernel slicing loops, so each
    grid step is exactly one one-hot + one matmul).  This is the
    production path: materializing codes in HBM costs ~8 B/window of
    bandwidth — orders of magnitude above the compute bound here.
  * fused_window_histogram — window extraction fused into the kernel
    (single-chunk tiles only); kept for small shapes and as the
    future-fusion reference.

Determinism: grid iterations are sequential on TPU, every add is an int32
matmul accumulate — bit-exact, no atomics (tests diff against
jnp.bincount, the de-facto race detector of SURVEY.md §5).

Replaces the reference's count-insert hot loop (SURVEY.md §3.1 E3) for
dense tables with k <= 10 (4^10 accumulator = 4 MiB VMEM).
"""

from __future__ import annotations

import functools
import math
from typing import Tuple

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
    """Split a 2k-bit code into (hi_bits, lo_bits) halves."""
    total = 2 * k
    # balanced split minimizes one-hot bytes (T1 + T2 per window); keep
    # lo >= 7 bits so the lane dimension is at least 128 wide
    lo = max((total + 1) // 2, min(total, 7))
    return total - lo, lo


# ----------------------------------------------------------------------
# production path: histogram of pre-extracted codes
# ----------------------------------------------------------------------

def _hist_kernel(hi_ref, lo_ref, valid_ref, out_ref, *, T1: int, T2: int):
    """One grid step: outer-product histogram of an (8, nc) code tile.

    Layout choice: codes live along LANES (rows of nc) and bins along
    SUBLANES, so each one-hot is `iota (T, 1) == code_row (1, nc)` — a
    cheap sublane broadcast (the transposed layout, codes-as-column,
    forces per-element lane splats and is ~5x slower).  The dot contracts
    the lane dimension of both one-hots:

        acc[t1, t2] += sum_n oh_hi[t1, n] * oh_lo[t2, n]

    Eight unrolled row iterations per tile; histograms are order-invariant
    so the caller may reshape the window stream into any (C*8, nc) layout.
    No in-kernel reshapes/transposes — Mosaic only lowers lane-width shape
    casts.
    """

    @pl.when(pl.program_id(0) == 0)
    def _init():
        out_ref[:] = jnp.zeros_like(out_ref)

    rows = hi_ref.shape[0]
    hi_iota = lax.broadcasted_iota(jnp.int32, (T1, 1), 0)
    lo_iota = lax.broadcasted_iota(jnp.int32, (T2, 1), 0)
    acc = jnp.zeros((T1, T2), jnp.int32)
    for r in range(rows):
        hi_row = lax.slice_in_dim(hi_ref[:], r, r + 1, axis=0).astype(
            jnp.int32
        )                                                     # (1, nc)
        lo_row = lax.slice_in_dim(lo_ref[:], r, r + 1, axis=0).astype(
            jnp.int32
        )
        v_row = lax.slice_in_dim(valid_ref[:], r, r + 1, axis=0).astype(
            jnp.int32
        )
        oh_hi = ((hi_iota == hi_row) & (v_row > 0)).astype(jnp.int8)
        oh_lo = (lo_iota == lo_row).astype(jnp.int8)          # (T2, nc)
        acc = acc + lax.dot_general(
            oh_hi, oh_lo,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
    out_ref[:] += acc


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


@functools.partial(
    jax.jit, static_argnames=("k", "n_chunk", "interpret")
)
def histogram_pallas(
    codes: jnp.ndarray,
    valid: jnp.ndarray,
    k: int,
    n_chunk: int = 2048,
    interpret: bool = False,
) -> jnp.ndarray:
    """(B, W) int32 window codes + validity -> (4^k,) int32 histogram.

    Each grid step consumes an (8, n_chunk) tile = 8*n_chunk windows.
    """
    assert _PALLAS_OK, "pallas unavailable"
    # k <= 10: (T1, T2) int32 accumulator is 4^k * 4 bytes <= 4 MiB VMEM
    assert k <= 10, "pallas histogram accumulator limited to k <= 10"
    hi_bits, lo_bits = _split_bits(k)
    T1, T2 = 1 << hi_bits, 1 << lo_bits
    if k >= 10 and n_chunk > 1024:
        # scoped VMEM is 16 MiB: the k=10 4 MiB accumulator plus two
        # (1024, n_chunk) one-hots overflows it at n_chunk=2048
        # (measured on-chip OOM, 17.95M > 16M; bench/tpu_smoke round 3)
        n_chunk = 1024

    # narrow planes, flattened and re-tiled (histograms are
    # order-invariant); uint16 when a half exceeds 8 bits (k in 9..10)
    hi_dt = jnp.uint8 if hi_bits <= 8 else jnp.uint16
    lo_dt = jnp.uint8 if lo_bits <= 8 else jnp.uint16
    hi8 = (codes >> lo_bits).astype(hi_dt).reshape(-1)
    lo8 = (codes & (T2 - 1)).astype(lo_dt).reshape(-1)
    v8 = valid.astype(jnp.uint8).reshape(-1)

    N = hi8.shape[0]
    tile = 8 * n_chunk
    pad = (-N) % tile
    if pad:
        hi8 = jnp.pad(hi8, (0, pad))
        lo8 = jnp.pad(lo8, (0, pad))
        v8 = jnp.pad(v8, (0, pad))
    C = hi8.shape[0] // tile
    hi8 = hi8.reshape(C * 8, n_chunk)
    lo8 = lo8.reshape(C * 8, n_chunk)
    v8 = v8.reshape(C * 8, n_chunk)

    spec = pl.BlockSpec(
        (8, n_chunk), lambda i: (i, 0), memory_space=pltpu.VMEM
    )
    out = pl.pallas_call(
        functools.partial(_hist_kernel, T1=T1, T2=T2),
        grid=(C,),
        in_specs=[spec, spec, spec],
        out_specs=pl.BlockSpec(
            (T1, T2), lambda i: (0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((T1, T2), jnp.int32),
        interpret=interpret,
    )(hi8, lo8, v8)
    return out.reshape(-1)


def add_counts_pallas(
    rows: jnp.ndarray,
    table: jnp.ndarray,
    k: int,
    canonical: bool,
    interpret: bool = False,
) -> jnp.ndarray:
    """table += histogram of all valid windows in rows (B, R) uint8.

    Window extraction runs in XLA (ops/window.py); binning runs in the
    Pallas outer-product kernel.
    """
    from findkmer_tpu.ops import window as window_ops

    codes, valid = window_ops.window_codes(rows, k, canonical)
    delta = histogram_pallas(codes, valid, k, interpret=interpret)
    return table + delta.astype(table.dtype)


# ----------------------------------------------------------------------
# fused variant (single-chunk tiles): window extraction inside the kernel
# ----------------------------------------------------------------------

def _fused_kernel(rows_ref, out_ref, *, k: int, canonical: bool,
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
    # invalid windows carry idx == 4^k: hi == T1 matches no column of
    # hi_iota, so the all-zero oh_hi row nulls the whole contribution
    idx = jnp.where(valid, code, T).reshape(-1)
    n = idx.shape[0]
    hi_iota = lax.broadcasted_iota(jnp.int32, (n, T1), 1)
    lo_iota = lax.broadcasted_iota(jnp.int32, (n, T2), 1)
    hi = (idx >> lo_bits)[:, None]
    lo = (idx & (T2 - 1))[:, None]
    oh_hi = (hi == hi_iota).astype(jnp.int8)
    oh_lo = (lo == lo_iota).astype(jnp.int8)
    out_ref[:] += lax.dot_general(
        oh_hi, oh_lo,
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )


@functools.partial(
    jax.jit,
    static_argnames=("k", "canonical", "row_tile", "interpret"),
)
def fused_window_histogram(
    rows: jnp.ndarray,
    k: int,
    canonical: bool = False,
    row_tile: int = 8,
    n_chunk: int = 0,  # unused; kept for call compatibility
    interpret: bool = False,
) -> jnp.ndarray:
    """rows (B, R) uint8 -> (4^k,) int32 histogram, fused in one kernel.

    The whole row tile is one one-hot + one matmul per grid step (the
    remote Mosaic compiler rejects multi-chunk in-kernel loops), so
    row_tile * (R-k+1) one-hot bytes must fit VMEM: use for R up to a few
    thousand.  For larger rows use histogram_pallas via add_counts_pallas.
    """
    assert _PALLAS_OK, "pallas unavailable"
    B, R = rows.shape
    hi_bits, lo_bits = _split_bits(k)
    T1, T2 = 1 << hi_bits, 1 << lo_bits
    row_tile = math.gcd(B, row_tile)

    kernel = functools.partial(
        _fused_kernel, k=k, canonical=canonical,
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
