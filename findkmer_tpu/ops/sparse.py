"""Sparse (sorted-run) count store for large k (k > 10, e.g. k=21).

The reference's count structure is an in-memory array/trie (SURVEY.md §2.1
R4); a 4^21 direct table (~17.6 TB) is impossible, so big k needs a sparse
exact structure.  The TPU-idiomatic answer is NOT a hash table with probing
(scatter races, data-dependent loops) but sort + run-length encoding
(SURVEY.md §7 M5: "prefer sort+run-length (segment_sum): fully vectorized,
exact, no probing races").

Round-2 architecture (log-structured, measured in bench/probe_sort*.py):

  Ingest appends RAW window codes — no per-batch or per-flush sorting at
  all.  Merging sorted runs on TPU is best done by re-sorting the
  concatenation (unstable lax.sort holds 360-400 Melem/s at 8-32M, while
  hand-built bitonic merge passes run at 70 Melem/s), so any sort before
  the final one is wasted work.  One COMPACTION chain runs rarely
  (memory-pressure threshold, checkpoint, finalize):

      sort (unstable, keys only)  ->  RLE by scans  ->  [squeeze]

  with run totals computed positionally (cummax over iota — monotone,
  so exact; 697 Melem/s) for raw input, or by segmented value
  propagation (associative_scan, wrap-safe) when a count-carrying store
  re-enters the sort.  No gathers anywhere on the hot path (124 Melem/s).

Codes are (hi, lo) uint32 pairs (2k-bit code split at bit 32) so no 64-bit
integers are needed on device (SURVEY.md §7 hard part 4).  k <= 15 fits a
single uint32 (1-key sorts at 522 Melem/s).  The sentinel
hi = lo = 0xffffffff sorts after every real code (real hi < 2^30 for
k <= 31) and marks empty/invalid slots.

Everything is static-shaped; callers pad concatenations to a small ladder
of sizes so only a handful of shapes ever compile (compiles through the
axon tunnel cost minutes).

batch_to_runs / merge_runs are the round-1 per-batch API, still used by
the distributed dp_sparse path.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from jax import lax

# numpy (not jnp) so importing this module never initializes a JAX backend
import numpy as np

SENTINEL = np.uint32(0xFFFFFFFF)


def _rle_sorted(hi, lo, cnt):
    """Collapse duplicates in sorted (hi, lo) runs by summing their counts.

    Input arrays are sorted by (hi, lo) with sentinel entries (cnt == 0
    allowed) at the end.  Returns same-length arrays where the first
    occurrence of each distinct code carries the summed count and the
    remaining duplicates are turned into sentinels with count 0 — NOT yet
    re-sorted (callers re-sort to push freed slots to the end).
    """
    n = hi.shape[0]
    sent1 = jnp.full((1,), SENTINEL, jnp.uint32)
    prev_hi = jnp.concatenate([sent1, hi[:-1]])
    prev_lo = jnp.concatenate([sent1, lo[:-1]])
    is_start = (hi != prev_hi) | (lo != prev_lo)
    next_hi = jnp.concatenate([hi[1:], sent1])
    next_lo = jnp.concatenate([lo[1:], sent1])
    is_end = (hi != next_hi) | (lo != next_lo)
    # Scan-only run sums (no scatter — XLA scatter serializes on TPU at
    # ~ns/element and dominated this whole path):
    #   C[i]    = inclusive prefix sum of cnt, in uint32 so overflow is
    #             well-defined wraparound (differences stay exact mod 2^32)
    #   base[i] = prefix sum just before the start of i's run.  Propagated
    #             BY POSITION (cummax over run-start indices, which are
    #             monotone by construction), then gathered — propagating
    #             the prefix-sum VALUE by cummax silently breaks once
    #             cumulative observations wrap past 2^31 (a stale pre-wrap
    #             base wins the max and corrupts every later run total).
    #   total at run END = C - base, exact mod 2^32; true run totals are
    #   bounded by the int32 count dtype so no aliasing occurs.
    # The run's total is emitted at its END position (any one position
    # per run works; callers re-sort by code, where end vs start of equal
    # codes is indistinguishable).
    cu = cnt.astype(jnp.uint32)
    C = jnp.cumsum(cu)
    idx = jnp.arange(n, dtype=jnp.int32)
    start_pos = lax.cummax(jnp.where(is_start, idx, 0), axis=0)
    base = jnp.take(C - cu, start_pos)
    is_sent = hi == SENTINEL
    keep = is_end & ~is_sent
    out_hi = jnp.where(keep, hi, SENTINEL)
    out_lo = jnp.where(keep, lo, SENTINEL)
    out_cnt = jnp.where(keep, C - base, 0).astype(cnt.dtype)
    return out_hi, out_lo, out_cnt


def _sort3(hi, lo, cnt):
    """Sort (hi, lo, cnt) lexicographically by (hi, lo)."""
    hi, lo, cnt = lax.sort((hi, lo, cnt), num_keys=2)
    return hi, lo, cnt


@jax.jit
def batch_to_runs(
    hi: jnp.ndarray, lo: jnp.ndarray, valid: jnp.ndarray
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Window codes (any shape) -> sorted distinct (hi, lo, count) runs.

    Output length = number of input windows (static); unused slots hold
    sentinels with count 0.
    """
    hi = jnp.where(valid, hi, SENTINEL).reshape(-1)
    lo = jnp.where(valid, lo, SENTINEL).reshape(-1)
    cnt = valid.reshape(-1).astype(jnp.int32)
    hi, lo, cnt = _sort3(hi, lo, cnt)
    hi, lo, cnt = _rle_sorted(hi, lo, cnt)
    return _sort3(hi, lo, cnt)


@jax.jit
def merge_runs(
    store_hi: jnp.ndarray,
    store_lo: jnp.ndarray,
    store_cnt: jnp.ndarray,
    run_hi: jnp.ndarray,
    run_lo: jnp.ndarray,
    run_cnt: jnp.ndarray,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Merge sorted runs into a sorted store of static capacity.

    Returns (hi, lo, cnt, overflowed).  overflowed is a bool scalar: True
    when the merged distinct count exceeded the store capacity and counts
    were lost — callers must surface this as an error (grow
    Config.sparse_capacity).
    """
    cap = store_hi.shape[0]
    hi = jnp.concatenate([store_hi, run_hi])
    lo = jnp.concatenate([store_lo, run_lo])
    cnt = jnp.concatenate([store_cnt, run_cnt])
    hi, lo, cnt = _sort3(hi, lo, cnt)
    hi, lo, cnt = _rle_sorted(hi, lo, cnt)
    hi, lo, cnt = _sort3(hi, lo, cnt)
    overflowed = hi[cap:] != SENTINEL if hi.shape[0] > cap else jnp.zeros(
        (0,), bool
    )
    overflow = jnp.any(overflowed)
    return hi[:cap], lo[:cap], cnt[:cap], overflow


# ----------------------------------------------------------------------
# round-2 compaction chain (log-structured store)
# ----------------------------------------------------------------------

def _adj_flags(hi, lo):
    """(is_start, is_end) of equal-code runs in sorted (hi, lo)."""
    s1h = jnp.full((1,), SENTINEL, hi.dtype)
    s1l = jnp.full((1,), SENTINEL, jnp.uint32)
    is_start = (hi != jnp.concatenate([s1h, hi[:-1]])) | (
        lo != jnp.concatenate([s1l, lo[:-1]])
    )
    is_end = (hi != jnp.concatenate([hi[1:], s1h])) | (
        lo != jnp.concatenate([lo[1:], s1l])
    )
    return is_start, is_end


def rle_pos(hi, lo):
    """Run totals of sorted codes with IMPLICIT count 1 per entry.

    Returns cnt: run length at each run's END position, 0 elsewhere and
    at sentinels.  Exact for any input: positions are monotone, so the
    cummax propagation cannot be corrupted by arithmetic wrap (unlike
    value-based propagation — see rle_val)."""
    n = hi.shape[0]
    is_start, is_end = _adj_flags(hi, lo)
    idx = jnp.arange(n, dtype=jnp.int32)
    spos = lax.cummax(jnp.where(is_start, idx, 0), axis=0)
    is_sent = lo == SENTINEL
    return jnp.where(is_end & ~is_sent, idx - spos + 1, 0)


def rle_val(hi, lo, cnt):
    """Run totals of sorted codes carrying explicit counts.

    total(run) = C_end - C_before_start with C = cumsum(cnt) in uint32
    (wraps are benign: differences stay exact mod 2^32, and true totals
    are bounded by the count dtype).  The run base C_before_start is
    propagated by a segmented associative_scan with a (value, seen-start)
    last-wins combiner — exact regardless of cumulative wrap, no gather.
    Returns cnt' at run ENDS, 0 elsewhere/sentinels."""
    is_start, is_end = _adj_flags(hi, lo)
    cu = cnt.astype(jnp.uint32)
    C = jnp.cumsum(cu)

    def comb(a, b):
        av, af = a
        bv, bf = b
        return jnp.where(bf, bv, av), af | bf

    base0 = jnp.where(is_start, C - cu, 0)
    base, _ = lax.associative_scan(comb, (base0, is_start))
    is_sent = lo == SENTINEL
    return jnp.where(is_end & ~is_sent, C - base, 0).astype(cnt.dtype)


@jax.jit
def compact_raw(hi, lo):
    """Raw (SENT-masked) codes -> sorted codes + run-total counts.

    Output is 'hole-laden': duplicate positions carry cnt 0 but keep
    their (sorted) code, so the array stays sorted by code and can
    re-enter a later count-carrying sort unchanged.  distinct = number
    of nonzero counts."""
    hi, lo = lax.sort((hi, lo), num_keys=2, is_stable=False)
    cnt = rle_pos(hi, lo)
    return hi, lo, cnt, jnp.count_nonzero(cnt)


@jax.jit
def compact_raw_narrow(lo):
    """k <= 15 variant: single-uint32 codes, 1-key sort (522 Melem/s)."""
    (lo,) = lax.sort((lo,), num_keys=1, is_stable=False)
    hi = jnp.zeros_like(lo)
    cnt = rle_pos(hi, lo)
    return lo, cnt, jnp.count_nonzero(cnt)


@jax.jit
def compact_counted(hi, lo, cnt):
    """Count-carrying compaction (store re-entering with new raw codes
    appended as cnt=1 entries): sort3 + value-RLE."""
    hi, lo, cnt = lax.sort((hi, lo, cnt), num_keys=2, is_stable=False)
    cnt = rle_val(hi, lo, cnt)
    return hi, lo, cnt, jnp.count_nonzero(cnt)


@jax.jit
def compact_counted_narrow(lo, cnt):
    (lo, cnt) = lax.sort((lo, cnt), num_keys=1, is_stable=False)
    hi = jnp.zeros_like(lo)
    cnt = rle_val(hi, lo, cnt)
    return lo, cnt, jnp.count_nonzero(cnt)


@jax.jit
def squeeze(hi, lo, cnt):
    """Push zero-count holes to the end (re-keyed sort), keeping live
    entries sorted by code at the front.  Used before checkpointing /
    re-entering so store arrays can be sliced to their live ladder."""
    live = cnt > 0
    khi = jnp.where(live, hi, SENTINEL)
    klo = jnp.where(live, lo, SENTINEL)
    return lax.sort((khi, klo, cnt), num_keys=2, is_stable=False)


@jax.jit
def squeeze_narrow(lo, cnt):
    klo = jnp.where(cnt > 0, lo, SENTINEL)
    (lo, cnt) = lax.sort((klo, cnt), num_keys=1, is_stable=False)
    return lo, cnt


def ladder(n: int, floor: int = 1 << 20) -> int:
    """Smallest padded size >= n from the {1, 1.5} x 2^i ladder.

    Bounds both padding waste (<= 50%, usually <= 33%) and the number of
    distinct compaction shapes that ever compile (compiles through the
    axon tunnel cost minutes)."""
    c = floor
    while True:
        if n <= c:
            return c
        if n <= c + c // 2:
            return c + c // 2
        c *= 2


def empty_store(capacity: int):
    """Fresh sentinel-filled store arrays."""
    hi = jnp.full((capacity,), SENTINEL, jnp.uint32)
    lo = jnp.full((capacity,), SENTINEL, jnp.uint32)
    cnt = jnp.zeros((capacity,), jnp.int32)
    return hi, lo, cnt


def store_to_host(hi, lo, cnt):
    """Pull a store to host and strip sentinel slots -> (codes u64, counts).

    Host side may use uint64 freely (numpy, not device).
    """
    import numpy as np

    hi = np.asarray(hi, dtype=np.uint64)
    lo = np.asarray(lo, dtype=np.uint64)
    cnt = np.asarray(cnt)
    mask = cnt > 0
    codes = (hi[mask] << np.uint64(32)) | lo[mask]
    return codes, cnt[mask]
