"""Sparse (sorted-run) count store for large k (k > 15, e.g. k=21).

The reference's count structure is an in-memory array/trie (SURVEY.md §2.1
R4); a 4^21 direct table (~17.6 TB) is impossible, so big k needs a sparse
exact structure.  The TPU-idiomatic answer is NOT a hash table with probing
(scatter races, data-dependent loops) but sort + run-length encoding
(SURVEY.md §7 M5: "prefer sort+run-length (segment_sum): fully vectorized,
exact, no probing races"):

  * batch_to_runs: a batch's (hi, lo) window codes -> sorted distinct
    (hi, lo, count) runs, sentinel-padded to the static input length.
  * merge_runs: LSM-style merge of two sorted runs (the store and a batch's
    runs) -> one sorted store, sentinel-padded to static capacity, with an
    overflow flag when distinct k-mers exceed capacity.

Codes are (hi, lo) uint32 pairs (2k-bit code split at bit 32) so no 64-bit
integers are needed on device (SURVEY.md §7 hard part 4).  The sentinel
hi = lo = 0xffffffff sorts after every real code (real hi < 2^30 for
k <= 31) and marks empty slots.

Everything is static-shaped: lax.sort with two keys does the heavy lifting
and XLA pipelines it; no data-dependent shapes anywhere.
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
