"""Dense count-table accumulation (k <= ~15, direct-addressed 4^k table).

TPU-native replacement for the reference's count-insert (SURVEY.md §3.1 E3:
`counts[code]++` / trie walk).  A per-byte random RMW becomes one of several
batched, deterministic device algorithms — selected by Config.hist, with
HIST_AUTO picking per table size:

  * scatter — one `table.at[codes].add(1)` over the whole batch.  XLA lowers
    to a serialized scatter on TPU; simple, exact, the M1 baseline.
  * sort    — sort the batch's codes, run-length-encode, scatter only the
    distinct codes' run lengths.  Fewer RMWs when codes repeat; also the
    deterministic cross-check for every other path (the de-facto race
    detector, SURVEY.md §5).
  * onehot  — one-hot matmul on the MXU: counts += 1s-vector @ onehot(codes).
    Compute-heavy (N * 4^k MACs) but contention-free; only sensible for
    small k.

All paths route invalid windows to a trash bin at index 4^k so the compute
is branch-free; the trash bin is dropped before results are read.
"""

from __future__ import annotations

from functools import partial
import jax
import jax.numpy as jnp
from jax import lax


def _flat_codes(codes: jnp.ndarray, valid: jnp.ndarray, table_size: int):
    """Flatten (B, W) codes, sending invalid windows to the trash bin."""
    idx = jnp.where(valid, codes, table_size)
    return idx.reshape(-1)


@partial(jax.jit, static_argnames=("table_size",), donate_argnums=(2,))
def add_counts_scatter(
    codes: jnp.ndarray, valid: jnp.ndarray, table: jnp.ndarray, table_size: int
) -> jnp.ndarray:
    """table (4^k,) += histogram(codes[valid]) via XLA scatter-add."""
    idx = _flat_codes(codes, valid, table_size)
    # invalid windows carry the OOB index table_size -> dropped by the
    # scatter, so no table-sized padding copy is needed
    return table.at[idx].add(1, mode="drop")


@partial(jax.jit, static_argnames=("table_size",), donate_argnums=(2,))
def add_counts_sort(
    codes: jnp.ndarray, valid: jnp.ndarray, table: jnp.ndarray, table_size: int
) -> jnp.ndarray:
    """table += histogram via sort + run-length + sparse scatter.

    Deterministic reduction order; used as the cross-check oracle for the
    scatter and Pallas paths in tests.
    """
    idx = jnp.sort(_flat_codes(codes, valid, table_size))
    n = idx.shape[0]
    # run starts: first element of each equal-code run
    prev = jnp.concatenate([jnp.full((1,), -1, idx.dtype), idx[:-1]])
    is_start = idx != prev
    # run id of each element; run_count = segment length
    run_id = jnp.cumsum(is_start) - 1
    run_len = jax.ops.segment_sum(
        jnp.ones_like(idx), run_id, num_segments=n
    )
    # code of each run: scatter idx at starts into run slots
    run_code = jnp.zeros((n,), idx.dtype).at[run_id].max(idx)
    # add run lengths at their codes (runs beyond the distinct count have
    # run_len 0 and run_code 0 -> adding 0 is harmless; the trash-bin run
    # carries the OOB code table_size and is dropped)
    return table.at[run_code].add(run_len.astype(table.dtype), mode="drop")


@partial(jax.jit, static_argnames=("table_size", "chunk"), donate_argnums=(2,))
def add_counts_onehot(
    codes: jnp.ndarray,
    valid: jnp.ndarray,
    table: jnp.ndarray,
    table_size: int,
    chunk: int = 512,
) -> jnp.ndarray:
    """table += histogram via one-hot matmul on the MXU.

    counts[t] = sum_n [codes[n] == t]; computed as int32 matmul of a ones
    row against one-hot tiles so the MXU does the reduction.  Memory-safe:
    one (chunk, table_size) int8 tile at a time via lax.scan.
    """
    idx = _flat_codes(codes, valid, table_size)
    n = idx.shape[0]
    pad = (-n) % chunk
    idx = jnp.concatenate([idx, jnp.full((pad,), table_size, idx.dtype)])
    tiles = idx.reshape(-1, chunk)

    bins = lax.broadcasted_iota(jnp.int32, (1, table_size), 1)

    def body(acc, tile):
        onehot = (tile[:, None] == bins).astype(jnp.int8)  # (chunk, T)
        ones = jnp.ones((1, chunk), jnp.int8)
        acc = acc + jnp.dot(
            ones, onehot, preferred_element_type=jnp.int32
        )[0].astype(acc.dtype)
        return acc, None

    out, _ = lax.scan(body, table, tiles)
    return out


_DENSE_FNS = {
    "scatter": add_counts_scatter,
    "sort": add_counts_sort,
    "onehot": add_counts_onehot,
}


def dense_counts(
    codes: jnp.ndarray,
    valid: jnp.ndarray,
    table: jnp.ndarray,
    table_size: int,
    method: str = "scatter",
) -> jnp.ndarray:
    """Dispatch to a dense accumulation method by name."""
    if method in ("auto", "pallas"):
        # pallas dispatching lives in models/counter.py (needs k); default
        # to scatter here
        method = "scatter"
    return _DENSE_FNS[method](codes, valid, table, table_size)


@partial(jax.jit, static_argnames=("table_size",))
def histogram(codes: jnp.ndarray, valid: jnp.ndarray, table_size: int):
    """Fresh histogram (no accumulation) — convenience for tests."""
    table = jnp.zeros((table_size,), jnp.int32)
    return add_counts_scatter(codes, valid, table, table_size)
