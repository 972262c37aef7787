"""KmerCounter — the flagship "model": a jitted k-mer counting step.

The framework's one workload (the reference has exactly one entry point,
SURVEY.md §1.1) is expressed like a model: `init_state()` builds the count
table, `step(state, rows)` is a pure jitted update compiled once per row
shape, `finalize(state)` materializes the spectrum on the host.  The whole
window-extract + accumulate path is fused inside a single jit so XLA keeps
intermediates (window codes, validity) out of HBM where it can.

Replaces, end to end, the reference's scan loop + count insert
(SURVEY.md §3.1 E2/E3).

Sparse-mode batching: merging the whole store every batch costs
O(cap log cap) per batch.  Instead each batch is reduced to its own sorted
runs (O(N log N), N = windows/batch) and Config.sparse_merge_every runs are
buffered before one store merge — an LSM-style amortization that cuts the
per-base merge cost by ~merge_every when cap >> N.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from findkmer_tpu.config import Config
from findkmer_tpu.ops import histogram as hist_ops
from findkmer_tpu.ops import sparse as sparse_ops
from findkmer_tpu.ops import window as window_ops
from findkmer_tpu import table as table_mod


@partial(
    jax.jit,
    static_argnames=("k", "canonical", "table_size", "method", "R"),
    donate_argnums=(0,),
)
def _dense_step(
    table: jnp.ndarray,
    batch,
    k: int,
    canonical: bool,
    table_size: int,
    method: str,
    R: int,
) -> jnp.ndarray:
    rows = window_ops.rows_from_batch(batch, R)
    codes, valid = window_ops.window_codes(rows, k, canonical)
    return hist_ops.dense_counts(codes, valid, table, table_size, method)


@partial(
    jax.jit,
    static_argnames=("k", "canonical", "R", "interpret"),
)
def _pallas_dense_step(
    table: jnp.ndarray,
    batch,
    k: int,
    canonical: bool,
    R: int,
    interpret: bool,
) -> jnp.ndarray:
    from findkmer_tpu.ops.pallas.histogram_kernel import histogram_pallas

    rows = window_ops.rows_from_batch(batch, R)
    codes, valid = window_ops.window_codes(rows, k, canonical)
    delta = histogram_pallas(codes, valid, k, interpret=interpret)
    return table + delta.astype(table.dtype)


def _window_codes_any(rows, k, canonical):
    """(hi, lo, valid) uint32 codes for any k (narrow k packs into lo)."""
    if k <= 15:
        codes, valid = window_ops.window_codes(rows, k, canonical)
        return jnp.zeros_like(codes, jnp.uint32), codes.astype(jnp.uint32), valid
    return window_ops.window_codes_wide(rows, k, canonical)


@partial(jax.jit, static_argnames=("k", "canonical", "R"))
def _batch_runs(batch, k: int, canonical: bool, R: int):
    """One batch -> its own sorted distinct (hi, lo, cnt) runs."""
    rows = window_ops.rows_from_batch(batch, R)
    whi, wlo, valid = _window_codes_any(rows, k, canonical)
    return sparse_ops.batch_to_runs(whi, wlo, valid)


@partial(jax.jit, static_argnames=("k", "canonical", "R"))
def _batch_codes(batch, k: int, canonical: bool, R: int):
    """One batch -> raw (hi, lo, cnt) window codes, invalid masked to
    sentinel.  No sort: merge_runs re-sorts its whole input anyway, so the
    flush's single big sort subsumes per-batch compaction."""
    rows = window_ops.rows_from_batch(batch, R)
    whi, wlo, valid = _window_codes_any(rows, k, canonical)
    sent = jnp.uint32(sparse_ops.SENTINEL)
    hi = jnp.where(valid, whi, sent).reshape(-1)
    lo = jnp.where(valid, wlo, sent).reshape(-1)
    cnt = valid.reshape(-1).astype(jnp.int32)
    return hi, lo, cnt


@partial(jax.jit, static_argnames=("cap",))
def _merge_pending(
    hi: jnp.ndarray,        # (fill_cap,) live prefix of the store
    lo: jnp.ndarray,
    cnt: jnp.ndarray,
    overflow: jnp.ndarray,
    pend_hi: jnp.ndarray,   # (P, N) stacked pending runs
    pend_lo: jnp.ndarray,
    pend_cnt: jnp.ndarray,
    cap: int,               # full store capacity (overflow bound)
):
    """Merge P buffered batch-runs into a store's live prefix.

    The store is sorted with sentinels at the end, so slicing it to a
    power-of-four prefix covering all live entries (fill tracking in
    KmerCounter.flush) makes the merge sort scale with CONTENTS, not
    capacity.  Output length fill_cap + P*N; the caller re-pads.
    Overflow = any real entry beyond cap.
    """
    chi = jnp.concatenate([hi, pend_hi.reshape(-1)])
    clo = jnp.concatenate([lo, pend_lo.reshape(-1)])
    ccnt = jnp.concatenate([cnt, pend_cnt.reshape(-1)])
    chi, clo, ccnt = sparse_ops._sort3(chi, clo, ccnt)
    chi, clo, ccnt = sparse_ops._rle_sorted(chi, clo, ccnt)
    chi, clo, ccnt = sparse_ops._sort3(chi, clo, ccnt)
    if chi.shape[0] > cap:
        ovf = jnp.any(chi[cap:] != sparse_ops.SENTINEL)
    else:
        ovf = jnp.zeros((), bool)
    distinct = jnp.count_nonzero(ccnt)
    return chi, clo, ccnt, overflow | ovf, distinct


@partial(jax.jit, static_argnames=("cap",))
def _compact_merge(
    mhi, mlo, mcnt,          # (main_fill_cap,) live prefix of main
    overflow,
    yhi, ylo, ycnt,          # (young_fill_cap,) live prefix of young
    pend_hi, pend_lo, pend_cnt,  # (P, N) pending runs (may be sentinels)
    cap: int,                # main capacity (overflow bound)
):
    """LSM compaction: fold young + pending into main in one sort."""
    chi = jnp.concatenate([mhi, yhi, pend_hi.reshape(-1)])
    clo = jnp.concatenate([mlo, ylo, pend_lo.reshape(-1)])
    ccnt = jnp.concatenate([mcnt, ycnt, pend_cnt.reshape(-1)])
    chi, clo, ccnt = sparse_ops._sort3(chi, clo, ccnt)
    chi, clo, ccnt = sparse_ops._rle_sorted(chi, clo, ccnt)
    chi, clo, ccnt = sparse_ops._sort3(chi, clo, ccnt)
    if chi.shape[0] > cap:
        ovf = jnp.any(chi[cap:] != sparse_ops.SENTINEL)
    else:
        ovf = jnp.zeros((), bool)
    distinct = jnp.count_nonzero(ccnt)
    return chi, clo, ccnt, overflow | ovf, distinct


def _fill_ladder(fill_val: int, cap: int) -> int:
    """Smallest power-of-4 prefix (>= 1M) covering fill, clamped to cap.

    Powers of 4 bound the number of distinct merge shapes that ever
    compile (each new shape costs minutes through the remote tunnel)."""
    c = 1 << 20
    while c < fill_val:
        c *= 4
    return min(c, cap)


def _pad_to(hi, lo, cnt, cap: int):
    """Truncate or sentinel-pad merged arrays to exactly cap entries."""
    m = hi.shape[0]
    if m >= cap:
        return hi[:cap], lo[:cap], cnt[:cap]
    pad = cap - m
    return (
        jnp.concatenate([hi, jnp.full((pad,), sparse_ops.SENTINEL,
                                      jnp.uint32)]),
        jnp.concatenate([lo, jnp.full((pad,), sparse_ops.SENTINEL,
                                      jnp.uint32)]),
        jnp.concatenate([cnt, jnp.zeros((pad,), jnp.int32)]),
    )


@dataclass
class SparseState:
    """Two-level (LSM) sparse counting state.

    pending: raw batch code runs, not yet sorted at all.
    young:   bounded sorted store absorbing flushes with SMALL sorts.
    table:   the main store; young compacts into it only when young
             would overflow (and at checkpoint/finalize), so routine
             sorts never scale with total distinct count.
    fill values may be ints or lazy device scalars from a prior merge.
    """

    table: table_mod.SparseTable
    pending: List[Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]]
    young: Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray] = None
    fill: object = 0         # live entries in table (main)
    young_fill: object = 0   # live entries in young


def make_counter(cfg: Config):
    """Counter for cfg.devices: the single-device engine (devices == 1)
    or a mesh DistributedCounter (devices == 0 -> all available, N > 1 ->
    first N).  Both expose init_state/step/flush/finalize/put_batch."""
    n = cfg.devices
    if n == 0:
        n = len(jax.devices())
    if n <= 1:
        return KmerCounter(cfg)
    from findkmer_tpu.parallel.dist import DistributedCounter
    from findkmer_tpu.parallel.mesh import make_mesh

    return DistributedCounter(cfg, make_mesh(n))


class KmerCounter:
    """Single-device k-mer counter (distribution lives in parallel/)."""

    def __init__(self, cfg: Config):
        self.cfg = cfg
        self.mode = cfg.resolved_table_mode
        if self.mode == "direct":
            m = cfg.hist
            if m == "pallas":
                from findkmer_tpu.ops.pallas import fused_count_available

                if not (fused_count_available() and cfg.k <= 10):
                    raise ValueError(
                        f"pallas hist needs pallas support and k <= 10 "
                        f"(got k={cfg.k})"
                    )
            elif m == "auto":
                # measured on v5e (bench/RESULTS.md): the pallas
                # outer-product kernel is ~5x XLA scatter for k <= 8;
                # scatter is the general-purpose fallback
                from findkmer_tpu.ops.pallas import fused_count_available

                if (
                    cfg.k <= 10
                    and fused_count_available()
                    and jax.default_backend() == "tpu"
                ):
                    m = "pallas"
                else:
                    m = "scatter"
            self._method = m
            # pallas on non-TPU backends runs in interpreter mode (tests)
            self._pl_interpret = jax.default_backend() != "tpu"

    # ------------------------------------------------------------------
    def put_batch(self, rows):
        """Host batch -> this engine's device (counter-uniform interface
        with DistributedCounter.put_batch)."""
        return jax.device_put(rows, jax.devices()[0])

    def init_state(self):
        if self.mode == "direct":
            return table_mod.make_table(self.cfg)
        ycap = min(self.cfg.sparse_young_capacity,
                   self.cfg.sparse_capacity)
        return SparseState(
            table=table_mod.SparseTable.empty(self.cfg),
            pending=[],
            young=sparse_ops.empty_store(ycap),
        )

    def step(self, state, batch):
        """One batch update.

        batch: (B, R) uint8 code rows, or a (packed, validbits) pair in
        the 2-bit H2D format (Config.packed_h2d; unpacked on device).
        """
        cfg = self.cfg
        if self.mode == "direct":
            if self._method == "pallas":
                counts = _pallas_dense_step(
                    state.counts, batch, cfg.k, cfg.canonical,
                    cfg.row_len, self._pl_interpret,
                )
                return table_mod.DenseTable(counts=counts, k=cfg.k)
            counts = _dense_step(
                state.counts,
                batch,
                cfg.k,
                cfg.canonical,
                cfg.table_size,
                self._method,
                cfg.row_len,
            )
            return table_mod.DenseTable(counts=counts, k=cfg.k)

        batch_fn = (
            _batch_runs if cfg.sparse_compact_batches else _batch_codes
        )
        runs = batch_fn(batch, cfg.k, cfg.canonical, cfg.row_len)
        state = SparseState(
            table=state.table, pending=state.pending + [runs],
            young=state.young, fill=state.fill,
            young_fill=state.young_fill,
        )
        entries = sum(p[0].shape[0] for p in state.pending)
        if (
            len(state.pending) >= max(1, cfg.sparse_merge_every)
            or entries >= cfg.sparse_flush_entries
        ):
            state = self.flush(state)
        return state

    # ------------------------------------------------------------------
    def flush(self, state):
        """Merge buffered runs into the young store (no-op for dense).

        Two-level LSM: routine flushes sort at most
        young_prefix + pending entries.  When young would overflow, young
        + pending compact into the main store instead (rare: once per
        young-capacity's worth of distinct k-mers).
        """
        if self.mode == "direct" or not getattr(state, "pending", None):
            return state
        pending = list(state.pending)
        pending_entries = sum(p[0].shape[0] for p in pending)
        # pad to the next power of two so only O(log merge_every) distinct
        # merge shapes ever compile (compiles are expensive on this tunnel)
        P = 1
        while P < len(pending):
            P *= 2
        if len(pending) < P:
            shape = pending[0][0].shape
            sent_hi = jnp.full(shape, sparse_ops.SENTINEL, jnp.uint32)
            sent_cnt = jnp.zeros(shape, jnp.int32)
            pending += [(sent_hi, sent_hi, sent_cnt)] * (P - len(pending))
        phi = jnp.stack([p[0] for p in pending])
        plo = jnp.stack([p[1] for p in pending])
        pcnt = jnp.stack([p[2] for p in pending])

        yhi, ylo, ycnt = state.young
        ycap = yhi.shape[0]
        # fill values may be the PREVIOUS merge's device scalar — long
        # since computed, so int() does not stall the pipeline
        yfill = int(state.young_fill)

        if yfill + pending_entries > ycap:
            return self._compact(state, phi, plo, pcnt, yfill)

        ypref = _fill_ladder(yfill, ycap)
        hi, lo, cnt, _ovf, distinct = _merge_pending(
            yhi[:ypref], ylo[:ypref], ycnt[:ypref],
            jnp.zeros((), bool), phi, plo, pcnt, ycap,
        )
        # bound check above guarantees distinct <= ycap (no young loss)
        hi, lo, cnt = _pad_to(hi, lo, cnt, ycap)
        return SparseState(
            table=state.table, pending=[], young=(hi, lo, cnt),
            fill=state.fill, young_fill=distinct,
        )

    def _compact(self, state, phi, plo, pcnt, yfill):
        """Fold young + pending into the main store (the rare big sort)."""
        t = state.table
        cap = t.hi.shape[0]
        yhi, ylo, ycnt = state.young
        ycap = yhi.shape[0]
        mpref = _fill_ladder(int(state.fill), cap)
        ypref = _fill_ladder(yfill, ycap)
        hi, lo, cnt, ovf, distinct = _compact_merge(
            t.hi[:mpref], t.lo[:mpref], t.cnt[:mpref], t.overflow,
            yhi[:ypref], ylo[:ypref], ycnt[:ypref],
            phi, plo, pcnt, cap,
        )
        hi, lo, cnt = _pad_to(hi, lo, cnt, cap)
        return SparseState(
            table=table_mod.SparseTable(
                hi=hi, lo=lo, cnt=cnt, overflow=ovf, k=t.k
            ),
            pending=[],
            young=sparse_ops.empty_store(ycap),
            fill=distinct,      # device scalar; materialized by next use
            young_fill=0,
        )

    _SENT_RUN_N = 8

    def _compact_all(self, state):
        """Flush pending, then fold young into main (for checkpoint or
        finalize).  No-op when both are already empty."""
        state = self.flush(state)
        if int(state.young_fill) == 0:
            return state
        sent_hi = jnp.full((1, self._SENT_RUN_N), sparse_ops.SENTINEL,
                           jnp.uint32)
        sent_cnt = jnp.zeros((1, self._SENT_RUN_N), jnp.int32)
        return self._compact(
            state, sent_hi, sent_hi, sent_cnt, int(state.young_fill)
        )

    def finalize(self, state):
        """Materialize the spectrum on host.

        direct -> np counts (4^k,); sparse -> (codes uint64, counts).
        """
        if self.mode == "direct":
            return state.to_host()
        state = self._compact_all(state)
        return state.table.to_host()

    # ------------------------------------------------------------------
    def table_state(self, state):
        """The checkpointable table (flushing pending sparse runs first)."""
        if self.mode == "direct":
            return state, state
        state = self._compact_all(state)
        return state, state.table

    def restore_state(self, table):
        """Rebuild step state from a checkpointed table."""
        if self.mode == "direct":
            return table
        fill = int(np.count_nonzero(np.asarray(table.cnt)))
        ycap = min(self.cfg.sparse_young_capacity,
                   self.cfg.sparse_capacity)
        return SparseState(
            table=table, pending=[],
            young=sparse_ops.empty_store(ycap), fill=fill,
        )

    # ------------------------------------------------------------------
    def jitted_forward(self):
        """(fn, example_args) for compile checks (__graft_entry__.entry)."""
        cfg = self.cfg
        rows = jnp.full(
            (cfg.batch_rows, cfg.row_len), 4, jnp.uint8
        )
        if self.mode == "direct":
            table = jnp.zeros((cfg.table_size,), jnp.dtype(cfg.count_dtype))

            def fn(table, rows):
                return _dense_step(
                    table, rows, cfg.k, cfg.canonical, cfg.table_size,
                    "scatter" if self._method == "pallas" else self._method,
                    cfg.row_len,
                )

            return fn, (table, rows)

        hi, lo, cnt = sparse_ops.empty_store(cfg.sparse_capacity)

        def fn(hi, lo, cnt, rows):
            rhi, rlo, rcnt = _batch_runs(rows, cfg.k, cfg.canonical,
                                         cfg.row_len)
            return sparse_ops.merge_runs(hi, lo, cnt, rhi, rlo, rcnt)

        return fn, (hi, lo, cnt, rows)
