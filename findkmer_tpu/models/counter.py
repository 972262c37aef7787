"""KmerCounter — the flagship "model": a jitted k-mer counting step.

The framework's one workload (the reference has exactly one entry point,
SURVEY.md §1.1) is expressed like a model: `init_state()` builds the count
table, `step(state, rows)` is a pure jitted update compiled once per row
shape, `finalize(state)` materializes the spectrum on the host.  The whole
window-extract + accumulate path is fused inside a single jit so XLA keeps
intermediates (window codes, validity) out of HBM where it can.

Replaces, end to end, the reference's scan loop + count insert
(SURVEY.md §3.1 E2/E3).

Sparse mode (k > direct_k_max) is a log-structured sorted store, designed
from the round-2 device probes (bench/RESULTS.md):

  * step: extract window codes, append them RAW to a growing device
    buffer (dynamic_update_slice into a donated buffer — no sort, no
    merge, no host sync).  Measured truth: merging sorted runs on TPU is
    best done by re-sorting the concatenation (unstable lax.sort runs
    360-520 Melem/s at any size while hand-built merge networks run at
    70), so any sorting before the final one is wasted work.
  * compaction (rare: raw buffer reaches sparse_compact_entries, or
    checkpoint/finalize): one unstable ROW-WISE sort of [store-live +
    raw] + an RLE of pure scans (no gathers) -> a (STORE_ROWS, cols)
    store of independent sorted runs.  Rows are arbitrary partitions
    of the code multiset; row sorts measure 1.5x the flat sort because
    each bitonic stage shrinks with row length (bench/probe_compact).
    The store stays 'hole-laden' (duplicates keep their code with
    count 0) so it can re-enter the next sort unchanged; holes are
    squeezed out with one extra sort only when they exceed the live
    size.
  * finalize: the same chain once, a squeeze to the live ladder (cuts
    D2H bytes), then D2H + host-side strip and ONE parallel C heap
    merge of the rows (io/native.merge_runs) fused into the output
    tail.

All shapes come from a {1, 1.5} x 2^i ladder so only a handful of
programs ever compile (each new shape costs minutes through the axon
tunnel).  No device->host sync on the step path; compactions read the
PREVIOUS compaction's distinct-count scalar (long since resolved).
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from findkmer_tpu.config import Config
from findkmer_tpu.models import rowstore
from findkmer_tpu.models.rowstore import RowStoreMixin
from findkmer_tpu.ops import compaction
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


@partial(jax.jit, static_argnames=("k", "canonical", "R"))
def _batch_codes(batch, k: int, canonical: bool, R: int):
    """One batch -> flat raw window-code arrays, invalid as sentinel.

    k <= 15: (lo,) single uint32 codes (1-key sorts downstream);
    k > 15:  (hi, lo) uint32 pair.  No sorting, no counts — raw codes
    accumulate and one compaction sort does everything.

    Packed batches skip the byte unpack entirely: window_codes_packed
    extracts codes straight from the 2-bit wire words (~1 op/window vs
    ~4k for the slice-OR chain); its residue-interleaved order is fine
    here because the sparse store sorts everything anyway.

    For 16 <= k <= 23 the hi plane is narrowed to uint16
    (sparse_ops.hi_dtype): the truncating cast maps the uint32
    sentinel to 0xFFFF and real hi words (< 2^14) losslessly, fuses
    into the extraction jit for free, and cuts both the ingest append
    and every compaction sort from 8 to 6 B/window
    (bench/probe_hisort.py)."""
    hdt = sparse_ops.hi_dtype(k)

    def _narrow_hi(parts):
        if k > 15 and hdt != np.uint32:
            return (parts[0].astype(hdt),) + tuple(parts[1:])
        return parts

    if isinstance(batch, (tuple, list)):
        return _narrow_hi(window_ops.window_codes_packed(
            batch[0], batch[1], k, canonical, R=R
        ))
    rows = batch
    sent = jnp.uint32(sparse_ops.SENTINEL)
    if k <= 15:
        codes, valid = window_ops.window_codes(rows, k, canonical)
        return (
            jnp.where(valid, codes.astype(jnp.uint32), sent).reshape(-1),
        )
    whi, wlo, valid = window_ops.window_codes_wide(rows, k, canonical)
    return _narrow_hi((
        jnp.where(valid, whi, sent).reshape(-1),
        jnp.where(valid, wlo, sent).reshape(-1),
    ))


# Shared raw-buffer append/grow (models/rowstore.py — ONE jitted
# implementation for this engine's 1-D buffers and dist.py's 2-D
# row-sharded ones; round-4 verdict weak #3 fold)
_append = rowstore.append_raw
_grow = rowstore.grow_raw


@partial(jax.jit, static_argnames=("k", "canonical", "R"), donate_argnums=(0,))
def _ingest(bufs, batch, offset, k: int, canonical: bool, R: int):
    """Fused extract + append: one launch per batch instead of two.

    The step path is launch-overhead-bound on this environment (~2.4 ms
    of per-launch overhead vs ~1.4 ms of extraction compute per 2 Mbase
    batch; bench/RESULTS.md round 2), so the extraction writes straight
    into the donated raw buffers.  `offset` is a device scalar so one
    trace covers every fill position."""
    parts = _batch_codes(batch, k, canonical, R)
    return tuple(
        lax.dynamic_update_slice(b, p, (offset,))
        for b, p in zip(bufs, parts)
    )


@partial(jax.jit, static_argnames=("cap", "dtypes"))
def _fresh(cap: int, dtypes):
    return tuple(
        jnp.full((cap,), sparse_ops.sent_of(dt), dt) for dt in dtypes
    )


# Rows of the log-structured store.  The compaction sort runs row-wise:
# 64 independent rows sort at 461 Melem/s vs 307 flat at 50M 2-key
# (bench/probe_compact.py) because each bitonic stage shrinks with the
# row length.  Rows are arbitrary partitions of the code multiset —
# equal codes in different rows merge in the HOST output tail
# (io/native.py merge_runs, one heap pass fused into D2H/format).
# Minimum row count (the round-2 value; also the per-pass cap of the C
# heap merge — larger row counts merge hierarchically in 256-run
# chunks, ops/sparse.merge_host_runs).
STORE_ROWS = 64
# column-count ladder floor: STORE_ROWS * COL_FLOOR == the flat ladder's
# 4096 floor, so total store sizes stay on the same ladder as round 1
COL_FLOOR = 64


def _store_rows(cap0: int) -> int:
    """Row count G of the (G, cols) store for raw capacity cap0.

    Shared geometry rule (ops/compaction.row_geometry — measured
    economics in its docstring): power of two from the round-2
    STORE_ROWS=64 floor, <= cap0/128, capped at 262144 (round 4).
    Test-scale caps (4096) keep the round-2 G=64."""
    return compaction.row_geometry(cap0, g0=STORE_ROWS)


# Shared row-store compaction chain (ops/compaction.py — ONE
# implementation for this engine and parallel/dist.py's dp_sparse;
# round-3 weak #3 fold):
_compact_raw_dev = compaction.compact_raw_rows
_compact_counted_dev = compaction.compact_counted_rows
_squeeze_slice_dev = compaction.squeeze_slice
_squeeze_slice_keep = compaction.squeeze_slice_keep


@dataclass
class _WirePlan:
    """The ordered finalize's in-flight pull plan (see _ordered_pull).

    code_chunks[i] covers spans[i]; cnt_chunks is the u8 count plane
    (count-plane wire) or None (counts default 1 + exceptions).
    exc_idx/exc_cnt are count exceptions (counts > 1) or >255 escapes
    over the plane — same overlay mechanics either way.  runs are the
    run-coded top bits applied at run_shift."""

    spans: list
    code_chunks: list
    cnt_chunks: Optional[list]
    exc_idx: np.ndarray
    exc_cnt: np.ndarray
    n_live: int
    runs: Optional[tuple]
    run_shift: int


@dataclass
class SparseState:
    """Log-structured sparse counting state.

    raw:   SENT-initialized growing code buffers ((lo,) or (hi, lo));
           fill is host-tracked (batch sizes are static), so the step
           path never syncs with the device.
    store: (STORE_ROWS, store_len) hole-laden row store from the last
           compaction (None before the first): each row independently
           sorted + RLE'd, rows merged host-side at finalize.
    distinct: per-row distinct vector ((G,) device array or np) from
           the last compaction; read host-side only at the NEXT
           compaction, when it has long since resolved — never stalls
           the pipeline.
    """

    raw: Tuple[jnp.ndarray, ...]
    fill: int = 0
    store: Optional[Tuple[jnp.ndarray, ...]] = None
    store_len: int = 0
    distinct: object = 0


def make_counter(cfg: Config):
    """Counter for cfg.devices: the single-device engine (devices == 1)
    or a mesh DistributedCounter (devices == 0 -> all available, N > 1 ->
    first N).  Both expose init_state/step/flush/finalize/put_batch."""
    from findkmer_tpu.utils.shmalloc import ensure_shared_alloc

    ensure_shared_alloc()  # before this run's big host buffers exist
    # LOCAL devices: under a jax.distributed group this host counts its
    # batch shard on its own chips and partials merge collectively
    # (parallel/multihost.py) — a mesh over jax.devices() would grab
    # other hosts' non-addressable chips
    n = cfg.devices
    if n == 0:
        n = len(jax.local_devices())
    if n <= 1:
        return KmerCounter(cfg)
    from findkmer_tpu.parallel.dist import DistributedCounter
    from findkmer_tpu.parallel.mesh import make_mesh

    return DistributedCounter(cfg, make_mesh(n, devices=jax.local_devices()))


class KmerCounter(RowStoreMixin):
    """Single-device k-mer counter (distribution lives in parallel/)."""

    def _dedup_geometry(self):
        """Store geometry for the shared capacity/dedup machinery
        (models/rowstore.py): one device group of G rows."""
        return 1, self._rows, COL_FLOOR

    def __init__(self, cfg: Config):
        self.cfg = cfg
        self.mode = cfg.resolved_table_mode
        if cfg.count_dtype == "int64" and not jax.config.jax_enable_x64:
            # int64 counts need 64-bit mode; enabling it here is safe as
            # long as no 32-bit traces were cached yet (the CLI
            # constructs the counter before any device work)
            jax.config.update("jax_enable_x64", True)
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
        self._spill_n = 0
        if self.mode != "direct":
            # store-row geometry is fixed per counter: every raw cap
            # this counter will ever reshape is a ladder value >= the
            # initial cap, all divisible by this power of two
            self._rows = _store_rows(self._raw_cap0())
        if cfg.spill_dir:
            if self.mode != "sparse":
                raise ValueError(
                    "--spill requires a sparse table "
                    f"(k={cfg.k} resolves to a direct table)"
                )
            # the stale-run refusal happens in init_state (fresh count)
            # or adopt_spill_runs (checkpoint resume), not here — the
            # constructor cannot know which path follows
            import os

            os.makedirs(cfg.spill_dir, exist_ok=True)

    # ------------------------------------------------------------------
    def put_batch(self, rows):
        """Host batch -> this engine's device (counter-uniform interface
        with DistributedCounter.put_batch)."""
        # local_devices: under a multi-process jax.distributed group,
        # jax.devices() lists GLOBAL devices and [0] may not be
        # addressable from this host
        return jax.device_put(rows, jax.local_devices()[0])

    @property
    def _buf_dtypes(self):
        """Raw code-buffer dtypes: (lo,) narrow; (hi, lo) wide with the
        hi plane narrowed to uint16 for 16 <= k <= 23 (sparse_ops
        .hi_dtype — 25% fewer sort/append bytes; probe_hisort.py)."""
        if self.cfg.k <= 15:
            return (np.uint32,)
        return (sparse_ops.hi_dtype(self.cfg.k), np.uint32)

    def _raw_cap0(self) -> int:
        """Initial raw-buffer capacity: the expected-size hint when the
        caller knows it (one shape compiles), else a couple of batches'
        worth with doubling growth.

        When the hint says the input is SMALLER than one batch, the
        2-batch floor is dropped to ~2x the hint (slack for record
        separators and tail-rung padding; the pipeline's tail shrink
        emits a matching small batch) — a 50 kb input no longer
        allocates 2 x 67M-slot buffers.  Underestimates self-heal: the
        step grows buffers by ladder doubling."""
        per_batch = self.cfg.batch_rows * self.cfg.window_len
        exp = self.cfg.sparse_expected_entries
        if exp:
            want = max(exp, 2 * per_batch)
            if exp < per_batch:
                want = min(want, 2 * exp + 4096)
        else:
            want = 2 * per_batch
        return sparse_ops.ladder(
            min(want, self._target_cap()), floor=4096
        )

    def _target_cap(self) -> int:
        return sparse_ops.ladder(
            max(self.cfg.sparse_compact_entries,
                self.cfg.batch_rows * self.cfg.window_len),
            floor=4096,
        )

    def init_state(self):
        if self.mode == "direct":
            return table_mod.make_table(self.cfg)
        if self._spill_n:
            raise RuntimeError(
                "this counter already spilled runs for a previous "
                "state; use a fresh counter (and an empty spill dir) "
                "per count"
            )
        if self.cfg.spill_dir:
            from findkmer_tpu import spill

            spill.init_dir(self.cfg.spill_dir)  # refuses stale runs
        return SparseState(raw=_fresh(self._raw_cap0(), self._buf_dtypes))

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

        n = self._batch_slots(batch)
        raw, fill = state.raw, state.fill
        store, store_len, distinct = (
            state.store, state.store_len, state.distinct
        )
        cap = raw[0].shape[0]
        target = self._target_cap()
        if fill + n > cap:
            if fill + n > target:
                state = self.compact(state)
                raw, fill = state.raw, 0
                store, store_len, distinct = (
                    state.store, state.store_len, state.distinct
                )
                cap = raw[0].shape[0]
            while fill + n > cap:
                cap = sparse_ops.ladder(
                    max(fill + n, 2 * cap), floor=4096
                )
                raw = _grow(raw, cap)
        raw = _ingest(
            raw, batch, jnp.int32(fill), cfg.k, cfg.canonical, cfg.row_len
        )
        return SparseState(
            raw=raw, fill=fill + n, store=store, store_len=store_len,
            distinct=distinct,
        )

    def _batch_slots(self, batch) -> int:
        """Raw slots a batch emits — from shapes only (eval_shape; no
        device work), cached per batch geometry."""
        if isinstance(batch, (tuple, list)):
            key = (tuple(batch[0].shape), tuple(batch[1].shape), True)
        else:
            key = (tuple(batch.shape), None, False)
        cache = getattr(self, "_slots_cache", None)
        if cache is None:
            cache = self._slots_cache = {}
        n = cache.get(key)
        if n is None:
            cfg = self.cfg
            out = jax.eval_shape(
                partial(
                    _batch_codes, k=cfg.k, canonical=cfg.canonical,
                    R=cfg.row_len,
                ),
                batch,
            )
            n = cache[key] = out[0].shape[0]
        return n

    # ------------------------------------------------------------------
    def compact(self, state):
        """Fold the raw code buffer into the sorted row store (one
        unstable row-wise sort + scan-RLE; bench/probe_compact.py).
        No-op for dense or when nothing is buffered.

        store_len counts COLUMNS of the (STORE_ROWS, store_len) store;
        distinct is the per-row distinct vector from the last
        compaction's RLE (device (G,) array, read host-side one
        compaction later when it has long since resolved)."""
        if self.mode == "direct":
            return state
        if state.fill == 0 and state.store is not None:
            return state
        cfg = self.cfg
        G = self._rows
        cap = state.raw[0].shape[0]
        if state.store is None:
            store, drows = _compact_raw_dev(
                state.raw, G, cap // G, cdtype=jnp.dtype(cfg.count_dtype)
            )
            Lc = cap // G
        else:
            # previous compaction's per-row scalars: long since resolved
            d = np.asarray(state.distinct)
            if self._distinct_total(d) > self.cfg.sparse_capacity:
                # fold cross-row duplicates first: the sum counts store
                # ENTRIES, and only the exact distinct count should
                # decide spill/error (_dedup_state docstring)
                state, d = self._dedup_state(state)
                d = np.asarray(d)
            if self.cfg.spill_dir and self._distinct_total(d) > self.cfg.sparse_capacity:
                # disk spill (spill.py): persist the sorted store as a
                # run file and restart it — raw compacts fresh below
                self._spill_store(state.store)
                store, drows = _compact_raw_dev(
                    state.raw, G, cap // G,
                    cdtype=jnp.dtype(cfg.count_dtype),
                )
                return SparseState(
                    raw=_fresh(cap, self._buf_dtypes), fill=0, store=store,
                    store_len=cap // G, distinct=drows,
                )
            self._check_capacity(self._distinct_total(d))
            store, store_cols = state.store, state.store_len
            Ldc = sparse_ops.ladder(int(d.max()), floor=COL_FLOOR)
            if store_cols > 2 * Ldc:
                # hole fraction > 1/2: squeeze rows before re-sorting
                store = _squeeze_slice_dev(store, Ldc)
                store_cols = Ldc
            Lc = sparse_ops.ladder(store_cols + cap // G, floor=COL_FLOOR)
            store, drows = _compact_counted_dev(store, state.raw, G, Lc)
        return SparseState(
            raw=_fresh(cap, self._buf_dtypes), fill=0,
            store=store, store_len=Lc, distinct=drows,
        )

    def flush(self, state):
        """Back-compat alias: force a compaction (checkpoint/bench)."""
        return self.compact(state)

    # _check_capacity / _dedup_state / _ensure_capacity / adopt_spill_runs
    # are shared with the dp_sparse engine — models/rowstore.RowStoreMixin
    # (geometry from _dedup_geometry above)

    def _spill_store(self, store):
        """Pull the compacted store (ordered finalize: globally sorted
        distinct codes + counts) and persist it as a spill run."""
        from findkmer_tpu import spill

        codes, counts = self._finalize_ordered(store)
        spill.write_run(self.cfg.spill_dir, self._spill_n, codes, counts)
        self._spill_n += 1

    def _spill_runs(self):
        from findkmer_tpu import spill

        return spill.load_runs(self.cfg.spill_dir)

    def _store_to_host(self, store, timers=None):
        """Row store -> host (codes uint64 sorted distinct, counts).

        Rows are sorted/deduped hole-laden runs; the host strips holes
        and heap-merges the G runs in one C pass (io/native.merge_runs),
        fused into the D2H tail."""
        import contextlib

        ph = timers.phase if timers is not None else (
            lambda name: contextlib.nullcontext()
        )
        with ph("finalize/d2h"):
            arrs = [
                None if a is None else np.asarray(a)
                for a in ((None,) + tuple(store) if len(store) == 2
                          else tuple(store))
            ]
        with ph("finalize/merge"):
            return sparse_ops.store_to_host_2d(*arrs)

    def finalize(self, state, timers=None):
        """Materialize the spectrum on host.

        direct -> np counts (4^k,); sparse -> (codes uint64, counts).

        Sparse default is the ORDERED finalize: one global flat sort +
        RLE + squeeze on device leaves a globally sorted distinct live
        prefix, pulled in async chunks with counts wired as exceptions
        (positions with count > 1; ~1% at chr scale) — no host heap
        merge at all and ~33% (wide) / ~50% (narrow) fewer D2H bytes on
        the tunnel.  FINDKMER_ORDERED_FINALIZE=0 restores the row-store
        heap-merge path (also used by restore/dist code)."""
        if self.mode == "direct":
            return state.to_host()
        import contextlib
        import os

        ph = timers.phase if timers is not None else (
            lambda name: contextlib.nullcontext()
        )
        with ph("finalize/compact"):
            state = self.compact(state)
            # D2H of the compaction's distinct vector serializes on the
            # device chain (block_until_ready returns early on axon —
            # CLAUDE.md gotcha #3)
            state, d = self._ensure_capacity(state)
        if self._spill_n:
            parts = list(self._merged_spill_chunks(state, ph))
            return (
                np.concatenate([c for c, _ in parts]),
                np.concatenate([n for _, n in parts]),
            ) if parts else (np.empty(0, np.uint64), np.empty(0, np.int64))
        if os.environ.get("FINDKMER_ORDERED_FINALIZE", "1") != "1":
            with ph("finalize/squeeze"):
                # squeeze holes out and slice to the live ladder before
                # the pull: one extra device sort (~ms) cuts D2H bytes
                # by the hole+padding fraction (25-40% at chr scale)
                store = state.store
                Ldc = sparse_ops.ladder(int(d.max()), floor=COL_FLOOR)
                if state.store_len > Ldc:
                    store = _squeeze_slice_keep(store, Ldc)
            return self._store_to_host(store, timers=timers)
        return self._finalize_ordered(state.store, timers=timers)

    def _ordered_pull(self, store, ph):
        """Shared front of the ordered finalize: global device sort,
        scalar sync, wire-leg choice, slice, and the chunked async pull
        plan.  Returns a _WirePlan — every chunk's D2H is already in
        flight when this returns.

        Wire v2 (round 5; measured design in bench/probe_finalize_wire
        + RESULTS.md): the CODE leg and the COUNT leg are chosen
        independently from this store's measured stats:
          * codes: 3 u8 byte planes + run-coded top bits (code >> 24,
            apply shift 24) when 8*n_runs < N — 3 B/entry for ANY k
            with few top-runs (always for k <= 12; k=21: <= 4^9+1).
            Fallbacks: lo + run-coded hi (shift 32, wide k <= 26,
            4 B/entry) or per-entry planes.
          * counts: a u8 plane + >255 escapes when 8*n_multi > N
            (repeat-heavy stores: 1 B/entry), else count exceptions
            (positions with count > 1: 8 B/exception, ~1% at chr
            scale)."""
        k = self.cfg.k
        with ph("finalize/global_sort"):
            if len(store) == 2:
                lo, cnt, n_live, n_multi = (
                    sparse_ops.global_compact_narrow(*store)
                )
                codes_dev = (lo,)
            else:
                hi, lo, cnt, n_live, n_multi = (
                    sparse_ops.global_compact_wide(*store)
                )
                codes_dev = (hi, lo)
            n_live = int(np.asarray(n_live))
            n_multi = int(np.asarray(n_multi))
        if n_live == 0:
            return _WirePlan(
                spans=[], code_chunks=[], cnt_chunks=None,
                exc_idx=np.empty(0, np.int64),
                exc_cnt=np.empty(0, np.int64), n_live=0, runs=None,
                run_shift=32,
            )
        total = int(codes_dev[0].shape[0])
        N = min(sparse_ops.ladder(n_live, floor=4096), total)
        with ph("finalize/wire_stats"):
            if len(codes_dev) == 1:
                stats = sparse_ops.wire_stats_narrow(codes_dev[0], cnt)
            else:
                stats = sparse_ops.wire_stats_wide(
                    codes_dev[0], codes_dev[1], cnt
                )
            stats = np.asarray(stats)
            n_big, n_runs = int(stats[0]), int(stats[1])
        # byte-plane leg needs the composite top word (code bits >= 24,
        # i.e. 2k-24 bits) to fit uint32 on device: k <= 28 for wide
        # stores (k=29+ would wrap (hi << 8) and corrupt codes —
        # round-5 fuzz seed 77 trials 128/158/237/272/293), always for
        # narrow (<= 6 bits)
        bytes3 = 8 * n_runs < N and (len(codes_dev) == 1 or k <= 28)
        count_plane = 8 * n_multi > N
        runs_dev = None
        run_shift = 24
        cnt8 = None
        with ph("finalize/slice"):
            if bytes3:
                HR = min(sparse_ops.ladder(n_runs + 1, floor=256), N)
                if len(codes_dev) == 2:
                    b0, b1, b2, ridx, rtop = (
                        sparse_ops.slice_bytes_runs_wide(
                            codes_dev[0], codes_dev[1], N, HR
                        )
                    )
                else:
                    b0, b1, b2, ridx, rtop = (
                        sparse_ops.slice_bytes_runs_narrow(
                            codes_dev[0], N, HR
                        )
                    )
                codes_dev = (b0, b1, b2)
                runs_dev = (ridx, rtop)
            elif len(codes_dev) == 2 and k <= 26:
                HR = min(4 ** (k - 16) + 1, N)
                lo, ridx, rhi = sparse_ops.slice_lo_runs(
                    codes_dev[0], codes_dev[1], N, HR
                )
                codes_dev = (lo,)
                runs_dev = (ridx, rhi)
                run_shift = 32
            else:
                codes_dev = sparse_ops.slice_codes(codes_dev, N)
            if count_plane:
                E = min(sparse_ops.ladder(max(n_big, 1), floor=256), N)
                cnt8, exc_idx, exc_cnt = sparse_ops.slice_cnt_plane(
                    cnt, N, E
                )
                n_exc = n_big
            else:
                E = min(
                    sparse_ops.ladder(max(n_multi, 1), floor=256), N
                )
                exc_idx, exc_cnt = sparse_ops.slice_exc(cnt, N, E)
                n_exc = n_multi
        with ph("finalize/d2h_start"):
            # pull the SMALL side tables first (exceptions + runs):
            # they must be on host before the first chunk can be
            # consumed, and behind the bulk chunk transfers they would
            # serialize the whole wire ahead of any host work
            exc_idx_h = np.asarray(exc_idx)[:n_exc].astype(np.int64)
            exc_cnt_h = np.asarray(exc_cnt)[:n_exc].astype(np.int64)
            runs = None
            if runs_dev is not None:
                ridx_h = np.asarray(runs_dev[0])
                rv_h = np.asarray(runs_dev[1])
                real = ridx_h < n_live  # fills carry start == N
                runs = (ridx_h[real].astype(np.int64), rv_h[real])
            # then issue every chunk's transfer: chunk i widens /
            # formats / writes on host while chunks i+1.. stream.
            # FINDKMER_FINALIZE_CHUNKS forces the chunk count (tests
            # exercise the multi-chunk reassembly on small stores)
            import os

            n_chunks = int(
                os.environ.get("FINDKMER_FINALIZE_CHUNKS", "0")
            )
            if n_chunks <= 0:  # <= 0 (incl. typos) means auto — a
                # negative count would build an EMPTY span list and
                # return uninitialized memory as the spectrum
                n_chunks = min(8, max(1, N // (1 << 22)))
            step = -(-N // n_chunks)
            spans = [(a, min(a + step, N)) for a in range(0, N, step)]
            code_chunks = [
                tuple(c[a:b] for c in codes_dev) for a, b in spans
            ]
            cnt_chunks = None
            if cnt8 is not None:
                cnt_chunks = [cnt8[a:b] for a, b in spans]
            for i, chs in enumerate(code_chunks):
                for c in chs:
                    try:
                        c.copy_to_host_async()
                    except Exception:
                        pass
                if cnt_chunks is not None:
                    try:
                        cnt_chunks[i].copy_to_host_async()
                    except Exception:
                        pass
        return _WirePlan(
            spans=spans, code_chunks=code_chunks, cnt_chunks=cnt_chunks,
            exc_idx=exc_idx_h, exc_cnt=exc_cnt_h, n_live=n_live,
            runs=runs, run_shift=run_shift,
        )

    @staticmethod
    def _widen_chunk(chs, m, a=0, runs=None, shift=32):
        """Device chunk arrays -> host uint64 codes for span [a, a+m).

        chs: 3 byte planes (v2 byte wire), (hi, lo) per-entry planes,
        or (lo,).  runs: (run_starts, run_vals) when the top bits
        travel run-coded — the runs overlapping this span are OR'd in
        at `shift` segment-wise (a handful of segments per chunk)."""
        if len(chs) == 3:
            codes = (
                np.asarray(chs[0])[:m].astype(np.uint64)
                | (np.asarray(chs[1])[:m].astype(np.uint64)
                   << np.uint64(8))
                | (np.asarray(chs[2])[:m].astype(np.uint64)
                   << np.uint64(16))
            )
            sparse_ops.apply_hi_runs(codes, a, runs[0], runs[1], shift)
            return codes
        if len(chs) == 2:
            hi_h = np.asarray(chs[0])[:m].astype(np.uint64)
            return (hi_h << np.uint64(32)) | np.asarray(chs[1])[:m]
        codes = np.asarray(chs[0])[:m].astype(np.uint64)
        if runs is not None:
            sparse_ops.apply_hi_runs(codes, a, runs[0], runs[1], shift)
        return codes

    def _finalize_ordered(self, store, timers=None):
        """Global-order finalize (see finalize docstring)."""
        import contextlib

        ph = timers.phase if timers is not None else (
            lambda name: contextlib.nullcontext()
        )
        # host counts are int64 regardless of the device count dtype —
        # same output contract as the legacy heap-merge path (device
        # accumulation still happens in cfg.count_dtype; int64 mode is
        # required for > 2^31 observations of one k-mer, as documented)
        plan = self._ordered_pull(store, ph)
        n_live = plan.n_live
        if n_live == 0:
            return np.empty(0, np.uint64), np.empty(0, np.int64)
        with ph("finalize/d2h"):
            codes = np.empty(n_live, np.uint64)
            counts = (
                np.empty(n_live, np.int64)
                if plan.cnt_chunks is not None else None
            )
            for i, ((a, b), chs) in enumerate(
                zip(plan.spans, plan.code_chunks)
            ):
                if a >= n_live:
                    break
                e = min(b, n_live)
                codes[a:e] = self._widen_chunk(
                    chs, e - a, a, plan.runs, plan.run_shift
                )
                if counts is not None:
                    counts[a:e] = np.asarray(
                        plan.cnt_chunks[i]
                    )[: e - a]
        with ph("finalize/counts"):
            if counts is None:
                counts = np.ones(n_live, np.int64)
            if plan.exc_idx.size:
                counts[plan.exc_idx] = plan.exc_cnt
        return codes, counts

    def _merged_spill_chunks(self, state, ph):
        """Streaming k-way merge of the spill runs with the residual
        store (spill.iter_merged); yields sorted distinct host chunks.
        Consumed run files are deleted once the merge completes (a
        SECOND finalize of spilled state is an error, not a silently
        run-less spectrum)."""
        from findkmer_tpu import spill

        runs = self._spill_runs()
        if not runs:
            raise RuntimeError(
                "spill runs missing (already consumed by a previous "
                "finalize, or deleted); rerun the count"
            )
        with ph("finalize/residual_pull"):
            final = self._finalize_ordered(state.store)
        runs.append(final)
        yield from spill.iter_merged(runs)
        spill.remove_runs(self.cfg.spill_dir)  # consumed; free the disk

    def finalize_chunks(self, state, timers=None):
        """Streaming variant of the sparse finalize: yields host
        (codes u64, counts i64) chunks in globally sorted distinct
        order, each formatted/written by the caller while later chunks'
        D2H transfers are still in flight.  Chunks concatenate to
        exactly finalize(state)'s output."""
        import contextlib

        assert self.mode != "direct", "finalize_chunks is sparse-only"
        ph = timers.phase if timers is not None else (
            lambda name: contextlib.nullcontext()
        )
        with ph("finalize/compact"):
            state = self.compact(state)
            state, d = self._ensure_capacity(state)
        if self._spill_n:
            yield from self._merged_spill_chunks(state, ph)
            return
        plan = self._ordered_pull(state.store, ph)
        n_live = plan.n_live
        for i, ((a, b), chs) in enumerate(
            zip(plan.spans, plan.code_chunks)
        ):
            if a >= n_live:
                break
            e = min(b, n_live)
            with ph("finalize/d2h"):
                codes = self._widen_chunk(
                    chs, e - a, a, plan.runs, plan.run_shift
                )
                if plan.cnt_chunks is not None:
                    counts = np.asarray(
                        plan.cnt_chunks[i]
                    )[: e - a].astype(np.int64)
                else:
                    counts = np.ones(e - a, np.int64)
            lo_i = np.searchsorted(plan.exc_idx, a)
            hi_i = np.searchsorted(plan.exc_idx, e)
            if hi_i > lo_i:
                counts[plan.exc_idx[lo_i:hi_i] - a] = (
                    plan.exc_cnt[lo_i:hi_i]
                )
            yield codes, counts

    # ------------------------------------------------------------------
    def table_state(self, state):
        """The checkpointable table (compacting buffered codes first).

        The SparseTable carries the (STORE_ROWS, cols) row store
        directly (rowstore._store_table — shared serialization with the
        dp_sparse engine, so checkpoints restore across engines);
        checkpoints round-trip it through npz unchanged."""
        if self.mode == "direct":
            return state, state
        state = self.compact(state)
        state, d = self._ensure_capacity(state)
        return self._store_table(state, d)

    def restore_state(self, table):
        """Rebuild step state from a checkpointed table.

        Accepts row-store (2-D) or legacy flat (1-D) tables from any
        engine (rowstore._restore_planes): entries are merged to one
        sorted distinct run on host, then laid out as G contiguous row
        chunks — each row sorted with globally disjoint code ranges,
        so finalize-without-recompaction stays exact."""
        if self.mode == "direct":
            # checkpoints arrive host-side (utils/checkpoint.py keeps
            # them numpy); the dense step donates its table, so place
            # it on device here
            if not isinstance(table.counts, jnp.ndarray):
                table = table_mod.DenseTable(
                    counts=jnp.asarray(table.counts), k=table.k
                )
            return table
        planes, Lc, drows = self._restore_planes(table)
        return SparseState(
            raw=_fresh(self._raw_cap0(), self._buf_dtypes), fill=0,
            store=tuple(jnp.asarray(p) for p in planes),
            store_len=Lc, distinct=drows,
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

        G = self._rows

        def fn(rows):
            parts = _batch_codes(rows, cfg.k, cfg.canonical, cfg.row_len)
            L = sparse_ops.ladder(parts[0].shape[0], floor=4096)
            L = -(-L // G) * G  # row-divisible pad target
            pad = L - parts[0].shape[0]
            if pad:
                parts = tuple(
                    jnp.concatenate(
                        [p, jnp.full((pad,), sparse_ops.sent_of(p.dtype),
                                     p.dtype)]
                    )
                    for p in parts
                )
            return _compact_raw_dev(parts, G, L // G)

        return fn, (rows,)
