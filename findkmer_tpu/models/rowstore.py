"""Shared machinery of the two log-structured sparse engines.

models/counter.py (single-chip, 1-D raw buffers, G store rows) and
parallel/dist.py dp_sparse (per-device, 2-D row-sharded raw buffers,
n_dev x sub store rows) run the SAME store design; the heavy compaction
chain was folded into ops/compaction.py in round 3, and this module
folds the remaining mirrored pieces (round-4 verdict weak #3): raw
append/grow, the exact-distinct dedup + capacity decision, and
checkpoint spill-run adoption.

The geometry contract: a store is (D * R, L) — D device groups of R
rows each (single-chip: D=1, R=G).  `distinct` is the per-row distinct
vector from the last compaction; the capacity metric is the max over
device groups of the per-group sum (for D=1 that is the plain sum),
because sparse_capacity bounds DISTINCT k-mers resident per device.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from findkmer_tpu.ops import compaction
from findkmer_tpu.ops import sparse as sparse_ops


@partial(jax.jit, donate_argnums=(0,))
def append_raw(bufs, parts, offset):
    """Write a batch's raw codes into the (donated) raw buffers at
    `offset` along the last axis.  Handles both engines' layouts: 1-D
    (cap,) single-chip buffers and 2-D (n_dev, cap) row-sharded ones
    (ndim is static at trace time)."""
    return tuple(
        lax.dynamic_update_slice(
            b, p, (0, offset) if b.ndim == 2 else (offset,)
        )
        for b, p in zip(bufs, parts)
    )


@partial(jax.jit, static_argnames=("new_cap",), donate_argnums=(0,))
def grow_raw(bufs, new_cap: int):
    """Extend raw buffers to `new_cap` along the last axis, sentinel-
    filled (ladder growth; each new cap is a new compiled shape)."""
    return tuple(
        jnp.concatenate(
            [
                b,
                jnp.full(
                    b.shape[:-1] + (new_cap - b.shape[-1],),
                    sparse_ops.sent_of(b.dtype),
                    b.dtype,
                ),
            ],
            axis=b.ndim - 1,
        )
        for b in bufs
    )


class RowStoreMixin:
    """Capacity / dedup / spill-adoption logic shared by KmerCounter
    (sparse mode) and DistributedCounter (dp_sparse merge).

    Subclass contract: `self.cfg` (Config), `self._spill_n` (runs
    written so far), and `_dedup_geometry() -> (D, R, col_floor)` — the
    store's device-group count, rows per group, and the column ladder
    floor.  State objects are dataclasses with fields (raw, fill,
    store, store_len, distinct); dataclasses.replace keeps this module
    agnostic to the concrete state class.
    """

    def _dedup_geometry(self):
        raise NotImplementedError

    # -- capacity metric ------------------------------------------------
    def _distinct_total(self, d) -> int:
        """Worst per-device-group distinct upper bound: rows of one
        group sum (a code present in several rows counts once per row —
        conservative), groups take the max.  D=1 reduces to d.sum()."""
        D, _, _ = self._dedup_geometry()
        d = np.asarray(d)
        return int(d.reshape(D, -1).sum(axis=1).max())

    def _dedup_state(self, st):
        """Cross-row dedup within each device group: one per-group flat
        sort (ops/compaction.dedup_rows) leaves EXACT per-group distinct
        counts.

        The row store keeps duplicates of a code that landed in several
        rows (up to R copies), so the per-group entry sum can exceed
        true distinct on repeat-heavy input — fold before deciding
        spill/error.  Runs only when the sum crosses sparse_capacity."""
        D, R, floor = self._dedup_geometry()
        store, Lc, drows = compaction.dedup_rows(st.store, D, R, floor)
        return (
            dataclasses.replace(
                st, store=store, store_len=Lc, distinct=drows
            ),
            drows,
        )

    def _ensure_capacity(self, st):
        """(state, distinct vector) with the capacity contract checked
        against EXACT distinct (cross-row dedup on demand)."""
        d = np.asarray(st.distinct)
        if (
            st.store is not None
            and self._distinct_total(d) > self.cfg.sparse_capacity
        ):
            st, d = self._dedup_state(st)
            d = np.asarray(d)
        self._check_capacity(self._distinct_total(d))
        return st, d

    def _check_capacity(self, distinct: int):
        if self.cfg.spill_dir:
            return  # spilling bounds the stores instead of erroring
        if distinct > self.cfg.sparse_capacity:
            D, _, _ = self._dedup_geometry()
            where = " on one device" if D > 1 else ""
            raise RuntimeError(
                f"sparse store exceeded sparse_capacity "
                f"({distinct} > {self.cfg.sparse_capacity} distinct "
                f"k-mers{where}); raise Config.sparse_capacity or set "
                "--spill"
            )

    # -- checkpoint table serialization ---------------------------------
    def _store_table(self, st, d):
        """(state, SparseTable) for checkpointing a row store: squeeze
        to the live ladder, synthesize the dummy hi plane for narrow
        stores (sentinel where dead, like the legacy flat tables), wrap
        as a SparseTable.  Shared by KmerCounter.table_state and
        DistributedCounter.table_state (the same serialization keeps
        their checkpoints mutually restorable — elastic resume)."""
        from findkmer_tpu import table as table_mod

        _, _, floor = self._dedup_geometry()
        d = np.asarray(d)
        Ld = sparse_ops.ladder(max(int(d.max()), 1), floor=floor)
        store, cols = st.store, st.store_len
        if cols > Ld:
            store = compaction.squeeze_slice(store, Ld)
            cols = Ld
        st = dataclasses.replace(
            st, store=store, store_len=cols, distinct=d
        )
        if len(store) == 2:
            lo, cnt = store
            hi = jnp.where(cnt > 0, jnp.uint32(0),
                           jnp.uint32(sparse_ops.SENTINEL))
        else:
            hi, lo, cnt = store
        table = table_mod.SparseTable(
            hi=hi, lo=lo, cnt=cnt, overflow=jnp.zeros((), bool),
            k=self.cfg.k,
        )
        return st, table

    def _restore_planes(self, table):
        """Checkpointed SparseTable -> (host planes, Lc, per-row
        distinct) re-dealt as D*R contiguous sorted row chunks.

        Accepts row-store (2-D) or legacy flat (1-D) tables from ANY
        engine/geometry: entries merge to one sorted distinct run on
        host, then lay out as contiguous chunks — each row sorted with
        globally disjoint code ranges, so finalize-without-recompaction
        stays exact.  The caller places the planes (plain jnp arrays
        single-chip; sharded device_put on a mesh)."""
        D, R, floor = self._dedup_geometry()
        G = D * R
        hi = np.asarray(table.hi)
        lo = np.asarray(table.lo)
        cnt = np.asarray(table.cnt)
        if hi.ndim == 1:
            hi, lo, cnt = hi[None], lo[None], cnt[None]
        codes, counts = sparse_ops.store_to_host_2d(hi, lo, cnt)
        n = codes.size
        Lc = sparse_ops.ladder(-(-n // G) if n else 1, floor=floor)
        cdt = np.dtype(self.cfg.count_dtype)
        lo2 = np.full((G * Lc,), sparse_ops.SENTINEL, np.uint32)
        cnt2 = np.zeros((G * Lc,), cdt)
        lo2[:n] = (codes & np.uint64(0xFFFFFFFF)).astype(np.uint32)
        cnt2[:n] = counts.astype(cdt)
        drows = np.bincount(np.arange(n) // Lc, minlength=G).astype(
            np.int64
        )
        if self.cfg.k <= 15:
            planes = (lo2.reshape(G, Lc), cnt2.reshape(G, Lc))
        else:
            hdt = sparse_ops.hi_dtype(self.cfg.k)
            hi2 = np.full((G * Lc,), sparse_ops.sent_of(hdt), hdt)
            hi2[:n] = (codes >> np.uint64(32)).astype(hdt)
            planes = (
                hi2.reshape(G, Lc), lo2.reshape(G, Lc),
                cnt2.reshape(G, Lc),
            )
        return planes, Lc, drows

    # -- checkpoint/resume spill composition ----------------------------
    def adopt_spill_runs(self, n_runs: int, token: str | None = None):
        """Checkpoint-resume adoption of disk-spill runs.

        The checkpoint manifest records how many spill runs belong to
        its prefix (streaming.py); runs past that index were written by
        a later, crashed stream whose batches will be REPLAYED — they
        are deleted here, or the spectrum would double-count them.
        Fewer runs than the manifest promises is unrecoverable.

        `token` is the stream-identity token the checkpoint recorded
        (spill.write_token at init_dir time): any run files present
        when it does NOT match the dir's token belong to a DIFFERENT
        count — adopting them would corrupt the spectrum and deleting
        them would destroy someone else's crash state, so both are
        refused."""
        if n_runs and not self.cfg.spill_dir:
            raise ValueError(
                f"checkpoint recorded {n_runs} spill runs but --spill "
                "is off; rerun with the original --spill DIR"
            )
        if not self.cfg.spill_dir:
            return
        from findkmer_tpu import spill

        have = len(spill.load_runs(self.cfg.spill_dir))
        dir_token = spill.read_token(self.cfg.spill_dir)
        same = (
            token is not None and dir_token is not None
            and token == dir_token
        )
        # pre-token legacy state (neither side has an identity) with an
        # EXACT run-count match resumes as before the tokens existed —
        # the guard exists to stop adopting/deleting a DIFFERENT
        # count's runs, not to strand old checkpoints
        legacy_exact = (
            token is None and dir_token is None and have == n_runs
        )
        if (have or n_runs) and not (same or legacy_exact):
            raise RuntimeError(
                f"spill dir {self.cfg.spill_dir!r} holds run files "
                "from a different stream than this checkpoint "
                "(identity token mismatch); refusing to adopt or "
                "delete them — resume with the original --spill DIR, "
                "or point --spill at an empty directory"
            )
        if have < n_runs:
            raise RuntimeError(
                f"checkpoint expects {n_runs} spill runs in "
                f"{self.cfg.spill_dir!r} but only {have} exist; the "
                "spill dir was truncated — restart the count"
            )
        if have > n_runs:
            spill.remove_runs_from(self.cfg.spill_dir, n_runs)
        if dir_token is None:
            # resumed into a fresh dir (no runs yet): re-stamp the
            # stream's identity so later checkpoints stay consistent
            spill.write_token(self.cfg.spill_dir, token)
        self._spill_n = n_runs
