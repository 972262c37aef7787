"""Distributed k-mer counting over a device mesh (SURVEY.md §2.2, §2.3 N6).

The reference has zero parallelism (single C process); everything here is
new, built the TPU way: `shard_map` over a 1-D mesh with XLA collectives —
no NCCL/MPI anywhere.

Three table layouts / merge strategies:

  * DP + replicated-shape tables ("psum"): each device accumulates a full
    4^k partial table for its row shard; one cross-device sum at finalize
    (lazy merge — no per-batch collective).  Right for small k where the
    table is KiBs [BASELINE config 2].
  * Key-routed sharded table ("all_to_all"): the 4^k table is split into
    n_dev contiguous shards by code prefix; each device extracts codes from
    its rows, buckets them by owner shard, exchanges buckets with
    lax.all_to_all over ICI, and scatter-adds what it receives into its own
    shard.  Structurally MoE token->expert dispatch (SURVEY.md §2.2 EP).
    Right for k=15 where a 4 GiB table cannot be replicated
    [BASELINE config 3].
  * DP sparse stores: each device runs its own sorted-run store
    (ops/sparse.py); stores are gathered and merged on the host at
    finalize.  Right for k=21 [BASELINE config 4].

All state lives sharded on device across batches; per-batch work is one
shard_map program with no host round-trips.
"""

from __future__ import annotations

import math
from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from findkmer_tpu.config import Config
from findkmer_tpu.ops import histogram as hist_ops
from findkmer_tpu.ops import sparse as sparse_ops
from findkmer_tpu.ops import window as window_ops
from findkmer_tpu.parallel.mesh import AXIS, make_mesh


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


class DistributedCounter:
    """Mesh-parallel counter.  Feed global (B, R) batches; B % n_dev == 0."""

    def __init__(self, cfg: Config, mesh: Optional[Mesh] = None):
        self.cfg = cfg
        self.mesh = mesh if mesh is not None else make_mesh()
        self.n_dev = self.mesh.devices.size
        self.mode = cfg.resolved_table_mode
        if cfg.batch_rows % self.n_dev != 0:
            raise ValueError(
                f"batch_rows ({cfg.batch_rows}) must be divisible by the "
                f"mesh size ({self.n_dev})"
            )
        merge = cfg.merge
        if merge == "auto":
            # route when the table is too big to replicate comfortably
            merge = (
                "all_to_all"
                if (self.mode == "direct" and cfg.k > 10 and self.n_dev > 1)
                else "psum"
            )
        if self.mode == "sparse":
            merge = "dp_sparse"
        self.merge = merge
        if merge == "all_to_all":
            if cfg.table_size % self.n_dev != 0:
                raise ValueError(
                    f"table size 4^{cfg.k} not divisible by {self.n_dev} "
                    "devices (use a power-of-two mesh)"
                )
            if self.n_dev & (self.n_dev - 1):
                raise ValueError("all_to_all merge needs power-of-two mesh")
        self._build()

    # ------------------------------------------------------------------
    def _build(self):
        cfg, mesh, n_dev = self.cfg, self.mesh, self.n_dev
        k, canonical = cfg.k, cfg.canonical
        T = cfg.table_size if self.mode == "direct" else None
        dtype = jnp.dtype(cfg.count_dtype)
        rows_leaf_spec = P(AXIS, None)
        # batches may be raw (B, R) rows or a (packed, validbits) pair
        # (Config.packed_h2d); both leaves shard on the batch dim
        rows_spec = (
            (rows_leaf_spec, rows_leaf_spec)
            if cfg.packed_h2d
            else rows_leaf_spec
        )
        R = cfg.row_len
        unpack = window_ops.rows_from_batch
        state_spec = P(AXIS, None)
        self._rows_sharding = NamedSharding(mesh, rows_leaf_spec)
        self._state_sharding = NamedSharding(mesh, state_spec)
        method = cfg.hist if cfg.hist not in ("auto", "pallas") else "scatter"

        if self.merge in ("psum", "psum_scatter"):

            def step(tables, rows):
                # tables: (1, T) local slice of (n_dev, T); rows local shard
                codes, valid = window_ops.window_codes(
                    unpack(rows, R), k, canonical
                )
                t = hist_ops.dense_counts(
                    codes, valid, tables[0], T, method
                )
                return t[None]

            self._step = jax.jit(
                shard_map(
                    step, mesh=mesh, in_specs=(state_spec, rows_spec),
                    out_specs=state_spec,
                ),
                donate_argnums=(0,),
            )

            if self.merge == "psum":

                def finalize(tables):
                    return jnp.sum(tables, axis=0)  # one cross-device reduce

                self._finalize = jax.jit(finalize)
            else:
                # reduce-scatter: each device reduces only its own 1/n
                # table slice ((n-1)/n x the all-reduce traffic); the
                # result stays sharded across devices — the cheap merge
                # when the output is consumed shard-wise (SURVEY.md §5
                # "psum_scatter as the cheaper merge").  Requires
                # T % n_dev == 0 (4^k over power-of-two meshes).
                if T % n_dev != 0:
                    raise ValueError(
                        f"psum_scatter needs table size 4^{k} divisible "
                        f"by {n_dev} devices (use a power-of-two mesh)"
                    )

                def finalize_rs(tables):
                    # local (1, T) -> reduce-scatter -> local (1, T/n);
                    # global result (n_dev, T/n), shard i on device i
                    out = lax.psum_scatter(
                        tables[0], AXIS, scatter_dimension=0, tiled=True
                    )
                    return out[None]

                self._finalize = jax.jit(
                    shard_map(
                        finalize_rs, mesh=mesh, in_specs=state_spec,
                        out_specs=state_spec,
                    )
                )

        elif self.merge == "all_to_all":
            shard_size = T // n_dev
            shift = int(math.log2(shard_size))  # owner = code >> shift
            w_local = (cfg.batch_rows // n_dev) * cfg.window_len
            # canonical folding maps every window to min(code, revcomp):
            # codes concentrate in the lower half of code space, so
            # low-prefix shards see ~2x the average traffic
            skew = 2.0 if canonical else 1.0
            cap = _round_up(
                int(w_local / n_dev * cfg.route_capacity_factor * skew) + 8, 8
            )
            self._route_cap = cap
            SENT = jnp.int32(T)  # OOB for every local shard after rebase

            def step(shards, overflow, rows):
                # shards: (1, shard_size); rows: local (B/n, R)
                codes, valid = window_ops.window_codes(
                    unpack(rows, R), k, canonical
                )
                flat = jnp.where(valid, codes, SENT).reshape(-1)
                dest = flat >> shift  # invalid -> n_dev (dropped by scatter)
                # stable sort by dest, codes as payload
                dest_s, flat_s = lax.sort((dest, flat), num_keys=1)
                n = flat_s.shape[0]
                start = jnp.searchsorted(
                    dest_s, jnp.arange(n_dev, dtype=dest_s.dtype)
                )
                offs = jnp.arange(n, dtype=jnp.int32) - start[
                    jnp.clip(dest_s, 0, n_dev - 1)
                ].astype(jnp.int32)
                buf = jnp.full((n_dev, cap), SENT, jnp.int32)
                # dest >= n_dev (invalid) or offs >= cap (overflow) drop
                buf = buf.at[dest_s, offs].set(flat_s, mode="drop")
                ovf = jnp.any((offs >= cap) & (dest_s < n_dev))
                recv = lax.all_to_all(
                    buf, AXIS, split_axis=0, concat_axis=0, tiled=False
                )
                # recv: (n_dev, cap) codes owned by me; rebase to shard
                me = lax.axis_index(AXIS)
                local_idx = recv.reshape(-1) - me * shard_size
                shard = shards[0].at[local_idx].add(
                    jnp.int32(1), mode="drop"
                )
                return shard[None], overflow | (lax.psum(ovf, AXIS) > 0)

            def step_wrap(shards, overflow, rows):
                return step(shards, overflow, rows)

            self._step = jax.jit(
                shard_map(
                    step_wrap,
                    mesh=mesh,
                    in_specs=(state_spec, P(), rows_spec),
                    out_specs=(state_spec, P()),
                ),
                donate_argnums=(0,),
            )

            def finalize(shards):
                return shards.reshape(-1)  # (n_dev, T/n_dev) -> (T,)

            self._finalize = jax.jit(finalize)

        elif self.merge == "dp_sparse":
            capacity = cfg.sparse_capacity

            def step(hi, lo, cnt, overflow, rows):
                # all leading dims (1, ...) local slices
                urows = unpack(rows, R)
                if k <= 15:
                    codes, valid = window_ops.window_codes(
                        urows, k, canonical
                    )
                    whi = jnp.zeros_like(codes, jnp.uint32)
                    wlo = codes.astype(jnp.uint32)
                else:
                    whi, wlo, valid = window_ops.window_codes_wide(
                        urows, k, canonical
                    )
                rhi, rlo, rcnt = sparse_ops.batch_to_runs(whi, wlo, valid)
                nhi, nlo, ncnt, ovf = sparse_ops.merge_runs(
                    hi[0], lo[0], cnt[0], rhi, rlo, rcnt
                )
                return (
                    nhi[None], nlo[None], ncnt[None],
                    overflow | (lax.psum(ovf, AXIS) > 0),
                )

            self._step = jax.jit(
                shard_map(
                    step,
                    mesh=mesh,
                    in_specs=(
                        state_spec, state_spec, state_spec, P(), rows_spec,
                    ),
                    out_specs=(state_spec, state_spec, state_spec, P()),
                ),
                donate_argnums=(0, 1, 2),
            )
        else:
            raise ValueError(f"unknown merge strategy {self.merge!r}")

    # ------------------------------------------------------------------
    def init_state(self):
        cfg, n_dev = self.cfg, self.n_dev
        dtype = jnp.dtype(cfg.count_dtype)
        if self.merge in ("psum", "psum_scatter"):
            return jax.device_put(
                jnp.zeros((n_dev, cfg.table_size), dtype),
                self._state_sharding,
            )
        if self.merge == "all_to_all":
            shards = jax.device_put(
                jnp.zeros((n_dev, cfg.table_size // n_dev), dtype),
                self._state_sharding,
            )
            return (shards, jnp.zeros((), bool))
        cap = cfg.sparse_capacity
        hi = jnp.full((n_dev, cap), sparse_ops.SENTINEL, jnp.uint32)
        lo = jnp.full((n_dev, cap), sparse_ops.SENTINEL, jnp.uint32)
        cnt = jnp.zeros((n_dev, cap), jnp.int32)
        sh = self._state_sharding
        return (
            jax.device_put(hi, sh),
            jax.device_put(lo, sh),
            jax.device_put(cnt, sh),
            jnp.zeros((), bool),
        )

    def put_batch(self, rows):
        """Host batch (rows or (packed, validbits)) -> sharded device."""
        return jax.device_put(rows, self._rows_sharding)

    def flush(self, state):
        """Interface parity with KmerCounter (per-batch merges are
        already inside the sharded step)."""
        return state

    # batches between host checks of the route-overflow flag: a skewed
    # input (genomic prefixes are not uniform) must fail FAST, not at
    # finalize after the whole run's work is lost.  The check is one
    # scalar D2H every N batches — negligible, and it never blocks the
    # async dispatch pipeline for long since the flag is N batches stale.
    overflow_check_every = 64

    def step(self, state, rows):
        if isinstance(rows, np.ndarray) or (
            isinstance(rows, tuple) and isinstance(rows[0], np.ndarray)
        ):
            rows = self.put_batch(rows)
        if self.merge in ("psum", "psum_scatter"):
            return self._step(state, rows)
        if self.merge == "all_to_all":
            shards, overflow = state
            shards, overflow = self._step(shards, overflow, rows)
            self._steps_since_check = getattr(self, "_steps_since_check", 0) + 1
            if self._steps_since_check >= self.overflow_check_every:
                self._steps_since_check = 0
                if bool(overflow):
                    raise RuntimeError(
                        "all_to_all route bucket overflowed "
                        f"(capacity {self._route_cap}); raise "
                        "Config.route_capacity_factor (skewed input)"
                    )
            return (shards, overflow)
        hi, lo, cnt, overflow = state
        hi, lo, cnt, overflow = self._step(hi, lo, cnt, overflow, rows)
        return (hi, lo, cnt, overflow)

    # ------------------------------------------------------------------
    def finalize(self, state):
        """Merge device state -> host spectrum (dense array or sparse tuple)."""
        if self.merge == "psum":
            return np.asarray(self._finalize(state))
        if self.merge == "psum_scatter":
            # (n_dev, T/n) device-sharded -> full (T,) on host
            return np.asarray(self._finalize(state)).reshape(-1)
        if self.merge == "all_to_all":
            shards, overflow = state
            if bool(overflow):
                raise RuntimeError(
                    "all_to_all route bucket overflowed "
                    f"(capacity {self._route_cap}); raise "
                    "Config.route_capacity_factor (skewed input)"
                )
            return np.asarray(self._finalize(shards))
        hi, lo, cnt, overflow = state
        if bool(overflow):
            raise RuntimeError(
                "sparse count store overflowed; raise Config.sparse_capacity"
            )
        # host merge of per-device sorted stores (SURVEY.md §4.2: merge is
        # a pure function on partial tables)
        return _host_merge_sparse(
            np.asarray(hi), np.asarray(lo), np.asarray(cnt)
        )


def _host_merge_sparse(
    hi: np.ndarray, lo: np.ndarray, cnt: np.ndarray
) -> Tuple[np.ndarray, np.ndarray]:
    """Merge (n_dev, cap) per-device stores into one sorted spectrum."""
    mask = cnt > 0
    codes = (hi[mask].astype(np.uint64) << np.uint64(32)) | lo[mask].astype(
        np.uint64
    )
    counts = cnt[mask].astype(np.int64)
    order = np.argsort(codes, kind="stable")
    codes, counts = codes[order], counts[order]
    if codes.size == 0:
        return codes, counts
    uniq_mask = np.empty(codes.shape, bool)
    uniq_mask[0] = True
    np.not_equal(codes[1:], codes[:-1], out=uniq_mask[1:])
    idx = np.cumsum(uniq_mask) - 1
    out_codes = codes[uniq_mask]
    out_counts = np.zeros(out_codes.shape, np.int64)
    np.add.at(out_counts, idx, counts)
    return out_codes, out_counts
