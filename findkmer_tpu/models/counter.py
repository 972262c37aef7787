"""KmerCounter — the flagship "model": a jitted k-mer counting step.

The framework's one workload (the reference has exactly one entry point,
SURVEY.md §1.1) is expressed like a model: `init_state()` builds the count
table, `step(state, rows)` is a pure jitted update compiled once per row
shape, `finalize(state)` materializes the spectrum on the host.  The whole
window-extract + accumulate path is fused inside a single jit so XLA keeps
intermediates (window codes, validity) out of HBM where it can.

Replaces, end to end, the reference's scan loop + count insert
(SURVEY.md §3.1 E2/E3).
"""

from __future__ import annotations

from functools import partial
from typing import Any, Dict, Tuple

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
    static_argnames=("k", "canonical", "table_size", "method"),
    donate_argnums=(0,),
)
def _dense_step(
    table: jnp.ndarray,
    rows: jnp.ndarray,
    k: int,
    canonical: bool,
    table_size: int,
    method: str,
) -> jnp.ndarray:
    codes, valid = window_ops.window_codes(rows, k, canonical)
    return hist_ops.dense_counts(codes, valid, table, table_size, method)


@partial(jax.jit, static_argnames=("k", "canonical"), donate_argnums=(0, 1, 2))
def _sparse_step(
    hi: jnp.ndarray,
    lo: jnp.ndarray,
    cnt: jnp.ndarray,
    overflow: jnp.ndarray,
    rows: jnp.ndarray,
    k: int,
    canonical: bool,
):
    if k <= 15:
        # sparse mode with small k (table_mode="sparse" forced): narrow
        # codes fit entirely in lo
        codes, valid = window_ops.window_codes(rows, k, canonical)
        whi = jnp.zeros_like(codes, jnp.uint32)
        wlo = codes.astype(jnp.uint32)
    else:
        whi, wlo, valid = window_ops.window_codes_wide(rows, k, canonical)
    rhi, rlo, rcnt = sparse_ops.batch_to_runs(whi, wlo, valid)
    hi, lo, cnt, ovf = sparse_ops.merge_runs(hi, lo, cnt, rhi, rlo, rcnt)
    return hi, lo, cnt, overflow | ovf


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
                # scatter is the general-purpose default; the pallas fused
                # kernel is opt-in until benched faster (bench/RESULTS.md)
                m = "scatter"
            self._method = m
            # pallas on non-TPU backends runs in interpreter mode (tests)
            self._pl_interpret = jax.default_backend() != "tpu"

    # ------------------------------------------------------------------
    def init_state(self):
        return table_mod.make_table(self.cfg)

    def step(self, state, rows: jnp.ndarray):
        """One batch update.  rows: (B, R) uint8 codes, R = chunk+k-1."""
        cfg = self.cfg
        if self.mode == "direct":
            if self._method == "pallas":
                from findkmer_tpu.ops.pallas.histogram_kernel import (
                    add_counts_pallas,
                )

                counts = add_counts_pallas(
                    rows, state.counts, cfg.k, cfg.canonical,
                    interpret=self._pl_interpret,
                )
                return table_mod.DenseTable(counts=counts, k=cfg.k)
            counts = _dense_step(
                state.counts,
                rows,
                cfg.k,
                cfg.canonical,
                cfg.table_size,
                self._method,
            )
            return table_mod.DenseTable(counts=counts, k=cfg.k)
        hi, lo, cnt, ovf = _sparse_step(
            state.hi, state.lo, state.cnt, state.overflow, rows,
            cfg.k, cfg.canonical,
        )
        return table_mod.SparseTable(
            hi=hi, lo=lo, cnt=cnt, overflow=ovf, k=cfg.k
        )

    def finalize(self, state):
        """Materialize the spectrum on host.

        direct -> np counts (4^k,); sparse -> (codes uint64, counts).
        """
        if self.mode == "direct":
            return state.to_host()
        return state.to_host()

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
                    self._method,
                )

            return fn, (table, rows)

        hi, lo, cnt = sparse_ops.empty_store(cfg.sparse_capacity)

        def fn(hi, lo, cnt, rows):
            return _sparse_step(
                hi, lo, cnt, jnp.zeros((), bool), rows, cfg.k, cfg.canonical
            )

        return fn, (hi, lo, cnt, rows)
