"""Sweep dense histogram methods on the real device (M2 decision gate).

Measures bases/s for each accumulation algorithm at several k and two step
counts (to separate per-dispatch overhead from steady-state throughput).
Records the winner for Config.hist="auto" policy; results land in
bench/RESULTS.md.

Run: python -m bench.hist_sweep [-k 8] [--steps 4 32]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time


def sweep(k=8, methods=("scatter", "sort", "onehot", "pallas"),
          steps_list=(4, 16), batch_rows=256, chunk_len=16384):
    from bench.steps import setup_jax, _sync

    jax = setup_jax()
    import numpy as np
    import jax.numpy as jnp

    from findkmer_tpu.config import Config
    from findkmer_tpu.models.counter import KmerCounter

    rng = np.random.default_rng(0)
    out = []
    for method in methods:
        try:
            cfg = Config(
                k=k, batch_rows=batch_rows, chunk_len=chunk_len, hist=method
            )
            counter = KmerCounter(cfg)
            host_rows = rng.integers(
                0, 4, (batch_rows, cfg.row_len), dtype=np.uint8
            )
            rows = jax.device_put(jnp.asarray(host_rows))
            state = counter.init_state()
            state = counter.step(state, rows)  # compile
            _sync(state.counts)
            for steps in steps_list:
                t0 = time.perf_counter()
                for _ in range(steps):
                    state = counter.step(state, rows)
                _sync(state.counts)
                dt = time.perf_counter() - t0
                r = {
                    "k": k,
                    "method": method,
                    "steps": steps,
                    "wall_s": dt,
                    "bases_per_s": batch_rows * chunk_len * steps / dt,
                }
                out.append(r)
                print(json.dumps(r), flush=True)
        except Exception as e:
            print(json.dumps({"k": k, "method": method,
                              "error": str(e)[:300]}), flush=True)
    return out


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("-k", type=int, default=8)
    ap.add_argument("--steps", type=int, nargs="+", default=[4, 16])
    ap.add_argument("--methods", nargs="+",
                    default=["scatter", "sort", "onehot", "pallas"])
    ap.add_argument("--batch-rows", type=int, default=256)
    ap.add_argument("--chunk-len", type=int, default=16384)
    args = ap.parse_args(argv)
    sweep(args.k, args.methods, args.steps, args.batch_rows, args.chunk_len)
    return 0


if __name__ == "__main__":
    sys.path.insert(
        0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )
    sys.exit(main())
