"""`findkmer bench` — quick on-device throughput check (cli.py adapter)."""

from __future__ import annotations

import json


def run(args) -> int:
    from bench.steps import (
        bench_dense_step,
        bench_sparse_step,
        setup_jax,
    )

    jax = setup_jax()
    total = int(args.gbases * 1e9)
    chunk_len = 65536 if args.k <= 15 else 16384
    batch_rows = 256 if args.k <= 15 else 32
    steps = max(1, total // (batch_rows * chunk_len))
    if args.k <= 15:
        bps, dt = bench_dense_step(
            jax, k=args.k, batch_rows=batch_rows, chunk_len=chunk_len,
            steps=steps, hist=args.hist, canonical=args.canonical,
        )
    else:
        bps, dt = bench_sparse_step(
            jax, k=args.k, batch_rows=batch_rows, chunk_len=chunk_len,
            steps=steps, canonical=args.canonical,
        )
    print(
        json.dumps(
            {
                "k": args.k,
                "bases_per_s": bps,
                "wall_s": dt,
                "device": str(jax.devices()[0]),
                "hist": args.hist,
            }
        )
    )
    return 0
