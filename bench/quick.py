"""`findkmer bench` — quick on-device throughput check (cli.py adapter).

`findkmer bench --phases` runs a real end-to-end count on synthetic
FASTA and reports the wall-clock phase breakdown (host batching /
device dispatch / finalize / write) — the integrated profiling report
(SURVEY.md §5 tracing; per-phase timing via utils.prof.PhaseTimers).
"""

from __future__ import annotations

import json


def _synth_fasta(path: str, bases: int, seed: int = 0) -> None:
    """Write `bases` of random ACGT as one FASTA record (80-col lines)."""
    import numpy as np

    rng = np.random.default_rng(seed)
    alphabet = np.frombuffer(b"ACGT", dtype=np.uint8)
    with open(path, "wb") as f:
        f.write(b">bench synthetic\n")
        chunk = 8_000_000  # bases per write block (100k lines)
        for s in range(0, bases, chunk):
            n = min(chunk, bases - s)
            seq = alphabet[rng.integers(0, 4, n)]
            rows = -(-n // 80)
            block = np.full((rows, 81), ord("\n"), dtype=np.uint8)
            pad = rows * 80 - n
            if pad:
                seq = np.concatenate([seq, np.full(pad, ord("A"), np.uint8)])
            block[:, :80] = seq.reshape(rows, 80)
            f.write(block.tobytes())


def run_phases(args) -> int:
    """End-to-end phase breakdown on synthetic data (real device)."""
    import os
    import sys
    import tempfile
    import time

    from findkmer_tpu import output as output_mod
    from findkmer_tpu.config import Config
    from findkmer_tpu.pipeline import StreamStats, count_file
    from findkmer_tpu.utils.prof import PhaseTimers

    bases = int(args.gbases * 1e9)
    with tempfile.TemporaryDirectory() as td:
        fa = os.path.join(td, "bench.fa")
        t0 = time.perf_counter()
        _synth_fasta(fa, bases)
        gen_s = time.perf_counter() - t0
        cfg = Config(k=args.k, canonical=args.canonical, hist=args.hist,
                     sparse_expected_entries=bases)
        timers = PhaseTimers()
        stats = StreamStats()
        t0 = time.perf_counter()
        spectrum = count_file(fa, cfg, stats=stats, timers=timers)
        with timers.phase("write"):
            with open(os.devnull, "wb") as f:
                output_mod.write_spectrum(f, spectrum, cfg)
        wall = time.perf_counter() - t0
        phases = timers.as_dict()
        print(f"# synthetic input: {bases/1e6:.0f} Mbp "
              f"(generated in {gen_s:.1f}s, excluded)", file=sys.stderr)
        print(f"# {'phase':<14}{'total_s':>10}{'calls':>8}{'share':>8}",
              file=sys.stderr)
        for name, d in phases.items():
            print(f"# {name:<14}{d['total_s']:>10.2f}{d['calls']:>8}"
                  f"{d['total_s']/wall:>7.0%}", file=sys.stderr)
        print(json.dumps({
            "k": args.k,
            "bases": bases,
            "wall_s": wall,
            "bases_per_s": bases / wall,
            "phases": phases,
        }))
    return 0


def run(args) -> int:
    if getattr(args, "phases", False):
        return run_phases(args)
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
