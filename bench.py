"""Round benchmark entry point (driver-run on real TPU hardware).

Prints ONE JSON line to stdout:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Headline metric (BASELINE.json): bases/sec/chip at k=8, measured on the
device counting step (window extraction + table accumulation) with data
pre-staged in HBM — the TPU replacement for the reference's C scan loop.
vs_baseline divides by 250 Mbase/s, the midpoint of SURVEY.md §6's
analytical envelope for the reference's single-core byte-at-a-time loop
(the reference publishes no numbers; BASELINE.md).

Extra metrics (k=21 sparse) go to stderr so the stdout one-line contract
holds.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from bench.steps import (
    BASELINE_BASES_PER_S,
    bench_dense_step,
    bench_sparse_step,
    setup_jax,
)


def main() -> int:
    jax = setup_jax()
    dev = jax.devices()[0]

    # Tunnel-health probe (stderr): a 4 MB D2H pull.  Healthy windows
    # finish in ~0.04 s; degraded ones take seconds and depress every
    # number below through no fault of the code (bench/RESULTS.md
    # "session-4 sweep"), so the driver-captured bench is only
    # interpretable alongside this line (VERDICT.md round-2 weak #2).
    import time

    import numpy as np

    x = jax.device_put(np.ones((1, 1 << 20), np.uint32))
    x.block_until_ready()
    t0 = time.perf_counter()
    _ = np.asarray(x)
    health_s = time.perf_counter() - t0
    print(
        json.dumps(
            {
                "metric": "tunnel_health_d2h_4mb",
                "value": health_s,
                "unit": "s",
                "healthy": health_s < 1.0,
                "device": str(dev),
            }
        ),
        file=sys.stderr,
    )

    k8_bps, k8_dt = bench_dense_step(jax, k=8)
    k21_bps, k21_dt = bench_sparse_step(jax, k=21)
    k15_bps, k15_dt = bench_sparse_step(jax, k=15)
    # BASELINE config 4 is CANONICAL k=21 — measure it explicitly
    k21c_bps, k21c_dt = bench_sparse_step(jax, k=21, canonical=True)

    for name, bps, dt in (
        ("bases_per_s_per_chip_k21_sparse", k21_bps, k21_dt),
        ("bases_per_s_per_chip_k21_canonical", k21c_bps, k21c_dt),
        ("bases_per_s_per_chip_k15_sparse", k15_bps, k15_dt),
    ):
        print(
            json.dumps(
                {
                    "metric": name,
                    "value": bps,
                    "unit": "bases/s",
                    "vs_baseline": bps / BASELINE_BASES_PER_S,
                    "wall_s": dt,
                    "device": str(dev),
                }
            ),
            file=sys.stderr,
        )

    print(
        json.dumps(
            {
                "metric": "bases_per_s_per_chip_k8",
                "value": k8_bps,
                "unit": "bases/s",
                "vs_baseline": k8_bps / BASELINE_BASES_PER_S,
            }
        )
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
