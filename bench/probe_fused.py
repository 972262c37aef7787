"""Round-3 probe: close ROADMAP item 1 (fused window+histogram) by
measurement (VERDICT round-2 item 7).

The fused kernel builds its one-hots over a whole row tile in VMEM:
row_tile * W * (T1 + T2) one-hot bytes.  At production geometry
(W = 65536, k = 8, T1 + T2 = 512) that is 33 MB per row — impossible,
so the probe measures the fused variant at its best FEASIBLE tiles
(same total windows per launch, shorter rows) against the production
two-stage path (XLA extract + histogram_pallas) at true production
shape.  Whichever way it lands, the number closes the item.

Run: python -m bench.probe_fused
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

from bench.steps import setup_jax, _sync


def main():
    jax = setup_jax()
    import jax.numpy as jnp

    x = jax.device_put(np.ones((1, 1 << 20), np.uint32))
    x.block_until_ready()
    t0 = time.perf_counter()
    _ = np.asarray(x)
    print(json.dumps({"probe": "health_d2h_4mb_s",
                      "value": time.perf_counter() - t0}))

    from findkmer_tpu.ops.pallas.histogram_kernel import (
        fused_window_histogram, histogram_pallas)
    from findkmer_tpu.ops import window as window_ops

    k = 8
    rng = np.random.default_rng(0)

    def timed(fn, args, reps=3):
        out = fn(*args)
        _sync(out[:1])
        t0 = time.perf_counter()
        for _ in range(reps):
            out = fn(*args)
        _sync(out[:1])
        return (time.perf_counter() - t0) / reps

    # production two-stage reference: (256, 65543) rows
    B, L = 256, 65536
    rows = jax.device_put(jnp.asarray(
        rng.integers(0, 4, (B, L + k - 1), dtype=np.uint8)))

    import functools

    @functools.partial(jax.jit, static_argnames=("kk",))
    def two_stage(r, kk):
        codes, valid = window_ops.window_codes(r, kk, False)
        return histogram_pallas(codes, valid, kk)

    dt = timed(two_stage, (rows, k))
    total = B * L
    print(json.dumps({"probe": "two_stage_prod_256x64K",
                      "bases_per_s": total / dt, "ms": dt * 1e3}))
    sys.stdout.flush()

    # fused at feasible tiles: same total windows, shorter rows
    for Bt, Wt, rt in ((16384, 1024, 8), (16384, 1024, 4),
                       (32768, 512, 8), (8192, 2048, 4)):
        r2 = jax.device_put(jnp.asarray(
            rng.integers(0, 4, (Bt, Wt + k - 1), dtype=np.uint8)))
        try:
            dt = timed(
                lambda a: fused_window_histogram(a, k, False, row_tile=rt),
                (r2,),
            )
            print(json.dumps({
                "probe": f"fused_{Bt}x{Wt}_rt{rt}",
                "bases_per_s": Bt * Wt / dt, "ms": dt * 1e3,
            }))
        except Exception as e:  # Mosaic rejection is itself the result
            print(json.dumps({
                "probe": f"fused_{Bt}x{Wt}_rt{rt}",
                "error": str(e)[:200],
            }))
        sys.stdout.flush()
    return 0


if __name__ == "__main__":
    sys.exit(main())
