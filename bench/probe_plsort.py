"""Round-4 probe: Pallas in-VMEM bitonic row sorter — feasibility + speed.

XLA's 2-key row sort at the G=65536 geometry runs ~40G comparator-ops
in ~58 ms (~2.8x off the VPU ALU bound), so the ceiling for a
hand-written kernel is ~2x — worth one timeboxed probe (VERDICT
round-3 item 6, tile-sorter half).  The kernel sorts each row of a
(R_tile, C) block with the standard bitonic network; the idx^j partner
exchange is two `pltpu.roll`s per plane + masked selects, all
VMEM-resident.  Remote-Mosaic risk is real (the repo's known HTTP-500
class for many-op kernels): a C=256 canary compiles first; every stage
prints an outcome line so a compiler rejection is recorded, not fatal.

Run (real chip): python -m bench.probe_plsort
"""

from __future__ import annotations

import functools
import json
import sys
import time

import numpy as np

from bench.steps import setup_jax, _sync


def main():
    jax = setup_jax()
    import jax.numpy as jnp
    from jax import lax
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    x = jax.device_put(np.ones((1, 1 << 20), np.uint32))
    x.block_until_ready()
    t0 = time.perf_counter()
    _ = np.asarray(x)
    print(json.dumps({"probe": "health_d2h_4mb_s",
                      "value": round(time.perf_counter() - t0, 3)}))
    sys.stdout.flush()

    def sort_kernel(hi_ref, lo_ref, ohi_ref, olo_ref):
        # lexicographic (hi, lo) bitonic over axis 1, fully unrolled
        hi = hi_ref[:].astype(jnp.uint32)
        lo = lo_ref[:]
        R, C = lo.shape
        idx = lax.broadcasted_iota(jnp.int32, (R, C), 1)
        k = 2
        while k <= C:
            j = k // 2
            while j >= 1:
                want_min = ((idx & j) == 0) == ((idx & k) == 0)
                upper = (idx & j) != 0
                # pltpu.roll requires non-negative shifts: -j == C - j
                p_hi = jnp.where(
                    upper,
                    pltpu.roll(hi, j, axis=1),
                    pltpu.roll(hi, C - j, axis=1),
                )
                p_lo = jnp.where(
                    upper,
                    pltpu.roll(lo, j, axis=1),
                    pltpu.roll(lo, C - j, axis=1),
                )
                p_less = (p_hi < hi) | ((p_hi == hi) & (p_lo < lo))
                take = want_min == p_less
                hi = jnp.where(take, p_hi, hi)
                lo = jnp.where(take, p_lo, lo)
                j //= 2
            k *= 2
        ohi_ref[:] = hi.astype(ohi_ref.dtype)
        olo_ref[:] = lo

    def make_sorter(G, C, R_tile):
        grid = (G // R_tile,)
        spec = lambda: pl.BlockSpec((R_tile, C), lambda g: (g, 0))

        @jax.jit
        def run(hi, lo):
            return pl.pallas_call(
                sort_kernel,
                grid=grid,
                in_specs=[spec(), spec()],
                out_specs=[spec(), spec()],
                out_shape=[
                    jax.ShapeDtypeStruct((G, C), hi.dtype),
                    jax.ShapeDtypeStruct((G, C), lo.dtype),
                ],
            )(hi, lo)

        return run

    rng = np.random.default_rng(0)

    def stage(name, G, C, R_tile, reps=3):
        hi = rng.integers(0, 1 << 10, (G, C), dtype=np.uint16)
        lo = rng.integers(0, 1 << 32, (G, C), dtype=np.uint32)
        d_hi = jax.device_put(jnp.asarray(hi))
        d_lo = jax.device_put(jnp.asarray(lo))
        N = G * C
        try:
            f = make_sorter(G, C, R_tile)
            ohi, olo = f(d_hi, d_lo)
            # correctness vs numpy lexsort on a few rows
            oh = np.asarray(ohi[:4])
            ol = np.asarray(olo[:4])
            for r in range(4):
                key = (hi[r].astype(np.uint64) << 32) | lo[r]
                want = np.sort(key)
                got = (oh[r].astype(np.uint64) << 32) | ol[r]
                assert np.array_equal(got, want), f"row {r} wrong"
            _sync(olo[:1, :128])
            t0 = time.perf_counter()
            for _ in range(reps):
                ohi, olo = f(d_hi, d_lo)
            _sync(olo[:1, :128])
            dt = (time.perf_counter() - t0) / reps
            print(json.dumps({
                "probe": name, "ok": True, "ms": round(dt * 1e3, 1),
                "melem_s": round(N / dt / 1e6, 1),
            }))
        except Exception as e:  # compile rejection is a RESULT here
            print(json.dumps({
                "probe": name, "ok": False,
                "error": f"{type(e).__name__}: {str(e)[:300]}",
            }))
        sys.stdout.flush()

        # XLA reference same shape, same window
        @jax.jit
        def ref(a, b):
            return lax.sort((a, b), dimension=1, num_keys=2,
                            is_stable=False)

        o = ref(d_hi, d_lo)
        _sync(o[1][:1, :128])
        t0 = time.perf_counter()
        for _ in range(reps):
            o = ref(d_hi, d_lo)
        _sync(o[1][:1, :128])
        dt = (time.perf_counter() - t0) / reps
        print(json.dumps({
            "probe": name + "_xla", "ms": round(dt * 1e3, 1),
            "melem_s": round(N / dt / 1e6, 1),
        }))
        sys.stdout.flush()

    import os

    stages = os.environ.get(
        "FINDKMER_PLSORT_STAGES", "canary,mid,prod"
    ).split(",")
    if "canary" in stages:
        # tiny network (36 passes), tiny block
        stage("plsort_canary_1024x256", 1024, 256, 256)
    if "mid" in stages:
        # the G=262144 geometry: C=512 (45 passes)
        stage("plsort_mid_262144x512", 262144, 512, 512)
    if "prod" in stages:
        # C=2048 (66 passes) — measured outcome: the unrolled body
        # crashes the remote compile helper (HTTP 500)
        stage("plsort_prod_65536x2048", 65536, 2048, 256)


if __name__ == "__main__":
    main()
