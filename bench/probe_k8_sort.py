"""Round-5 probe: k=8 dense accumulate A/B — one-hot Pallas MXU kernel
vs the row-sort+RLE chain (round-4 verdict weak #1).

The k=8 dense path plateaued four rounds at ~1.5-1.57 Gbase/s behind an
"at its MXU roofline" claim, while the SAME repo's sort machinery does
1967 Mbase/s at k=15 (u32 codes, identical element count and dtype —
k <= 15 all ride one u32 plane).  This probe measures, in one window
with health probes around:

  * dense k=8, hist=auto (pallas one-hot) at the bench geometry (256
    rows) and at the production 1024-row geometry;
  * k=8 routed through the sparse log-store (table_mode=sparse): the
    same ingest + row-sort + scan-RLE chain as k=15, plus its finalize
    (<= 65536 distinct - trivial);
  * dense k=4 both ways (auto-routing decision for the small-k end).

Run on the real chip:  python -m bench.probe_k8_sort
"""

from __future__ import annotations

import json
import time

import numpy as np

from bench.steps import (
    bench_dense_step,
    bench_sparse_step,
    setup_jax,
)


def health(jax):
    x = jax.device_put(np.ones((1, 1 << 20), np.uint32))
    x.block_until_ready()
    t0 = time.perf_counter()
    _ = np.asarray(x)
    return round(time.perf_counter() - t0, 3)


def main():
    jax = setup_jax()
    print(json.dumps({"probe": "health_pre", "s": health(jax)}))

    out = {}
    d_bps, _ = bench_dense_step(jax, k=8, batch_rows=256)
    out["dense_k8_pallas_256r"] = round(d_bps / 1e6)
    d_bps2, _ = bench_dense_step(jax, k=8, batch_rows=1024)
    out["dense_k8_pallas_1024r"] = round(d_bps2 / 1e6)
    s_bps, _, fin = bench_sparse_step(
        jax, k=8, table_mode="sparse", time_finalize=True
    )
    out["sort_k8_ingest_compact"] = round(s_bps / 1e6)
    out["sort_k8_finalize_s"] = round(fin, 3)
    # effective bases/s with the finalize amortized over the bench's
    # 201M windows (a chr-scale run amortizes it over >= this)
    bases = 1024 * 65536 * 3
    out["sort_k8_with_finalize"] = round(bases / (bases / s_bps + fin) / 1e6)
    d4, _ = bench_dense_step(jax, k=4, batch_rows=256)
    out["dense_k4_pallas_256r"] = round(d4 / 1e6)
    s4, _, fin4 = bench_sparse_step(
        jax, k=4, table_mode="sparse", time_finalize=True
    )
    out["sort_k4_ingest_compact"] = round(s4 / 1e6)
    out["sort_k4_finalize_s"] = round(fin4, 3)
    print(json.dumps({"probe": "health_post", "s": health(jax)}))
    print(json.dumps(out))


if __name__ == "__main__":
    main()
