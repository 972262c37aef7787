#!/bin/bash
# Round-2 TPU measurement sweep — run when the tunnel is healthy.
# Appends to bench/round2_measurements.log.  Each stage is independent;
# rerun the whole script freely (compiles are cached).
set -u
cd /root/repo
LOG=bench/round2_measurements.log
echo "=== sweep $(date -u +%FT%TZ) ===" >> $LOG

# 0. tunnel health gate
timeout 90 python - <<'EOF' >> $LOG 2>&1 || { echo "tunnel unhealthy, abort" >> $LOG; exit 1; }
import time, jax, numpy as np
x = jax.device_put(np.ones((1, 1<<20), np.uint32)); x.block_until_ready()
t0=time.perf_counter(); h=np.asarray(x); dt=time.perf_counter()-t0
print(f"health D2H 4MB: {dt:.2f}s")
assert dt < 1.0, "degraded"
EOF

# 1. G-sweep of the row-wise compaction sort
timeout 1200 python - <<'EOF' >> $LOG 2>&1
import time
from functools import partial
from bench.steps import setup_jax, _sync
jax = setup_jax()
import jax.numpy as jnp, numpy as np
from findkmer_tpu.ops import sparse as sp
N = 50331648
rng = np.random.default_rng(0)
hi = jax.device_put(jnp.asarray(rng.integers(0, 1<<10, N, dtype=np.uint32)))
lo = jax.device_put(jnp.asarray(rng.integers(0, 1<<32, N, dtype=np.uint32)))
for G in (64, 128, 256):
    f = jax.jit(partial(sp.compact_raw_2d, cdtype=jnp.int32))
    hig, log = hi.reshape(G, -1), lo.reshape(G, -1)
    out = f(hig, log); _sync(out[3])
    t0 = time.perf_counter()
    for _ in range(2):
        out = f(hig, log)
    _sync(out[3])
    dt = (time.perf_counter()-t0)/2
    print(f"compact_raw_2d G={G}: {dt*1e3:.0f} ms = {N/dt/1e6:.0f} Melem/s", flush=True)
EOF

# 1b. sparse ingest geometry sweep (launch-overhead amortization)
timeout 1800 python - <<'EOF' >> $LOG 2>&1
from bench.steps import setup_jax, bench_sparse_step
jax = setup_jax()
for br, cl in ((32, 16384), (64, 16384), (128, 16384), (32, 65536),
               (64, 65536)):
    bps, dt = bench_sparse_step(jax, k=21, batch_rows=br, chunk_len=cl)
    print(f"sparse k=21 B={br} L={cl}: {bps/1e6:.0f} Mbase/s", flush=True)
EOF

# 2. driver bench (k8 dense, k21 + k15 sparse)
timeout 1800 python bench.py >> $LOG 2>&1

# 3. chr-scale end-to-end with phase breakdown (input synthesized on
#    first use — /tmp does not survive across rounds)
[ -f /tmp/chr_sim.fa ] || timeout 600 python - <<'EOF' >> $LOG 2>&1
# write-then-rename: a partial file from a killed synth must never be
# cached as the benchmark input
import os
from bench.quick import _synth_fasta
_synth_fasta("/tmp/chr_sim.fa.tmp", 100_000_000)
os.rename("/tmp/chr_sim.fa.tmp", "/tmp/chr_sim.fa")
print("synthesized /tmp/chr_sim.fa")
EOF
( time timeout 1800 python -m findkmer_tpu.cli count -i /tmp/chr_sim.fa -k 21 \
    -o /tmp/chr21_sweep.txt --stats json ) >> $LOG 2>&1

# 4. TPU smoke subset (oracle-exact on the real chip)
FINDKMER_TESTS_ON_TPU=1 timeout 1800 python -m pytest \
    tests/test_vs_oracle.py -q -x -k "dense_canonical or sparse_canonical or fixture or ecoli" \
    >> $LOG 2>&1

echo "=== sweep done $(date -u +%FT%TZ) ===" >> $LOG
tail -40 $LOG
