#!/bin/bash
# Round-5 TPU measurement sweep — run when the tunnel is healthy.
# Appends to bench/round5_measurements.log.  Each stage is independent;
# rerun the whole script freely (compiles are cached).
set -u
cd "$(dirname "$0")/.."
LOG=bench/round5_measurements.log
echo "=== sweep $(date -u +%FT%TZ) ===" >> $LOG

# 0. tunnel health gate
timeout 120 python - <<'EOF' >> $LOG 2>&1 || { echo "tunnel unhealthy, abort" >> $LOG; exit 1; }
import time, jax, numpy as np
x = jax.device_put(np.ones((1, 1<<20), np.uint32)); x.block_until_ready()
t0=time.perf_counter(); h=np.asarray(x); dt=time.perf_counter()-t0
print(f"health D2H 4MB: {dt:.2f}s")
assert dt < 1.0, "degraded"
EOF

# 1. driver bench (k8 dense @1024r, k21 plain+canonical, k15, wire-v2 merge)
timeout 2400 python bench.py >> $LOG 2>&1

# 2. round-5 probes: k8 A/B, finalize wire decomposition, jitter
timeout 2400 python -m bench.probe_k8_sort >> $LOG 2>&1
timeout 2400 python -m bench.probe_finalize_wire >> $LOG 2>&1
timeout 1200 python -m bench.probe_jitter >> $LOG 2>&1

# 3. chr-scale end-to-end (wire v2 cut the finalize tail: round-4 29.2 s)
[ -f /tmp/chr_sim.fa ] || timeout 600 python - <<'EOF' >> $LOG 2>&1
import os
from bench.quick import _synth_fasta
_synth_fasta("/tmp/chr_sim.fa.tmp", 100_000_000)
os.rename("/tmp/chr_sim.fa.tmp", "/tmp/chr_sim.fa")
print("synthesized /tmp/chr_sim.fa")
EOF
( time timeout 1800 python -m findkmer_tpu.cli count -i /tmp/chr_sim.fa -k 21 \
    -o /tmp/chr21_sweep.txt --stats json ) >> $LOG 2>&1

# 4. the enumerated on-TPU smoke subset
FINDKMER_SMOKE_LOG=$LOG bash bench/tpu_smoke.sh >> $LOG 2>&1

echo "=== sweep done $(date -u +%FT%TZ) ===" >> $LOG
tail -40 $LOG
