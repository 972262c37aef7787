#!/bin/bash
# Round-4 TPU measurement sweep — run when the tunnel is healthy.
# Appends to bench/round4_measurements.log.  Each stage is independent;
# rerun the whole script freely (compiles are cached).
set -u
cd "$(dirname "$0")/.."
LOG=bench/round4_measurements.log
echo "=== sweep $(date -u +%FT%TZ) ===" >> $LOG

# 0. tunnel health gate
timeout 120 python - <<'EOF' >> $LOG 2>&1 || { echo "tunnel unhealthy, abort" >> $LOG; exit 1; }
import time, jax, numpy as np
x = jax.device_put(np.ones((1, 1<<20), np.uint32)); x.block_until_ready()
t0=time.perf_counter(); h=np.asarray(x); dt=time.perf_counter()-t0
print(f"health D2H 4MB: {dt:.2f}s")
assert dt < 1.0, "degraded"
EOF

# 1. driver bench (k8 dense, k21 plain+canonical, k15, merge metric)
timeout 2400 python bench.py >> $LOG 2>&1

# 2. ingest decomposition + cross-window jitter accumulation
timeout 1800 python -m bench.probe_ingest >> $LOG 2>&1
timeout 1200 python -m bench.probe_jitter >> $LOG 2>&1

# 3. chr-scale end-to-end (input synthesized on first use — /tmp does
#    not survive across rounds)
[ -f /tmp/chr_sim.fa ] || timeout 600 python - <<'EOF' >> $LOG 2>&1
import os
from bench.quick import _synth_fasta
_synth_fasta("/tmp/chr_sim.fa.tmp", 100_000_000)
os.rename("/tmp/chr_sim.fa.tmp", "/tmp/chr_sim.fa")
print("synthesized /tmp/chr_sim.fa")
EOF
( time timeout 1800 python -m findkmer_tpu.cli count -i /tmp/chr_sim.fa -k 21 \
    -o /tmp/chr21_sweep.txt --stats json ) >> $LOG 2>&1

# 4. filter device end-to-end (offsets flow vs round-3 list flow)
timeout 1800 python -m bench.probe_filter >> $LOG 2>&1

# 5. the enumerated on-TPU smoke subset
bash bench/tpu_smoke.sh >> $LOG 2>&1

echo "=== sweep done $(date -u +%FT%TZ) ===" >> $LOG
tail -40 $LOG
