#!/bin/bash
# Audit-grade on-TPU smoke subset (VERDICT round-2 item 6).  Runs the
# enumerated tests below on the REAL chip (FINDKMER_TESTS_ON_TPU=1);
# record each round's outcome in bench/RESULTS.md.
#
# Coverage, by Mosaic/remote-lowering risk (CLAUDE.md gotcha #6):
#   1. tests/test_pallas.py            — EVERY Pallas kernel entry point:
#        histogram_pallas (k=2..10 incl. the uint16-plane k=9..10),
#        fused_window_histogram (+canonical), counter hist="pallas",
#        odd geometries (padding/tiling edges)
#   2. tests/test_sparse.py chr_shaped — one chr-scale-SHAPED (4M-slot
#        ladder) row compaction + ordered finalize (big-sort lowering)
#   3. tests/test_vs_oracle.py subset  — end-to-end oracle exactness on
#        the real chip (dense/sparse canonical, fixtures, ecoli — the
#        round-2 subset)
#   4. tests/test_filter.py device     — the device filter engine
#        (sort-merge membership + unsort + bitmap pack)
set -u
cd "$(dirname "$0")/.."
LOG=${FINDKMER_SMOKE_LOG:-bench/round4_measurements.log}
echo "=== tpu smoke $(date -u +%FT%TZ) ===" >> $LOG
rc=0

run() {
    echo "--- $* ---" >> $LOG
    FINDKMER_TESTS_ON_TPU=1 timeout 2400 python -m pytest "$@" -q \
        > /tmp/tpu_smoke_part.log 2>&1 || rc=1
    tail -3 /tmp/tpu_smoke_part.log >> $LOG
}

run tests/test_pallas.py
run tests/test_sparse.py::test_chr_shaped_compaction_ordered_finalize
run tests/test_vs_oracle.py -k "dense_canonical or sparse_canonical or fixture or ecoli"
run tests/test_filter.py -k "device"

echo "=== tpu smoke done rc=$rc $(date -u +%FT%TZ) ===" >> $LOG
tail -20 $LOG
exit $rc
