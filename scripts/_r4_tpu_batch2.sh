#!/bin/bash
# Round-4 TPU batch 2: wideband-L5 dual cells, noisy-cell re-runs, retries.
export PYTHONPATH=/root/repo:/root/.axon_site
cd /root/repo
mkdir -p /tmp/r4logs
run() {
  name=$1; shift
  echo "=== $name start $(date +%T) ==="
  timeout 2400 "$@" > /tmp/r4logs/$name.log 2>&1
  echo "=== $name exit $? $(date +%T) ==="
}
run dual_wide  python scripts/run_benchmarks_track.py
run mixed_wide python scripts/exp_mixed_l1l5.py
run accuracy2 python scripts/benchmark_accuracy.py
run rerun_noisy python scripts/rerun_noisy_cells.py
run coldstart2 python scripts/run_coldstart.py --capture-dir /tmp/cs_tpu
echo "=== BATCH2 DONE $(date +%T) ==="
