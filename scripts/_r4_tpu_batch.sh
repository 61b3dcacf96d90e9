#!/bin/bash
# Round-4 TPU measurement batch — strictly sequential (one chip, CLAUDE.md).
export PYTHONPATH=/root/repo:/root/.axon_site
cd /root/repo
mkdir -p /tmp/r4logs
run() {
  name=$1; shift
  echo "=== $name start $(date +%T) ==="
  timeout 2400 "$@" > /tmp/r4logs/$name.log 2>&1
  echo "=== $name exit $? $(date +%T) ==="
}
run bf16z_ab   python scripts/exp_bf16z_loop_ab.py
run dual_sweep python scripts/run_benchmarks_track.py
run mixed      python scripts/exp_mixed_l1l5.py
run accuracy   python scripts/benchmark_accuracy.py
run coldstart  python scripts/run_coldstart.py --capture-dir /tmp/cs_tpu
echo "=== BATCH DONE $(date +%T) ==="
