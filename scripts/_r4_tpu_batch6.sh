#!/bin/bash
export PYTHONPATH=/root/repo:/root/.axon_site
cd /root/repo
run() {
  name=$1; shift
  echo "=== $name start $(date +%T) ==="
  timeout 1800 "$@" > /tmp/r4logs/$name.log 2>&1
  echo "=== $name exit $? $(date +%T) ==="
}
# Wide K=64-dual cell got a tuned shape (K128_N65536 -> 256x16) after its
# measurement; re-measure it with the tuned launch.
rm -f "data/benchmarks/track/DualTrackBenchmark_GNSS=GPSL5_algorithm=pallas_bank_auto_blocks=8_num_channels=64_num_correlators=3_num_samples=65536_processor=TPU_trials=7.json"
run dual_wide2 python scripts/run_benchmarks_track.py
run tpu_drive python scripts/tpu_drive.py
echo "=== BATCH6 DONE $(date +%T) ==="
