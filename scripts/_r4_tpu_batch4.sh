#!/bin/bash
export PYTHONPATH=/root/repo:/root/.axon_site
cd /root/repo
mkdir -p /tmp/r4logs
run() {
  name=$1; shift
  echo "=== $name start $(date +%T) ==="
  timeout 2400 "$@" > /tmp/r4logs/$name.log 2>&1
  echo "=== $name exit $? $(date +%T) ==="
}
run autotune_l5b python scripts/autotune_l5.py
# Re-measure the dual cells whose shapes just got tuned (256-bank = K=128
# dual; 64-bank feeds the small mixed run).
python - > /tmp/r4logs/gate2.log 2>&1 <<'PY'
import json, pathlib
cache = json.load(open("data/autotune.json"))
k256 = cache.get("TPU_v5_lite/pallas_bank_auto/GPSL5/K256_N32768_A1_L3")
if k256 and (k256["tile_rows"] != 256 or k256.get("chans_per_step", 1) != 1):
    for p in pathlib.Path("data/benchmarks/track").glob(
            "DualTrackBenchmark_*num_channels=128*num_samples=32768*.json"):
        p.unlink(); print("deleted", p.name)
k64 = cache.get("TPU_v5_lite/pallas_bank_auto/GPSL5/K64_N32768_A1_L3")
if k64 and (k64["tile_rows"] != 256 or k64.get("chans_per_step", 1) != 1):
    for p in pathlib.Path("data/benchmarks/track").glob(
            "MixedTrack_L1=512*l5_num_samples=32768.json"):
        p.unlink(); print("deleted", p.name)
PY
cat /tmp/r4logs/gate2.log
run dual_retune2 python scripts/run_benchmarks_track.py
run mixed_retune2 python scripts/exp_mixed_l1l5.py
run track_denoise python scripts/rerun_noisy_track.py
echo "=== BATCH4 DONE $(date +%T) ==="
