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
run autotune_l5 python scripts/autotune_l5.py
# Re-measure dual cells only if the tuner found non-default shapes.
python - <<'PY' > /tmp/r4logs/tune_gate.log 2>&1
import json, pathlib
cache = json.load(open("data/autotune.json"))
better = [k for k, v in cache.items()
          if "GPSL5" in k and (v.get("tile_rows") != 256 or v.get("chans_per_step", 1) != 1)]
print("non-default GPSL5 shapes:", better)
if better:
    for p in pathlib.Path("data/benchmarks/track").glob("DualTrackBenchmark_*.json"):
        p.unlink()
    for p in pathlib.Path("data/benchmarks/track").glob("MixedTrack_*l5_num_samples=*.json"):
        p.unlink()
    print("deleted dual/mixed cells for re-measurement")
PY
cat /tmp/r4logs/tune_gate.log
run dual_retune python scripts/run_benchmarks_track.py
run mixed_retune python scripts/exp_mixed_l1l5.py
run coldstart3 python scripts/run_coldstart.py --capture-dir /tmp/cs_tpu
echo "=== BATCH3 DONE $(date +%T) ==="
