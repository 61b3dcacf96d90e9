#!/bin/bash
export PYTHONPATH=/root/repo:/root/.axon_site
cd /root/repo
run() {
  name=$1; shift
  echo "=== $name start $(date +%T) ==="
  timeout 1500 "$@" > /tmp/r4logs/$name.log 2>&1
  echo "=== $name exit $? $(date +%T) ==="
}
run autotune_m4l7 python - <<'PY'
from gpuacceleratedtracking_tpu.bench.autotune import autotune_tile_rows, best_launch, _cache_key, _CACHE_PATH
import json
cache = json.loads(_CACHE_PATH.read_text()) if _CACHE_PATH.exists() else {}
key = _cache_key("pallas_bank_auto", 256, 32768, 4, 7, "GPSL1")
if key not in cache:
    autotune_tile_rows("pallas_bank_auto", num_channels=256, num_samples=32768,
                       num_ants=4, num_taps=7, gnss="GPSL1")
print("M4L7 shape:", best_launch("pallas_bank_auto", 256, 32768, 4, 7, "GPSL1"))
PY
python - > /tmp/r4logs/gate4.log 2>&1 <<'PY'
import json, pathlib
cache = json.load(open("data/autotune.json"))
v = cache.get("TPU_v5_lite/pallas_bank_auto/GPSL1/K256_N32768_A4_L7")
if v and (v["tile_rows"] != 256 or v.get("chans_per_step", 1) != 1):
    for p in pathlib.Path("data/benchmarks/track").glob(
            "TrackBenchmark_*auto_blocks=8_num_ants=4_num_channels=256_num_correlators=7_*.json"):
        p.unlink(); print("deleted", p.name)
PY
cat /tmp/r4logs/gate4.log
run track_m4l7 python scripts/run_benchmarks_track.py
echo "=== BATCH8 DONE $(date +%T) ==="
