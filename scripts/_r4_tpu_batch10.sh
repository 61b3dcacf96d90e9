#!/bin/bash
export PYTHONPATH=/root/repo:/root/.axon_site
cd /root/repo
run() {
  name=$1; shift
  echo "=== $name start $(date +%T) ==="
  timeout 1500 "$@" > /tmp/r4logs/$name.log 2>&1
  echo "=== $name exit $? $(date +%T) ==="
}
run autotune_k960 python - <<'PY'
from gpuacceleratedtracking_tpu.bench.autotune import autotune_tile_rows, best_launch, _cache_key, _CACHE_PATH
import json
cache = json.loads(_CACHE_PATH.read_text()) if _CACHE_PATH.exists() else {}
key = _cache_key("pallas_bank_auto", 960, 32768, 1, 3, "GPSL1")
if key not in cache:
    autotune_tile_rows("pallas_bank_auto", num_channels=960, num_samples=32768, gnss="GPSL1")
print("K=960:", best_launch("pallas_bank_auto", 960, 32768, 1, 3, "GPSL1"))
PY
python - > /tmp/r4logs/gate6.log 2>&1 <<'PY'
import json, pathlib
cache = json.load(open("data/autotune.json"))
v = cache.get("TPU_v5_lite/pallas_bank_auto/GPSL1/K960_N32768_A1_L3")
if v and (v["tile_rows"] != 256 or v.get("chans_per_step", 1) != 1):
    for p in pathlib.Path("data/benchmarks/track").glob("MixedTrack_L1=960*l5_num_samples=32768.json"):
        p.unlink(); print("deleted", p.name)
PY
cat /tmp/r4logs/gate6.log
run mixed_final python scripts/exp_mixed_l1l5.py
echo "=== BATCH10 DONE $(date +%T) ==="
