#!/bin/bash
export PYTHONPATH=/root/repo:/root/.axon_site
cd /root/repo
run() {
  name=$1; shift
  echo "=== $name start $(date +%T) ==="
  timeout 2400 "$@" > /tmp/r4logs/$name.log 2>&1
  echo "=== $name exit $? $(date +%T) ==="
}
run autotune_l1lo python - <<'PY'
from gpuacceleratedtracking_tpu.bench.autotune import autotune_tile_rows, best_launch, _cache_key, _CACHE_PATH
import json
cache = json.loads(_CACHE_PATH.read_text()) if _CACHE_PATH.exists() else {}
for k, n in [(1024, 4096), (512, 4096)]:
    key = _cache_key("pallas_bank_auto", k, n, 1, 3, "GPSL1")
    if key in cache:
        print(f"K={k} N={n}: cached (skip)"); continue
    autotune_tile_rows("pallas_bank_auto", num_channels=k, num_samples=n, gnss="GPSL1")
    print(f"K={k} N={n}: -> {best_launch('pallas_bank_auto', k, n, 1, 3, 'GPSL1')}")
PY
python - > /tmp/r4logs/gate3.log 2>&1 <<'PY'
import json, pathlib
cache = json.load(open("data/autotune.json"))
for k in (512, 1024):
    key = f"TPU_v5_lite/pallas_bank_auto/GPSL1/K{k}_N4096_A1_L3"
    v = cache.get(key)
    if v and (v["tile_rows"] != 256 or v.get("chans_per_step", 1) != 1):
        for p in pathlib.Path("data/benchmarks/track").glob(
                f"TrackBenchmark_*auto_blocks=8_num_ants=1_num_channels={k}_num_correlators=3_num_samples=4096_*.json"):
            p.unlink(); print("deleted", p.name)
PY
cat /tmp/r4logs/gate3.log
run track_retune3 python scripts/run_benchmarks_track.py
echo "=== BATCH5 DONE $(date +%T) ==="
