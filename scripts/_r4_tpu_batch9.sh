#!/bin/bash
export PYTHONPATH=/root/repo:/root/.axon_site
cd /root/repo
run() {
  name=$1; shift
  echo "=== $name start $(date +%T) ==="
  timeout 1800 "$@" > /tmp/r4logs/$name.log 2>&1
  echo "=== $name exit $? $(date +%T) ==="
}
run autotune_k512 python - <<'PY'
from gpuacceleratedtracking_tpu.bench.autotune import autotune_tile_rows, best_launch, _cache_key, _CACHE_PATH
import json
cache = json.loads(_CACHE_PATH.read_text()) if _CACHE_PATH.exists() else {}
for k, gnss in [(512, "GPSL1"), (32, "GPSL1"), (256, "GLONASSL1"), (64, "GLONASSL1")]:
    key = _cache_key("pallas_bank_auto", k, 32768, 1, 3, gnss)
    if key in cache:
        print(f"{gnss} K={k}: cached (skip)"); continue
    autotune_tile_rows("pallas_bank_auto", num_channels=k, num_samples=32768, gnss=gnss)
    print(f"{gnss} K={k}: -> {best_launch('pallas_bank_auto', k, 32768, 1, 3, gnss)}")
PY
python - > /tmp/r4logs/gate5.log 2>&1 <<'PY'
import json, pathlib
cache = json.load(open("data/autotune.json"))
for k, gnss in [(512, "GPSL1"), (32, "GPSL1"), (256, "GLONASSL1"), (64, "GLONASSL1")]:
    key = f"TPU_v5_lite/pallas_bank_auto/{gnss}/K{k}_N32768_A1_L3"
    v = cache.get(key)
    if v and (v["tile_rows"] != 256 or v.get("chans_per_step", 1) != 1):
        pat = (f"TrackBenchmark_GNSS={gnss}_algorithm=pallas_bank_auto_blocks=8*"
               f"num_channels={k}_num_correlators=3_num_samples=32768_*.json")
        for p in pathlib.Path("data/benchmarks/track").glob(pat):
            p.unlink(); print("deleted", p.name)
PY
cat /tmp/r4logs/gate5.log
run track_k512 python scripts/run_benchmarks_track.py
echo "=== BATCH9 DONE $(date +%T) ==="
