#!/bin/bash
export PYTHONPATH=/root/repo:/root/.axon_site
cd /root/repo
run() {
  name=$1; shift
  echo "=== $name start $(date +%T) ==="
  timeout 1800 "$@" > /tmp/r4logs/$name.log 2>&1
  echo "=== $name exit $? $(date +%T) ==="
}
run autotune_l5ch python - <<'PY'
from gpuacceleratedtracking_tpu.bench.autotune import autotune_tile_rows, best_launch, _cache_key, _CACHE_PATH
import json
cache = json.loads(_CACHE_PATH.read_text()) if _CACHE_PATH.exists() else {}
key = _cache_key("pallas_bank", 64, 32768, 4, 7, "GPSL5")
if key not in cache:
    autotune_tile_rows("pallas_bank", num_channels=64, num_samples=32768,
                       num_ants=4, num_taps=7, gnss="GPSL5")
print("challenge bank shape:", best_launch("pallas_bank", 64, 32768, 4, 7, "GPSL5"))
PY
run l5_challenge python scripts/exp_l5_challenge.py
echo "=== BATCH7 DONE $(date +%T) ==="
