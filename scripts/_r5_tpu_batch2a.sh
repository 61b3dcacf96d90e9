#!/bin/bash
# Round-5 TPU batch #2a — Galileo E1-C cells + sweep leftovers (no spread
# session here: cross-session points run standalone, hours apart).
export PYTHONPATH=/root/repo:/root/.axon_site
cd /root/repo
mkdir -p /tmp/r5logs
run() {
  name=$1; shift
  echo "=== $name start $(date +%T) ==="
  timeout "$T" "$@" > /tmp/r5logs/$name.log 2>&1
  echo "=== $name exit $? $(date +%T) ==="
}
T=2400 run tune_galileo   python scripts/autotune_galileo.py
T=3600 run track_galileo  python scripts/run_benchmarks_track.py
T=2400 run noisy_track2   python scripts/rerun_noisy_track.py
echo "=== BATCH2A DONE $(date +%T) ==="
