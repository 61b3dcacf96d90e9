#!/bin/bash
export PYTHONPATH=/root/repo:/root/.axon_site
cd /root/repo
rm -f "data/benchmarks/track/MixedTrack_L1=512_L5dual=32_num_samples=32768_l5_num_samples=32768.json"
echo "=== mixed512 start $(date +%T) ==="
timeout 1500 python scripts/exp_mixed_l1l5.py > /tmp/r4logs/mixed512.log 2>&1
echo "=== mixed512 exit $? $(date +%T) ==="
