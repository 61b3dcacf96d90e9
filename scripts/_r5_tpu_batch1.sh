#!/bin/bash
# Round-5 TPU measurement batch #1 — strictly sequential (one chip, CLAUDE.md).
# Covers: cross-session spread point 1, wide-span autotune + track/kernel
# cells, noisy-cell re-measurement, overhead fit, on-chip acquisition cells,
# accumulator accuracy (wide cells now numeric), on-chip-acquisition coldstart.
export PYTHONPATH=/root/repo:/root/.axon_site
cd /root/repo
mkdir -p /tmp/r5logs
run() {
  name=$1; shift
  echo "=== $name start $(date +%T) ==="
  timeout "$T" "$@" > /tmp/r5logs/$name.log 2>&1
  echo "=== $name exit $? $(date +%T) ==="
}
T=1200 run spread1      python scripts/exp_session_spread.py
T=2400 run tune_wide    python scripts/autotune_wide.py
T=3600 run track_wide   python scripts/run_benchmarks_track.py
# stale fused wide-span cells were measured under the pre-r5 taps fallback:
python - <<'EOF'
import json, pathlib
kd = pathlib.Path("data/benchmarks/kernel")
for p in sorted(kd.glob("KernelBenchmark_GNSS=GPSL1_algorithm=pallas_fused*processor=TPU*.json")):
    d = json.loads(p.read_text())
    n, L = int(d["num_samples"]), int(d["num_correlators"])
    unit = max(1, round(0.5 * (n * 1e3) / 1.023e6))
    if (L - 1) * unit >= 128:
        print("re-measure:", p.name)
        p.unlink()
EOF
T=3600 run kernel_wide  python scripts/run_benchmarks_gpsl1.py
T=2400 run noisy_track  python scripts/rerun_noisy_track.py
T=2400 run noisy_kernel python scripts/rerun_noisy_cells.py
T=2400 run overhead     python scripts/exp_overhead_fit.py
T=3600 run acquire_tpu  python scripts/run_benchmarks_acquire.py --tpu
T=2400 run accuracy     python scripts/benchmark_accuracy.py
T=3600 run coldstart    python scripts/run_coldstart.py --capture-dir /tmp/cs_r5
echo "=== BATCH1 DONE $(date +%T) ==="
