#!/usr/bin/env python
"""Generate the benchmark figure grid from collected results —
`/root/reference/scripts/plot_benchmarks.jl` analog."""

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).parent.parent))

from gpuacceleratedtracking_tpu.bench import collect_results
from gpuacceleratedtracking_tpu.bench.plots import (
    plot_kernel_benchmarks,
    plot_reduction_benchmark,
    plot_replica_benchmark,
    plot_track_benchmark,
)

if __name__ == "__main__":
    root = pathlib.Path(__file__).parent.parent
    figs = root / "img"
    figs.mkdir(parents=True, exist_ok=True)
    kernel_dir = root / "data" / "benchmarks" / "kernel"
    if any(kernel_dir.glob("*.json")):
        df = collect_results(kernel_dir)
        print(plot_kernel_benchmarks(df, str(figs / "kernel_benchmarks.png")))
    red_dir = root / "data" / "benchmarks" / "reduction"
    if any(red_dir.glob("*.json")):
        df = collect_results(red_dir)
        print(plot_reduction_benchmark(df, str(figs / "reduction_benchmarks.png")))
    rep_dir = root / "data" / "benchmarks" / "replica"
    if any(rep_dir.glob("*.json")):
        df = collect_results(rep_dir)
        print(plot_replica_benchmark(df, str(figs / "replica_benchmarks.png")))
    trk_dir = root / "data" / "benchmarks" / "track"
    if any(trk_dir.glob("*.json")):
        df = collect_results(trk_dir)
        print(plot_track_benchmark(df, str(figs / "track_benchmarks.png")))
