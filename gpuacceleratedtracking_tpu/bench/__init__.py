"""Benchmark harness: timing protocol, dict-driven benchmarks, sweeps, plots."""

from .timing import TrialStats, benchmark
from .harness import (
    REALTIME_BOUND_S,
    add_metadata,
    run_acquire_benchmark,
    run_dual_track_benchmark,
    run_kernel_benchmark,
    run_reduction_benchmark,
    run_replica_benchmark,
    run_track_benchmark,
)
from .autotune import autotune_tile_rows, best_tile_rows
from .sweep import collect_results, dict_list, run_sweep, savename
from .results import eval_results

__all__ = [
    "TrialStats",
    "benchmark",
    "REALTIME_BOUND_S",
    "add_metadata",
    "run_acquire_benchmark",
    "run_dual_track_benchmark",
    "run_kernel_benchmark",
    "run_reduction_benchmark",
    "run_replica_benchmark",
    "run_track_benchmark",
    "autotune_tile_rows",
    "best_tile_rows",
    "collect_results",
    "dict_list",
    "run_sweep",
    "savename",
    "eval_results",
]
