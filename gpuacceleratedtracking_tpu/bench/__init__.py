"""Benchmark harness: timing protocol, dict-driven benchmarks, sweeps, plots."""

from .timing import TrialStats, benchmark
from .harness import (
    REALTIME_BOUND_S,
    add_metadata,
    run_kernel_benchmark,
    run_reduction_benchmark,
    run_replica_benchmark,
)
from .sweep import collect_results, dict_list, run_sweep, savename
from .results import eval_results

__all__ = [
    "TrialStats",
    "benchmark",
    "REALTIME_BOUND_S",
    "add_metadata",
    "run_kernel_benchmark",
    "run_reduction_benchmark",
    "run_replica_benchmark",
    "collect_results",
    "dict_list",
    "run_sweep",
    "savename",
    "eval_results",
]
