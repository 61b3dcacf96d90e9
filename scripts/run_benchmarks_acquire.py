#!/usr/bin/env python
"""PCPS acquisition benchmark sweep (host CPU path).

The one subsystem without timing evidence until round 4. Runs on the host
CPU by design — the tunneled axon TPU plugin has no FFT lowering (RESULTS.md
"Backend limitations"), and a receiver acquires once per satellite rise while
tracking runs continuously. Sweep axes: block length N (=> Doppler-bin count
via the 2/(3T) default grid), PRN-list size K, noncoherent rounds R.

Role match: Acquisition.jl -> Tracking.jl handoff in the reference ecosystem
(`/root/reference/src/benchmarks.jl:54`).
"""

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).parent.parent))

import jax

jax.config.update("jax_platforms", "cpu")

from gpuacceleratedtracking_tpu.bench import run_acquire_benchmark, run_sweep

params = {
    "GNSS": "GPSL1",
    "num_samples": [2048, 8192, 32768],
    "num_prns": [1, 8, 32],
    "rounds": [1, 6],
    "trials": 7,
}

l5_params = {
    "GNSS": "GPSL5",
    "num_samples": [32768],
    "num_prns": [1, 8, 32],
    "rounds": [1, 6],
    "trials": 7,
}

if __name__ == "__main__":
    out = (
        pathlib.Path(__file__).parent.parent / "data" / "benchmarks"
        / "acquire"
    )
    run_sweep(params, run_acquire_benchmark, out, prefix="AcquireBenchmark")
    run_sweep(l5_params, run_acquire_benchmark, out, prefix="AcquireBenchmark")
