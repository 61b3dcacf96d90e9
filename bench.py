#!/usr/bin/env python
"""Headline benchmark: aggregate EPL correlator throughput on one chip.

Prints ONE JSON line ``{"metric", "value", "unit", "vs_baseline"}``.

Protocol: differential **median** estimator — the per-block time is
``(t(2r) - t(r)) / r`` over paired unrolled jits, which cancels the fixed
tunneled-dispatch cost (~25-50 ms round trip), and the median over trials
rejects the chip's run-to-run drift (RESULTS.md "Environment caveats"). This
mirrors the reference's BenchmarkTools protocol under ``CUDA.@sync``
(`/root/reference/paper/paper.tex:147-150`) adapted for a noisy shared chip:
medians are the headline, min (burst) is also reported.

Baseline: the reference's best single-channel real-time figure, ~100 MHz
(1e8 samples/s) EPL on a GTX 1050 Ti (`/root/reference/paper/paper.tex:345`).
``vs_baseline`` is the speedup of this chip's aggregate correlator throughput
over that bound. The flagship config is a 1024-channel GPS L1 bank at
262.144 MHz sampling — the TOP cell of the reference's own benchmark
envelope (N = 2^18, `/root/reference/scripts/run_benchmarks_gpsl1.jl:8`),
which the reference GPU cannot run in real time even single-channel; the
round-5 wide-span rows kernel carries 1024 such channels at ~6.8 ms/block
(~39.5 Gsamples/s). BENCH_SAMPLES=32768 reproduces the round-3/4
north-star scenario (~19 Gsamples/s — fewer samples per channel-block, so
lower aggregate throughput at higher real-time channel count).
"""

import functools
import json
import os
import statistics
import time

import jax
import jax.numpy as jnp

NUM_CHANNELS = int(os.environ.get("BENCH_CHANNELS", "1024"))
NUM_SAMPLES = int(os.environ.get("BENCH_SAMPLES", "262144"))
REPS = int(os.environ.get("BENCH_REPS", "4"))
TRIALS = int(os.environ.get("BENCH_TRIALS", "9"))
ALGORITHM = os.environ.get("BENCH_ALGO", "pallas_bank_auto")
TILE_ROWS = int(os.environ.get("BENCH_TILE_ROWS", "0"))  # 0 = autotune cache
BASELINE_SAMPLES_PER_S = 1e8


def main():
    import numpy as np

    from gpuacceleratedtracking_tpu.models import (
        GPSL1,
        EPLCorrelator,
        correlator_sample_shifts,
        gen_signal,
        soa,
    )
    from gpuacceleratedtracking_tpu.bench.autotune import best_launch
    from gpuacceleratedtracking_tpu.ops import registry

    launch = best_launch(ALGORITHM, NUM_CHANNELS, NUM_SAMPLES)
    if TILE_ROWS:
        launch["tile_rows"] = TILE_ROWS
    tile_rows = launch["tile_rows"]
    system = GPSL1()
    fs = NUM_SAMPLES / 1e-3
    signal, _ = gen_signal(system, 0, 1500.0, NUM_SAMPLES)
    sre, sim = soa(signal)
    codes = jnp.asarray(system.codes)
    shifts = tuple(
        int(s)
        for s in correlator_sample_shifts(system, EPLCorrelator(3), fs)
    )

    prns = jnp.arange(NUM_CHANNELS, dtype=jnp.int32) % codes.shape[1]
    dopplers = jnp.linspace(-4000.0, 4000.0, NUM_CHANNELS).astype(jnp.float32)
    code_freqs = jnp.full((NUM_CHANNELS,), system.code_frequency, jnp.float32)
    zeros = jnp.zeros(NUM_CHANNELS, jnp.float32)

    if ALGORITHM.startswith("pallas_bank"):
        extra = dict(launch)
        if ALGORITHM == "pallas_bank_onehot":
            extra = {"tile_rows": tile_rows}
        else:
            extra["nominal_code_frequency"] = system.code_frequency
        corr = functools.partial(
            registry.get(ALGORITHM),
            sample_shifts=shifts,
            code_length=system.code_length,
            sampling_frequency=fs,
            **extra,
        )

        def call(off):
            return corr(
                sre, sim, codes, prns, 1500.0 + dopplers,
                carrier_phase=zeros + off, code_frequency=code_freqs,
                code_phase=zeros,
            )
    else:
        corr1 = functools.partial(
            registry.get(ALGORITHM),
            sample_shifts=shifts,
            code_length=system.code_length,
        )

        def call(off):
            def one(prn, dop):
                return corr1(
                    sre, sim, codes, prn, 1500.0 + dop, fs, off,
                    system.code_frequency, 0.0,
                )
            return jax.vmap(one)(prns, dopplers)

    def make(r):
        """One jitted call executing ``r`` distinct bank blocks."""

        @jax.jit
        def run(offs):
            tot = jnp.float32(0.0)
            for i in range(r):
                are, aim = call(offs[i])
                tot = tot + are.sum() + aim.sum()
            return tot

        return run, (jnp.linspace(0.0, 0.1, r).astype(jnp.float32),)

    f1, a1 = make(REPS)
    f2, a2 = make(2 * REPS)
    np.asarray(f1(*a1))  # compile + true sync (block_until_ready is lazy here)
    np.asarray(f2(*a2))
    diffs = []
    for _ in range(TRIALS):
        t0 = time.perf_counter()
        np.asarray(f1(*a1))
        ta = time.perf_counter() - t0
        t0 = time.perf_counter()
        np.asarray(f2(*a2))
        tb = time.perf_counter() - t0
        diffs.append(max(tb - ta, 1e-9) / REPS)

    med = statistics.median(diffs)
    burst = min(diffs)
    throughput = NUM_CHANNELS * NUM_SAMPLES / med
    print(
        json.dumps(
            {
                "metric": f"epl_correlator_throughput_{ALGORITHM}_K{NUM_CHANNELS}_N{NUM_SAMPLES}",
                "value": round(throughput / 1e6, 1),
                "unit": "Msamples/s",
                "vs_baseline": round(throughput / BASELINE_SAMPLES_PER_S, 2),
                "median_ms_per_block": round(med * 1e3, 3),
                "burst_ms_per_block": round(burst * 1e3, 3),
                "tile_rows": tile_rows,
            }
        )
    )


if __name__ == "__main__":
    main()
