#!/usr/bin/env python
"""Headline benchmark: aggregate EPL correlator throughput on one chip.

Prints ONE JSON line ``{"metric", "value", "unit", "vs_baseline"}``.

Protocol follows the reference's (BenchmarkTools minimum estimator under
``CUDA.@sync``, `/root/reference/paper/paper.tex:147-150`): min-of-k trials
around `jax.block_until_ready`, with per-call dispatch amortized by scanning
many correlation blocks inside one jitted call (mandatory over the tunnel,
~25 ms/dispatch).

Baseline: the reference's best single-channel real-time figure, ~100 MHz
(1e8 samples/s) EPL on a GTX 1050 Ti (`/root/reference/paper/paper.tex:345`).
``vs_baseline`` is the speedup of this chip's aggregate correlator throughput
over that bound.
"""

import functools
import json
import os
import time

import numpy as np
import jax
import jax.numpy as jnp

NUM_CHANNELS = int(os.environ.get("BENCH_CHANNELS", "64"))
NUM_SAMPLES = int(os.environ.get("BENCH_SAMPLES", "32768"))
REPS = int(os.environ.get("BENCH_REPS", "50"))
TRIALS = int(os.environ.get("BENCH_TRIALS", "5"))
ALGORITHM = os.environ.get("BENCH_ALGO", "pallas_bank")
BASELINE_SAMPLES_PER_S = 1e8


def main():
    from gpuacceleratedtracking_tpu.models import (
        GPSL1,
        EPLCorrelator,
        correlator_sample_shifts,
        gen_signal,
        soa,
    )
    from gpuacceleratedtracking_tpu.ops import registry

    system = GPSL1()
    fs = NUM_SAMPLES / 1e-3
    signal, _ = gen_signal(system, 0, 1500.0, NUM_SAMPLES)
    sre, sim = soa(signal)
    codes = jnp.asarray(system.codes)
    shifts = tuple(
        int(s)
        for s in correlator_sample_shifts(system, EPLCorrelator(3), fs)
    )
    corr = functools.partial(
        registry.get(ALGORITHM),
        sample_shifts=shifts,
        code_length=system.code_length,
    )

    prns = jnp.arange(NUM_CHANNELS, dtype=jnp.int32) % codes.shape[1]
    dopplers = jnp.linspace(-4000.0, 4000.0, NUM_CHANNELS).astype(jnp.float32)

    code_freqs = jnp.full((NUM_CHANNELS,), system.code_frequency, jnp.float32)

    def bank(phase_offset):
        # One front-end block correlated against NUM_CHANNELS channels.
        if ALGORITHM == "pallas_bank":
            # Channels ride the kernel grid: one lowering for any K. vmap of a
            # pallas_call re-lowers per channel (catastrophic compile time).
            phases = jnp.full((NUM_CHANNELS,), phase_offset, jnp.float32)
            return corr(
                sre, sim, codes, prns, 1500.0 + dopplers, fs,
                phases, code_freqs, phases,
            )

        def one(prn, dop):
            return corr(
                sre, sim, codes, prn, 1500.0 + dop, fs,
                phase_offset, system.code_frequency, phase_offset,
            )
        return jax.vmap(one)(prns, dopplers)

    @jax.jit
    def run(offsets):
        def body(acc, off):
            are, aim = bank(off)
            return acc + are.sum() + aim.sum(), None
        total, _ = jax.lax.scan(body, jnp.float32(0.0), offsets)
        return total

    offsets = jnp.linspace(0.0, 0.1, REPS).astype(jnp.float32)
    jax.block_until_ready(run(offsets))  # compile
    best = float("inf")
    for _ in range(TRIALS):
        t0 = time.perf_counter()
        jax.block_until_ready(run(offsets))
        best = min(best, time.perf_counter() - t0)

    samples = REPS * NUM_CHANNELS * NUM_SAMPLES
    throughput = samples / best
    print(
        json.dumps(
            {
                "metric": f"epl_correlator_throughput_{ALGORITHM}_K{NUM_CHANNELS}",
                "value": round(throughput / 1e6, 1),
                "unit": "Msamples/s",
                "vs_baseline": round(throughput / BASELINE_SAMPLES_PER_S, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
