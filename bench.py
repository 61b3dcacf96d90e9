#!/usr/bin/env python
"""Headline benchmark: aggregate EPL correlator throughput on one chip.

Prints ONE JSON line ``{"metric", "value", "unit", "vs_baseline"}``.

Protocol follows the reference's (BenchmarkTools minimum estimator under
``CUDA.@sync``, `/root/reference/paper/paper.tex:147-150`): min-of-k trials
around `jax.block_until_ready`. Per-call dispatch is amortized by enqueueing
``REPS`` async dispatches back-to-back and blocking once (TPU streams execute
in order). NOTE: do NOT wrap the pallas_call in `lax.scan` for timing — on
this backend that multiplies compile time by minutes.

Baseline: the reference's best single-channel real-time figure, ~100 MHz
(1e8 samples/s) EPL on a GTX 1050 Ti (`/root/reference/paper/paper.tex:345`).
``vs_baseline`` is the speedup of this chip's aggregate correlator throughput
over that bound. The flagship config is a 1024-channel GPS L1 bank at
32.768 MHz sampling — the north-star scenario (BASELINE.md) on one chip.
"""

import functools
import json
import os
import time

import jax
import jax.numpy as jnp

NUM_CHANNELS = int(os.environ.get("BENCH_CHANNELS", "1024"))
NUM_SAMPLES = int(os.environ.get("BENCH_SAMPLES", "32768"))
REPS = int(os.environ.get("BENCH_REPS", "20"))
TRIALS = int(os.environ.get("BENCH_TRIALS", "5"))
ALGORITHM = os.environ.get("BENCH_ALGO", "pallas_bank")
TILE_ROWS = int(os.environ.get("BENCH_TILE_ROWS", "0"))  # 0 = autotune cache
BASELINE_SAMPLES_PER_S = 1e8


def main():
    from gpuacceleratedtracking_tpu.models import (
        GPSL1,
        EPLCorrelator,
        correlator_sample_shifts,
        gen_signal,
        soa,
    )
    from gpuacceleratedtracking_tpu.bench.autotune import best_tile_rows
    from gpuacceleratedtracking_tpu.ops import registry

    tile_rows = TILE_ROWS or best_tile_rows(
        ALGORITHM, NUM_CHANNELS, NUM_SAMPLES
    )
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
        fn = jax.jit(
            functools.partial(
                registry.get(ALGORITHM),
                sample_shifts=shifts,
                code_length=system.code_length,
                sampling_frequency=fs,
                tile_rows=tile_rows,
                **(
                    {"nominal_code_frequency": system.code_frequency}
                    if ALGORITHM == "pallas_bank"
                    else {}
                ),
            )
        )
        args = (sre, sim, codes, prns, 1500.0 + dopplers)
        kwargs = dict(carrier_phase=zeros, code_frequency=code_freqs,
                      code_phase=zeros)
    else:
        corr = functools.partial(
            registry.get(ALGORITHM),
            sample_shifts=shifts,
            code_length=system.code_length,
        )

        def bank(sre_, sim_, prns_, dops_):
            def one(prn, dop):
                return corr(
                    sre_, sim_, codes, prn, 1500.0 + dop, fs, 0.0,
                    system.code_frequency, 0.0,
                )
            return jax.vmap(one)(prns_, dops_)

        fn = jax.jit(bank)
        args = (sre, sim, prns, dopplers)
        kwargs = {}

    import numpy as np

    np.asarray(fn(*args, **kwargs)[0])  # compile + real sync
    best = float("inf")
    for _ in range(TRIALS):
        t0 = time.perf_counter()
        outs = [fn(*args, **kwargs) for _ in range(REPS)]
        # block_until_ready is lazy over the tunneled backend; a host
        # materialization of the last output is the only true fence
        # (execution is in-order, so the last output implies all done).
        np.asarray(outs[-1][0])
        best = min(best, (time.perf_counter() - t0) / REPS)

    throughput = NUM_CHANNELS * NUM_SAMPLES / best
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
