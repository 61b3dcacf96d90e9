"""Scratch: time the reference's 'unsolved challenge' config on one TPU chip.

GPS L5, M=4 antennas, L=7 correlators was NOT real-time on either of the
reference's GPUs at any sampling rate they tried (`paper/paper.tex:345`).
Measure per-1 ms-block time at N = 2^15..2^17 for the fused kernels, plus the
K-channel bank at N=32768.
"""

import functools
import json
import pathlib
import time

import numpy as np
import jax
import jax.numpy as jnp

from gpuacceleratedtracking_tpu.models import (
    GPSL5, EPLCorrelator, correlator_sample_shifts, gen_signal, soa,
)
from gpuacceleratedtracking_tpu.ops import registry

REPS1, REPS2 = 8, 40   # deep unroll: >= ~5 ms device work per timed call
system = GPSL5()
RESULTS = []          # persisted to data/benchmarks/l5_challenge.json
print("devices:", jax.devices())


def diff_time(f1, a1, f2, a2, trials=6):
    np.asarray(f1(*a1)); np.asarray(f2(*a2))
    ts = []
    for _ in range(trials):
        t0 = time.perf_counter(); np.asarray(f1(*a1)); t1 = time.perf_counter() - t0
        t0 = time.perf_counter(); np.asarray(f2(*a2)); t2 = time.perf_counter() - t0
        ts.append(max(t2 - t1, 0.0) / (REPS2 - REPS1))
    return float(np.median(ts)), float(np.min(ts))


def bench_single(algo, n, num_ants=4, num_taps=7):
    fs = n / 1e-3
    signal, _ = gen_signal(system, 6, -1800.0, n, num_ants=num_ants)
    sre, sim = soa(signal)
    codes = jnp.asarray(system.codes)
    shifts = tuple(int(s) for s in correlator_sample_shifts(
        system, EPLCorrelator(num_taps), fs))
    corr = functools.partial(
        registry.get(algo), sample_shifts=shifts,
        code_length=system.code_length)

    def make(r):
        @jax.jit
        def run(offs):
            tot = jnp.float32(0.0)
            for i in range(r):
                are, aim = corr(sre, sim, codes, 6, -1800.0, fs, offs[i],
                                system.code_frequency, offs[i])
                tot = tot + are.sum() + aim.sum()
            return tot
        return run, (jnp.linspace(0.0, 0.1, r).astype(jnp.float32),)

    med, best = diff_time(*make(REPS1), *make(REPS2))
    rt = 1e-3 / med if med > 0 else float("inf")
    RESULTS.append({"algorithm": algo, "num_samples": n, "num_ants": num_ants,
                    "num_taps": num_taps, "median_s": med, "min_s": best,
                    "rt_headroom": rt})
    print(f"{algo:13s} N={n:6d} ({n/1e3:5.1f} MHz) M={num_ants} L={num_taps}: "
          f"med {med*1e6:8.1f} us/block  rt headroom {rt:6.1f}x")


def bench_bank(n=32768, num_k=64, num_ants=4, num_taps=7):
    fs = n / 1e-3
    signal, _ = gen_signal(system, 6, -1800.0, n, num_ants=num_ants)
    sre, sim = soa(signal)
    codes = jnp.asarray(system.codes)
    shifts = tuple(int(s) for s in correlator_sample_shifts(
        system, EPLCorrelator(num_taps), fs))
    prns = jnp.arange(num_k, dtype=jnp.int32) % codes.shape[1]
    dops = jnp.linspace(-4000.0, 4000.0, num_k).astype(jnp.float32)
    from gpuacceleratedtracking_tpu.bench.autotune import best_launch

    launch = best_launch("pallas_bank", num_k, n, num_ants, num_taps, "GPSL5")
    corr = functools.partial(
        registry.get("pallas_bank"), sample_shifts=shifts,
        code_length=system.code_length, sampling_frequency=fs,
        nominal_code_frequency=system.code_frequency, **launch)

    def make(r):
        @jax.jit
        def run(offs):
            tot = jnp.float32(0.0)
            for i in range(r):
                are, aim = corr(
                    sre, sim, codes, prns, -1800.0 + dops,
                    carrier_phase=jnp.zeros(num_k) + offs[i],
                    code_frequency=jnp.full(num_k, system.code_frequency),
                    code_phase=jnp.zeros(num_k))
                tot = tot + are.sum() + aim.sum()
            return tot
        return run, (jnp.linspace(0.0, 0.1, r).astype(jnp.float32),)

    med, best = diff_time(*make(REPS1), *make(REPS2))
    rt_ch = num_k * 1e-3 / med if med > 0 else float("inf")
    RESULTS.append({"algorithm": "pallas_bank", "num_samples": n,
                    "num_ants": num_ants, "num_taps": num_taps,
                    "num_channels": num_k, "median_s": med, "min_s": best,
                    "realtime_channels": rt_ch, **launch})
    print(f"pallas_bank   N={n} M={num_ants} L={num_taps} K={num_k}: "
          f"med {med*1e3:7.3f} ms/block -> {rt_ch:6.1f} real-time channels")


for n in (32768, 65536, 131072):
    bench_single("pallas_fused", n)
bench_single("fused_xla", 32768)
bench_bank()
out = pathlib.Path(__file__).parent.parent / "data" / "benchmarks" / "l5_challenge.json"
out.write_text(json.dumps(RESULTS, indent=1))
print("saved", out)
