#!/usr/bin/env python
"""Measure the per-grid-step fixed cost of the flagship rows kernel
(VERDICT r4 item 3: the plateau story attributed ~0.5 ms of the 1.75 ms
K=1024 block to "DMA/loop overhead" without measuring it).

Protocol: the ``ablate="empty"`` kernel variant (grid sequencing + block
DMA + output RMW only, per-channel body removed) is timed with SCAN-CARRIED
reps (the round-4 unrolled differential clamped it to 0.0 — below the
tunnel noise floor at 10 reps) across launch shapes spanning 64..1024 grid
steps; a least-squares line through (steps, T_empty) gives the per-step
fixed cost. The full kernel at the flagship shape then decomposes as

    T_full(256x16) = steps * c_step  +  T_channel_work

and the decomposition is committed to roofline.json as
``overhead_measured_r5`` next to the r4 exact-floor model (1.25 ms plane
ops) it completes. Same within-process interleaved protocol as
exp_ablate_rows (the only comparison that survives run-to-run drift).
"""

import functools
import json
import pathlib
import statistics
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).parent.parent))

import numpy as np
import jax
import jax.numpy as jnp

from gpuacceleratedtracking_tpu.models import (
    GPSL1, EPLCorrelator, correlator_sample_shifts, gen_signal, soa,
)
from gpuacceleratedtracking_tpu.ops import registry

K, N = 1024, 32768
TRIALS = 9
# (tile_rows, chans_per_step) -> grid steps = (K/g) * ceil(N / (tr*128)).
SHAPES = [(256, 16), (256, 4), (64, 16), (32, 32), (256, 1)]
FLAGSHIP = (256, 16)


def steps_of(tr, g):
    tiles = -(-N // (tr * 128))
    return (K // g) * tiles


def main():
    system = GPSL1()
    fs = N / 1e-3
    signal, _ = gen_signal(system, 0, 1500.0, N)
    sre, sim = soa(signal)
    codes = jnp.asarray(system.codes)
    shifts = tuple(int(s) for s in correlator_sample_shifts(
        system, EPLCorrelator(3), fs))
    prns = jnp.arange(K, dtype=jnp.int32) % codes.shape[1]
    dops = jnp.linspace(-4000.0, 4000.0, K).astype(jnp.float32)
    zeros = jnp.zeros(K, jnp.float32)

    def make(kw, r):
        corr = functools.partial(
            registry.get("pallas_bank_rows"), sample_shifts=shifts,
            code_length=system.code_length, sampling_frequency=fs,
            nominal_code_frequency=system.code_frequency, **kw,
        )

        @jax.jit
        def run(offs):
            def body(total, off):
                are, aim = corr(
                    sre, sim, codes, prns, 1500.0 + dops,
                    carrier_phase=zeros + off,
                    code_frequency=zeros + system.code_frequency,
                    code_phase=zeros,
                )
                return total + are.sum() + aim.sum(), None

            return jax.lax.scan(
                body, jnp.float32(0.0), offs, unroll=2
            )[0]

        return run, (jnp.linspace(0.0, 0.1, r).astype(jnp.float32),)

    # Variant matrix: empty at every shape (deep scans — it's fast), full at
    # the flagship + default shapes (moderate scans).
    cases = {}
    for tr, g in SHAPES:
        cases[f"empty_{tr}x{g}"] = (
            {"tile_rows": tr, "chans_per_step": g, "ablate": "empty"}, 64,
        )
    for tr, g in (FLAGSHIP, (256, 1)):
        cases[f"full_{tr}x{g}"] = (
            {"tile_rows": tr, "chans_per_step": g}, 16,
        )

    fns = {}
    for name, (kw, reps) in cases.items():
        f1, a1 = make(kw, reps)
        f2, a2 = make(kw, 2 * reps)
        np.asarray(f1(*a1)); np.asarray(f2(*a2))
        fns[name] = (f1, a1, f2, a2, reps)
        print(f"compiled {name}", flush=True)

    samples = {name: [] for name in fns}
    for t in range(TRIALS):
        for name, (f1, a1, f2, a2, reps) in fns.items():
            t0 = time.perf_counter(); np.asarray(f1(*a1))
            ta = time.perf_counter() - t0
            t0 = time.perf_counter(); np.asarray(f2(*a2))
            tb = time.perf_counter() - t0
            samples[name].append(max(tb - ta, 0.0) / reps)
        print(f"trial {t + 1}/{TRIALS}", flush=True)
    med = {name: statistics.median(v) for name, v in samples.items()}

    # Least-squares per-step cost from the empty-kernel line.
    xs = np.array([steps_of(tr, g) for tr, g in SHAPES], float)
    ys = np.array([med[f"empty_{tr}x{g}"] for tr, g in SHAPES], float)
    a_fit, b_fit = np.polyfit(xs, ys, 1)       # T = a*steps + b
    tr, g = FLAGSHIP
    n_steps = steps_of(tr, g)
    t_empty = med[f"empty_{tr}x{g}"]
    t_full = med[f"full_{tr}x{g}"]
    payload = {
        "num_channels": K, "num_samples": N,
        "device": jax.devices()[0].device_kind,
        "protocol": "scan-carried reps, interleaved differential medians, "
                    f"{TRIALS} trials",
        "empty_ms_per_block": {
            f"{tr_}x{g_}": round(med[f"empty_{tr_}x{g_}"] * 1e3, 4)
            for tr_, g_ in SHAPES
        },
        "steps_per_block": {f"{tr_}x{g_}": steps_of(tr_, g_)
                            for tr_, g_ in SHAPES},
        "per_step_us_fit": round(a_fit * 1e6, 4),
        "fit_intercept_ms": round(b_fit * 1e3, 4),
        "flagship": {
            "shape": f"{tr}x{g}", "steps": n_steps,
            "empty_ms": round(t_empty * 1e3, 4),
            "full_ms": round(t_full * 1e3, 4),
            "channel_work_ms": round((t_full - t_empty) * 1e3, 4),
            "full_default_shape_ms": round(med["full_256x1"] * 1e3, 4),
            "empty_default_shape_ms": round(med["empty_256x1"] * 1e3, 4),
        },
        "raw_s": samples,
    }
    root = pathlib.Path(__file__).parent.parent / "data" / "benchmarks"
    roof = json.loads((root / "roofline.json").read_text())
    roof["overhead_measured_r5"] = {
        k: v for k, v in payload.items() if k != "raw_s"
    }
    (root / "roofline.json").write_text(json.dumps(roof, indent=1))
    (root / "overhead_fit.json").write_text(json.dumps(payload, indent=1))
    print(json.dumps({k: v for k, v in payload.items() if k != "raw_s"},
                     indent=1))


if __name__ == "__main__":
    main()
