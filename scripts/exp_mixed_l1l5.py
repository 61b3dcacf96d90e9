#!/usr/bin/env python
"""Mixed-constellation closed-loop benchmark: L1 bank + L5 dual bank, one chip.

The north-star sentence (BASELINE.md) is "≥1024 GPS L1+L5 channels tracked in
real time on a v5e-8" — this measures its literal per-chip ingredient: one
chip running BOTH a K1-channel GPS L1 bank (32.768 MHz, flagship rows/auto
kernel) AND a K5-channel GPS L5 dual-component bank (2·K5 bank channels, NH
wipe-off + pilot atan2 closure) every 1 ms block, strictly sequentially on the
single device stream. The reference never times any closed loop on GPU, let
alone a mixed-band one (`/root/reference/scripts/run_benchmarks_gpsl5.jl` is
open-loop; its paper calls L5 M=4 L=7 unsolved, paper.tex:345).

Timing: paired-unroll differential medians over block count (dispatch cost
cancels; fence = host materialization of a scalar combining BOTH banks'
outputs). Output: data/benchmarks/track/MixedTrack_*.json per scenario.

Scenarios: (512 L1 + 32 L5-dual) — the VERDICT ask — and (960 L1 + 64
L5-dual) = 1024 total satellite channels, the north-star mix on one chip.
"""

import json
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).parent.parent))

import numpy as np
import jax
import jax.numpy as jnp

from gpuacceleratedtracking_tpu.models import GPSL1, GPSL5, gen_signal, soa
from gpuacceleratedtracking_tpu.bench.autotune import best_launch
from gpuacceleratedtracking_tpu.bench.harness import (
    REALTIME_BOUND_S,
    add_metadata,
)
from gpuacceleratedtracking_tpu.bench.timing import benchmark_differential
from gpuacceleratedtracking_tpu.tracking import (
    TrackConfig,
    dual_config,
    init_state,
    track_bank,
    track_bank_dual,
)

N = 32768
BLOCKS = 8
TRIALS = 7
# (L1 channels, L5 dual channels, L5 samples per 1 ms block). n5=32768
# (32.768 MHz) keeps L5 on the transition kernel; n5=65536 (65.536 MHz,
# wideband front end, 0.156 chips/sample) routes the rows kernel for L5.
SCENARIOS = [(512, 32, 32768), (960, 64, 32768), (960, 64, 65536)]


def build(k1, k5, n5):
    fs = N / 1e-3
    fs5 = n5 / 1e-3
    l1 = GPSL1()
    l5i, l5q = GPSL5(), GPSL5(quadrature=True)

    launch1 = best_launch("pallas_bank_auto", k1, N, 1, 3, "GPSL1")
    cfg1 = TrackConfig.for_system(
        l1, fs, N, algorithm="pallas_bank_auto", **launch1
    )
    launch5 = best_launch("pallas_bank_auto", 2 * k5, n5, 1, 3, "GPSL5")
    cfg5 = dual_config(TrackConfig.for_system(
        l5i, fs5, n5, algorithm="pallas_bank_auto", use_secondary=False,
        **launch5,
    ))

    st1 = init_state(
        np.arange(k1) % l1.codes.shape[1],
        carrier_doppler=np.linspace(-4000.0, 4000.0, k1),
    )
    st5 = init_state(
        np.arange(k5) % l5i.codes.shape[1],
        carrier_doppler=np.linspace(-4000.0, 4000.0, k5),
    )
    codes1 = jnp.asarray(l1.codes)
    codes5i = jnp.asarray(l5i.codes)
    codes5q = jnp.asarray(l5q.codes)

    def make_fn(b):
        s1, _ = gen_signal(l1, 0, 1500.0, N * b, duration=b * 1e-3)
        s5, _ = gen_signal(
            l5i, 0, 1500.0, n5 * b, duration=b * 1e-3,
            secondary_code=l5i.secondary_code,
        )
        sre1, sim1 = (x.reshape(b, N) for x in soa(s1))
        sre5, sim5 = (x.reshape(b, n5) for x in soa(s5))

        @jax.jit
        def fence(o1, o5):
            return o1.prompt_re.sum() + o5.pilot.prompt_re.sum()

        def run():
            _, o1 = track_bank(cfg1, codes1, st1, sre1, sim1)
            _, o5 = track_bank_dual(cfg5, codes5i, codes5q, st5, sre5, sim5)
            # Fence leaf depends on BOTH banks: materializing it proves both
            # finished (single device stream).
            return fence(o1, o5)

        return run, ()

    return make_fn, launch1, launch5


def main():
    out_dir = (
        pathlib.Path(__file__).parent.parent / "data" / "benchmarks" / "track"
    )
    out_dir.mkdir(parents=True, exist_ok=True)
    for k1, k5, n5 in SCENARIOS:
        path = (out_dir
                / f"MixedTrack_L1={k1}_L5dual={k5}_num_samples={N}"
                  f"_l5_num_samples={n5}.json")
        if path.exists():
            print(f"skip (exists): {path.name}")
            continue
        make_fn, launch1, launch5 = build(k1, k5, n5)
        stats = benchmark_differential(make_fn, BLOCKS, trials=TRIALS)
        floor = max(stats.median, 1e-9)
        total = k1 + k5
        res = {
            "GNSS": "GPSL1+GPSL5",
            "num_samples": N,
            "l5_num_samples": n5,
            "l1_channels": k1,
            "l5_dual_channels": k5,
            "bank_channels": k1 + 2 * k5,
            "blocks": BLOCKS,
            "trials": TRIALS,
            "launch_l1": launch1,
            "launch_l5": launch5,
        }
        res.update(stats.to_dict())
        res["realtime_ratio"] = floor / REALTIME_BOUND_S
        res["realtime_channels"] = total * REALTIME_BOUND_S / floor
        res["samples_per_s"] = (k1 + 2 * k5) * N / floor
        # Chips needed so THIS mix runs inside real time, ASSUMING linear
        # scaling when the heterogeneous mix splits across chips (per-launch
        # fixed costs make real splits slightly worse; derive production
        # chip counts from measured per-chip sub-mix cells like the 512+32
        # re-measurement instead).
        res["chips_for_realtime_linear_est"] = int(
            np.ceil(floor / REALTIME_BOUND_S)
        )
        add_metadata(res, "TPU", "pallas_bank_auto")
        path.write_text(json.dumps(res, indent=1))
        print(json.dumps({k: res[k] for k in (
            "l1_channels", "l5_dual_channels", "Median", "realtime_ratio",
            "realtime_channels", "chips_for_realtime_linear_est",
        )}))


if __name__ == "__main__":
    main()
