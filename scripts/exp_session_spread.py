#!/usr/bin/env python
"""Cross-session dispersion of the chip-count headline cells (VERDICT r4 #5).

Chip timing drifts run to run (CLAUDE.md: the same kernel measured 1.65 and
3.4 ms/block hours apart — tunnel/thermal state), yet the round-4 chip-count
headlines rest on single-session medians with sub-IQR margins ("2 chips
carry 1024 L1 channels" = K=512 at 0.993 ms, a 0.7 % margin). This script
measures the three headline cells once per invocation and APPENDS a
timestamped session record to ``data/benchmarks/session_spread.json``.
Run it in >= 3 sessions hours apart; RESULTS publishes min/median/max per
cell and states chip counts from the WORST session.

Cells:
  l1_k512      K=512 GPS L1 @ 32.768 MHz closed loop (per-chip share of the
               2-chip 1024-channel claim; "2 chips" requires < 1 ms here)
  mixed_512_32 the 544-channel L1+L5 mix (2-chip claim for 1088 channels)
  mixed_960_64 the 1024-channel north-star mix
"""

import datetime
import json
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).parent.parent))

import jax

from gpuacceleratedtracking_tpu.bench.harness import run_track_benchmark
from gpuacceleratedtracking_tpu.bench.timing import benchmark_differential

import exp_mixed_l1l5 as mixed

OUT = (pathlib.Path(__file__).parent.parent / "data" / "benchmarks"
       / "session_spread.json")
TRIALS = 9


def main():
    records = json.loads(OUT.read_text()) if OUT.exists() else []
    session = {
        "time_utc": datetime.datetime.now(datetime.timezone.utc).isoformat(
            timespec="seconds"
        ),
        "device": jax.devices()[0].device_kind,
        "cells": {},
    }

    res = run_track_benchmark({
        "GNSS": "GPSL1", "num_samples": 32768, "num_channels": 512,
        "num_ants": 1, "num_correlators": 3,
        "algorithm": "pallas_bank_auto", "processor": "TPU",
        "blocks": 8, "trials": TRIALS,
    })
    session["cells"]["l1_k512"] = {
        "median_s": res["Median"], "times_s": res["times"],
        "launch": {k: res.get(k) for k in ("tile_rows", "chans_per_step")},
    }
    print(f"l1_k512: {res['Median'] * 1e3:.3f} ms/block", flush=True)

    for k1, k5, n5, name in [
        (512, 32, 32768, "mixed_512_32"),
        (960, 64, 32768, "mixed_960_64"),
    ]:
        make_fn, launch1, launch5 = mixed.build(k1, k5, n5)
        stats = benchmark_differential(make_fn, mixed.BLOCKS, trials=TRIALS)
        session["cells"][name] = {
            "median_s": stats.median, "times_s": list(stats.times),
            "launch_l1": launch1, "launch_l5": launch5,
        }
        print(f"{name}: {stats.median * 1e3:.3f} ms/block", flush=True)

    records.append(session)
    OUT.write_text(json.dumps(records, indent=1))
    print(f"session #{len(records)} recorded -> {OUT.name}")


if __name__ == "__main__":
    main()
