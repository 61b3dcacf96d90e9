#!/usr/bin/env python
"""Autotune launch shapes for the GPS L5 bank scenarios (dual + mixed).

The round-4 dual-track sweeps ran on cache misses (tile_rows=256,
chans_per_step=1 defaults); the transition/rows kernels group per-channel
work over `chans_per_step`, which was the single biggest lever at L1
(cps 1 -> 16 was ~2x). Tunes the `pallas_bank_auto` key the benchmarks look
up (`bench.autotune.best_launch(algorithm, 2K, N, 1, 3, "GPSL5")`) and
prints old-vs-new shapes. Re-run the Dual/Mixed sweeps afterwards (they are
resume-safe; delete the cells you want re-measured).
"""

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).parent.parent))

from gpuacceleratedtracking_tpu.bench.autotune import (
    autotune_tile_rows,
    best_launch,
)

# (bank channels, num_samples): the DualTrackBenchmark shapes (2K dual) and
# the mixed-run L5 banks.
SHAPES = [
    (32, 32768),
    (128, 32768),
    (512, 32768),
    (64, 32768),     # mixed-run small L5 bank (K5=32 dual)
    (256, 32768),    # K=128-dual cell
    (128, 65536),
    (512, 65536),
]

if __name__ == "__main__":
    import json

    from gpuacceleratedtracking_tpu.bench.autotune import (
        _CACHE_PATH,
        _cache_key,
    )

    cache = (
        json.loads(_CACHE_PATH.read_text()) if _CACHE_PATH.exists() else {}
    )
    for k, n in SHAPES:
        key = _cache_key("pallas_bank_auto", k, n, 1, 3, "GPSL5")
        if key in cache:
            print(f"K={k} N={n}: cached {best_launch('pallas_bank_auto', k, n, 1, 3, 'GPSL5')} (skip)")
            continue
        old = best_launch("pallas_bank_auto", k, n, 1, 3, "GPSL5")
        autotune_tile_rows(
            "pallas_bank_auto", num_channels=k, num_samples=n, gnss="GPSL5",
        )
        new = best_launch("pallas_bank_auto", k, n, 1, 3, "GPSL5")
        print(f"K={k} N={n}: {old} -> {new}")
