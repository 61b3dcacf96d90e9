#!/usr/bin/env python
"""Autotune launch shapes for the wide-span L1 cells (fs >= 131 MHz).

Round 5 extends the rows/comp kernels to tap spans >= 128 samples, opening
the top two cells of the reference envelope
(`/root/reference/scripts/run_benchmarks_gpsl1.jl:8`, N = 2^17 and 2^18) to
the bank kernels. CLAUDE.md: never benchmark a bank config whose
(algorithm, K, N, A, L, GNSS) key is missing from data/autotune.json —
this fills those keys. Resume-safe: tuned keys are skipped.
"""

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).parent.parent))

import json

from gpuacceleratedtracking_tpu.bench.autotune import (
    _cache_key, _load_cache, autotune_tile_rows, best_launch,
)

CELLS = [
    # (K, N) — L=3, A=1, GPSL1 wide-span track cells.
    (256, 131072),
    (1024, 131072),
    (256, 262144),
    (1024, 262144),
]


def main():
    for k, n in CELLS:
        key = _cache_key("pallas_bank_auto", k, n, 1, 3, "GPSL1")
        if key in _load_cache():
            print(f"K={k} N={n}: cached "
                  f"{best_launch('pallas_bank_auto', k, n, 1, 3, 'GPSL1')}"
                  " (skip)", flush=True)
            continue
        print(f"tuning K={k} N={n} ...", flush=True)
        autotune_tile_rows(
            "pallas_bank_auto", k, n, 1, 3, "GPSL1",
            # Per-call work scales with N; shallower unrolls keep calls ~1 s.
            reps=(2, 6) if n >= 262144 else (4, 12),
        )
        print(f"  -> {best_launch('pallas_bank_auto', k, n, 1, 3, 'GPSL1')}",
              flush=True)


if __name__ == "__main__":
    main()
