#!/usr/bin/env python
"""Autotune launch shapes for any registered GNSS family's closed-loop cells.

Generalizes autotune_galileo.py (CLAUDE.md: never benchmark a bank config
whose (algorithm, K, N, A, L, GNSS) key is missing from data/autotune.json —
kernel defaults cost up to 40 %). Resume-safe: cached keys are skipped.

Usage:
    python scripts/autotune_family.py BEIDOUB1I 64:32768 256:32768
"""

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).parent.parent))

from gpuacceleratedtracking_tpu.bench.autotune import (
    _cache_key, _load_cache, autotune_tile_rows, best_launch,
)


def main(argv):
    gnss = argv[0]
    cells = [tuple(int(x) for x in a.split(":")) for a in argv[1:]]
    for k, n in cells:
        key = _cache_key("pallas_bank_auto", k, n, 1, 3, gnss)
        if key in _load_cache():
            print(f"{gnss} K={k} N={n}: cached "
                  f"{best_launch('pallas_bank_auto', k, n, 1, 3, gnss)}"
                  " (skip)", flush=True)
            continue
        print(f"tuning {gnss} K={k} N={n} ...", flush=True)
        autotune_tile_rows("pallas_bank_auto", k, n, 1, 3, gnss)
        print(
            f"  -> {best_launch('pallas_bank_auto', k, n, 1, 3, gnss)}",
            flush=True,
        )


if __name__ == "__main__":
    main(sys.argv[1:])
