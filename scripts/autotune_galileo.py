#!/usr/bin/env python
"""Autotune launch shapes for the Galileo E1-C closed-loop cells.

Same protocol as autotune_wide.py (CLAUDE.md: never benchmark a bank config
whose key is missing from data/autotune.json). Resume-safe.
"""

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).parent.parent))

from gpuacceleratedtracking_tpu.bench.autotune import (
    _cache_key, _load_cache, autotune_tile_rows, best_launch,
)

CELLS = [(64, 32768), (256, 32768)]


def main():
    for k, n in CELLS:
        key = _cache_key("pallas_bank_auto", k, n, 1, 3, "GALILEOE1C")
        if key in _load_cache():
            print(f"K={k} N={n}: cached "
                  f"{best_launch('pallas_bank_auto', k, n, 1, 3, 'GALILEOE1C')}"
                  " (skip)", flush=True)
            continue
        print(f"tuning GALILEOE1C K={k} N={n} ...", flush=True)
        autotune_tile_rows("pallas_bank_auto", k, n, 1, 3, "GALILEOE1C")
        print(
            "  -> "
            f"{best_launch('pallas_bank_auto', k, n, 1, 3, 'GALILEOE1C')}",
            flush=True,
        )


if __name__ == "__main__":
    main()
