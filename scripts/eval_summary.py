#!/usr/bin/env python
"""Markdown summary tables from the committed benchmark datasets.

Reads ``data/benchmarks/**`` and prints the tables RESULTS.md cites, so every
number in RESULTS regenerates from committed data with one command:

    python scripts/eval_summary.py
"""

import json
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).parent.parent))

ROOT = pathlib.Path(__file__).parent.parent / "data" / "benchmarks"


def _load(subdir):
    rows = []
    for p in sorted((ROOT / subdir).glob("*.json")):
        d = json.loads(p.read_text())
        if "error" not in d:
            rows.append(d)
    return rows


def _us(x):
    return f"{x * 1e6:.0f}"


def kernel_table(gnss, processor, num_ants, num_correlators):
    rows = [
        r for r in _load("kernel")
        if r["GNSS"] == gnss and r["processor"] == processor
        and r["num_ants"] == num_ants
        and r["num_correlators"] == num_correlators
    ]
    if not rows:
        return
    ns = sorted({r["num_samples"] for r in rows})
    algos = sorted({r["algorithm"] for r in rows})
    print(f"\n### {gnss} {processor} M={num_ants} L={num_correlators} "
          f"(median µs per 1 ms block)\n")
    print("| algorithm | " + " | ".join(f"N={n}" for n in ns) + " |")
    print("|---" * (len(ns) + 1) + "|")
    for a in algos:
        cells = []
        for n in ns:
            m = [r["Median"] for r in rows
                 if r["algorithm"] == a and r["num_samples"] == n]
            cells.append(_us(m[0]) if m else "—")
        print(f"| `{a}` | " + " | ".join(cells) + " |")


def track_table():
    rows = _load("track")
    if not rows:
        return
    print("\n### Closed-loop track sweep (median ms/block; rt chans)\n")
    print("| algorithm | fs MHz | K | M | L | ms/block | rt chans |")
    print("|---|---|---|---|---|---|---|")
    for r in sorted(rows, key=lambda r: (r["algorithm"], -r["num_samples"],
                                         r.get("num_ants", 1),
                                         r.get("num_correlators", 3),
                                         -r["num_channels"])):
        print(f"| `{r['algorithm']}` | {r['num_samples']/1e3:.3f} "
              f"| {r['num_channels']} | {r.get('num_ants', 1)} "
              f"| {r.get('num_correlators', 3)} | {r['Median']*1e3:.2f} "
              f"| {min(r['realtime_channels'], r['num_channels']*1000):.0f} |")


def micro_tables():
    red = _load("reduction")
    if red:
        print("\n### Reduction fusion degrees (median µs)\n")
        ns = sorted({r["num_samples"] for r in red})
        print("| algorithm | " + " | ".join(f"N={n}" for n in ns) + " |")
        print("|---" * (len(ns) + 1) + "|")
        for a in ("pure", "cplx", "cplx_multi"):
            cells = [
                _us(next((r["Median"] for r in red
                          if r["algorithm"] == a and r["num_samples"] == n),
                         float("nan")))
                for n in ns
            ]
            print(f"| `{a}` | " + " | ".join(cells) + " |")
    rep = _load("replica")
    if rep:
        print("\n### Replica generation, exact vs quantized NCO (median µs)\n")
        ns = sorted({r["num_samples"] for r in rep})
        print("| algorithm | " + " | ".join(f"N={n}" for n in ns) + " |")
        print("|---" * (len(ns) + 1) + "|")
        for a in ("exact", "quantized"):
            cells = [
                _us(next((r["Median"] for r in rep
                          if r["algorithm"] == a and r["num_samples"] == n),
                         float("nan")))
                for n in ns
            ]
            print(f"| `{a}` | " + " | ".join(cells) + " |")


def cpu_vs_tpu(gnss="GPSL1"):
    rows = [r for r in _load("kernel") if r["GNSS"] == gnss
            and r["algorithm"] == "fused_xla" and r["num_ants"] == 1
            and r["num_correlators"] == 3]
    ns = sorted({r["num_samples"] for r in rows})
    if not ns:
        return
    print(f"\n### {gnss} fused_xla: XLA-CPU host vs TPU (median µs, M=1 L=3)\n")
    print("| processor | " + " | ".join(f"N={n}" for n in ns) + " |")
    print("|---" * (len(ns) + 1) + "|")
    for proc in ("CPU", "TPU"):
        cells = [
            _us(next((r["Median"] for r in rows
                      if r["processor"] == proc and r["num_samples"] == n),
                     float("nan")))
            for n in ns
        ]
        print(f"| {proc} | " + " | ".join(cells) + " |")


if __name__ == "__main__":
    for m, l in ((1, 3), (4, 3), (4, 7)):
        kernel_table("GPSL1", "TPU", m, l)
    kernel_table("GPSL5", "TPU", 4, 7)
    cpu_vs_tpu()
    track_table()
    micro_tables()
