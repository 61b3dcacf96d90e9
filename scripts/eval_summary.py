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


def _iqr(row):
    """Interquartile range of the raw trial times (seconds), or None."""
    ts = sorted(row.get("times") or [])
    if len(ts) < 4:
        return None
    import statistics

    q = statistics.quantiles(ts, n=4)
    return q[2] - q[0]


def _cell_us(row):
    """'median±iqr' in µs; trailing '*' flags noise-dominated cells
    (IQR >= median — the dispersion rule, `paper/paper.tex:147-150`)."""
    if row is None:
        return "—"
    med = row["Median"]
    iqr = _iqr(row)
    if iqr is None:
        return _us(med)
    flag = "\\*" if iqr >= med and med > 0 else ""
    return f"{_us(med)}±{_us(iqr)}{flag}"


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
          f"(median±IQR µs per 1 ms block; \\* = IQR ≥ median, "
          "noise-dominated)\n")
    print("| algorithm | " + " | ".join(f"N={n}" for n in ns) + " |")
    print("|---" * (len(ns) + 1) + "|")
    for a in algos:
        cells = []
        for n in ns:
            m = [r for r in rows
                 if r["algorithm"] == a and r["num_samples"] == n]
            cells.append(_cell_us(m[0] if m else None))
        print(f"| `{a}` | " + " | ".join(cells) + " |")


def track_table():
    # K-sweep rows only; mixed-constellation rows (no num_channels axis)
    # and dual-component rows (bank_channels) print in their own tables.
    rows = [r for r in _load("track")
            if "num_channels" in r and "bank_channels" not in r]
    if not rows:
        return
    print("\n### Closed-loop track sweep (median ms/block; rt chans)\n")
    print("| GNSS | algorithm | fs MHz | K | M | L | ms/block | rt chans |")
    print("|---|---|---|---|---|---|---|---|")
    for r in sorted(rows, key=lambda r: (r.get("GNSS", ""), r["algorithm"],
                                         -r["num_samples"],
                                         r.get("num_ants", 1),
                                         r.get("num_correlators", 3),
                                         -r["num_channels"])):
        iqr = _iqr(r)
        ms = f"{r['Median']*1e3:.2f}"
        if iqr is not None:
            ms += f"±{iqr*1e3:.2f}"
            if r['Median'] > 0 and iqr >= r['Median']:
                ms += "\\*"
        print(f"| {r.get('GNSS', '—')} | `{r['algorithm']}` "
              f"| {r['num_samples']/1e3:.3f} "
              f"| {r['num_channels']} | {r.get('num_ants', 1)} "
              f"| {r.get('num_correlators', 3)} | {ms} "
              f"| {min(r['realtime_channels'], r['num_channels']*1000):.0f} |")


def dual_track_table():
    rows = [r for r in _load("track") if r.get("bank_channels")
            and r.get("GNSS") == "GPSL5"]
    if not rows:
        return
    print("\n### GPS L5 dual-component closed loop "
          "(K dual channels = 2K bank channels, NH wipe-off + pilot atan2; "
          "median±IQR ms/block)\n")
    print("| fs MHz | K dual | bank chans | ms/block | rt dual chans |")
    print("|---|---|---|---|---|")
    for r in sorted(rows, key=lambda r: r["num_channels"]):
        iqr = _iqr(r)
        ms = f"{r['Median']*1e3:.2f}"
        if iqr is not None:
            ms += f"±{iqr*1e3:.2f}"
            if r['Median'] > 0 and iqr >= r['Median']:
                ms += "\\*"
        print(f"| {r['num_samples']/1e3:.3f} | {r['num_channels']} "
              f"| {r['bank_channels']} | {ms} "
              f"| {min(r['realtime_channels'], r['num_channels']*1000):.0f} |")


def mixed_track_table():
    rows = [r for r in _load("track") if r.get("GNSS") == "GPSL1+GPSL5"]
    if not rows:
        return
    print("\n### Mixed L1+L5 closed loop on ONE chip "
          "(both banks every block; median±IQR ms/block)\n")
    print("| L1 chans | L5 dual | L5 fs MHz | total | ms/block | rt ratio "
          "| chips for real time (linear est.) |")
    print("|---|---|---|---|---|---|---|")
    for r in sorted(rows, key=lambda r: (r["l1_channels"],
                                         r.get("l5_num_samples", 0))):
        iqr = _iqr(r)
        ms = f"{r['Median']*1e3:.2f}"
        if iqr is not None:
            ms += f"±{iqr*1e3:.2f}"
            if r['Median'] > 0 and iqr >= r['Median']:
                ms += "\\*"
        total = r["l1_channels"] + r["l5_dual_channels"]
        n5 = r.get("l5_num_samples", r["num_samples"])
        print(f"| {r['l1_channels']} | {r['l5_dual_channels']} "
              f"| {n5/1e3:.3f} | {total} "
              f"| {ms} | {r['realtime_ratio']:.2f} "
              f"| {r.get('chips_for_realtime_linear_est', r.get('chips_for_realtime'))} |")


def multignss_table():
    rows = [r for r in _load("track") if r.get("GNSS") == "MULTIGNSS5"]
    if not rows:
        return
    print("\n### Five-constellation closed loop on ONE chip "
          "(all banks every block; median±IQR ms/block)\n")
    print("| L1 | GLO | E1-C | B1I | L5 dual | total | ms/block | rt ratio "
          "| chips for real time (linear est.) |")
    print("|---|---|---|---|---|---|---|---|---|")
    for r in sorted(rows, key=lambda r: r["total_channels"]):
        iqr = _iqr(r)
        ms = f"{r['Median']*1e3:.2f}"
        if iqr is not None:
            ms += f"±{iqr*1e3:.2f}"
            if r['Median'] > 0 and iqr >= r['Median']:
                ms += "\\*"
        c = r["channels"]
        print(f"| {c['GPSL1']} | {c['GLONASSL1']} | {c['GALILEOE1C']} "
              f"| {c['BEIDOUB1I']} | {c['GPSL5_dual']} "
              f"| {r['total_channels']} | {ms} | {r['realtime_ratio']:.2f} "
              f"| {r['chips_for_realtime_linear_est']} |")


def accuracy_table():
    path = ROOT / "accumulator_accuracy.json"
    if not path.exists():
        return
    d = json.loads(path.read_text())
    cells = d["cells"]
    algos = []
    for c in cells:
        for a in c["algorithms"]:
            if a not in algos:
                algos.append(a)
    print("\n### Accumulator SNR vs float64 oracle (dB; noisy "
          f"multi-satellite front end, K={d['config']['K']}, "
          f"backend={d['config'].get('backend')})\n")
    header = [f"{c['GNSS'][3:]} N={c['num_samples']}" for c in cells]
    print("| algorithm | " + " | ".join(header) + " |")
    print("|---" * (len(cells) + 1) + "|")
    for a in algos:
        row = []
        for c in cells:
            e = c["algorithms"].get(a)
            row.append(f"{e['snr_db']:.0f}" if e and "snr_db" in e else "—")
        print(f"| `{a}` | " + " | ".join(row) + " |")
    # dtype-mode cost proper (vs same-formulation f32):
    extras = []
    for c in cells:
        for a, e in c["algorithms"].items():
            if "max_rel_vs_f32" in e:
                extras.append((c["GNSS"], c["num_samples"], a,
                               e["max_rel_vs_f32"]))
    if extras:
        worst = max(x[3] for x in extras)
        print(f"\nDtype-mode cost vs same-formulation f32 (max rel over all "
              f"cells): {worst:.1e}")


def acquire_table():
    rows = _load("acquire") if (ROOT / "acquire").exists() else []
    if not rows:
        return
    print("\n### PCPS acquisition (CPU = host jnp.fft engine; TPU = on-chip "
          "four-step matmul DFT, `acquire/dftmm.py`; median±IQR ms per full "
          "acquisition call)\n")
    print("| proc | GNSS | N | K PRNs | rounds | Doppler bins | ms/call "
          "| ms/PRN·round |")
    print("|---|---|---|---|---|---|---|---|")
    for r in sorted(rows, key=lambda r: (r.get("processor", "CPU"),
                                         r["GNSS"], r["num_samples"],
                                         r["num_prns"], r["rounds"])):
        iqr = _iqr(r)
        ms = f"{r['Median']*1e3:.2f}"
        if iqr is not None:
            ms += f"±{iqr*1e3:.2f}"
            if r['Median'] > 0 and iqr >= r['Median']:
                ms += "\\*"
        per = r["Median"] * 1e3 / (r["num_prns"] * r["rounds"])
        print(f"| {r.get('processor', 'CPU')} | {r['GNSS']} "
              f"| {r['num_samples']} | {r['num_prns']} "
              f"| {r['rounds']} | {r['num_bins']} | {ms} "
              f"| {per:.3f} |")


def session_spread_table():
    path = ROOT / "session_spread.json"
    if not path.exists():
        return
    sessions = json.loads(path.read_text())
    if not sessions:
        return
    cells = {}
    for s_ in sessions:
        for name, c in s_["cells"].items():
            cells.setdefault(name, []).append(c["median_s"])
    print("\n### Cross-session dispersion of the chip-count headline cells "
          f"({len(sessions)} sessions; per-session medians, ms/block — "
          "chip counts quoted from the WORST session)\n")
    print("| cell | sessions (ms) | min | median | max |")
    print("|---|---|---|---|---|")
    import statistics

    for name, meds in cells.items():
        ms = [m * 1e3 for m in meds]
        print(f"| {name} | " + ", ".join(f"{m:.2f}" for m in ms)
              + f" | {min(ms):.2f} | {statistics.median(ms):.2f} "
              f"| {max(ms):.2f} |")


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
    dual_track_table()
    mixed_track_table()
    multignss_table()
    accuracy_table()
    acquire_table()
    session_spread_table()
    micro_tables()
