#!/usr/bin/env python
"""Re-measure noise-dominated closed-loop track cells with deeper scans.

Small-K cells (0.03-0.1 ms/block) cannot be resolved by an 8/16-block
differential under ~ms tunnel jitter; re-run them with a 64/128-block
differential (per-trial noise scales as jitter/blocks). Overwrites the cell
JSON in place (filename keeps the sweep key; the JSON records the
re-measured ``blocks``).
"""

import json
import pathlib
import statistics
import sys

sys.path.insert(0, str(pathlib.Path(__file__).parent.parent))

from gpuacceleratedtracking_tpu.bench import run_track_benchmark
from gpuacceleratedtracking_tpu.bench.harness import run_dual_track_benchmark

TDIR = pathlib.Path(__file__).parent.parent / "data" / "benchmarks" / "track"


def iqr(ts):
    ts = sorted(ts)
    if len(ts) < 4:
        return None
    q = statistics.quantiles(ts, n=4)
    return q[2] - q[0]


def main():
    todo = []
    for p in sorted(TDIR.glob("*TrackBenchmark_*.json")):
        d = json.loads(p.read_text())
        if "error" in d or d.get("processor") != "TPU":
            continue
        i = iqr(d.get("times") or [])
        # Noise-dominated: IQR >= median, or a zero/clamped median outright
        # (a 0.0 median means every differential pair clamped to the floor —
        # the worst case, not a healthy one).
        if i is not None and (d["Median"] <= 0 or i >= d["Median"]):
            todo.append((p, d))
    print(f"{len(todo)} noisy track cells")
    for idx, (p, d) in enumerate(todo):
        cfg = {k: d[k] for k in ("GNSS", "num_samples", "num_channels",
                                 "num_ants", "num_correlators", "algorithm",
                                 "processor", "trials") if k in d}
        cfg["blocks"] = 64
        cfg["trials"] = 9
        runner = (run_dual_track_benchmark
                  if p.name.startswith("DualTrack") else run_track_benchmark)
        print(f"[{idx + 1}/{len(todo)}] {p.name}")
        try:
            res = runner(cfg)
        except Exception as e:
            print(f"  FAILED (kept old): {e!r}"[:200])
            continue
        new_i = iqr(res["times"])
        print(f"  old {d['Median'] * 1e3:.3f}ms (IQR {iqr(d['times']) * 1e3:.3f})"
              f" -> new {res['Median'] * 1e3:.3f}ms (IQR {new_i * 1e3:.3f})")
        p.write_text(json.dumps(res, indent=1))


if __name__ == "__main__":
    main()
