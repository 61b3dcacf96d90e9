#!/usr/bin/env python
"""Quantized-NCO replica accuracy experiment —
`/root/reference/scripts/code_replica_experiment.jl` analog.

The reference measures the relative code-phase error the texture unit's 8.8
fixed-point interpolation grid introduces versus the exact floor/mod replica
(result: min 0 %, mean 0.03 %, median 0.02 %, max 3.17 %,
`/root/reference/paper/paper.tex:326-329`). Here the same envelope is measured
for the fixed-point-NCO replica (`ops.gen_code_replica_quantized`, 8 fractional
bits) over the same N sweep, reporting the fraction of chips that differ and
the relative code-phase quantization error.
"""

import json
import pathlib
import sys

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).parent.parent))

import jax

# Accuracy experiment, not a perf run: the CPU backend avoids one tunneled TPU
# compile per sweep point (the sweep has ~64 distinct shapes).
jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp

from gpuacceleratedtracking_tpu.models import GPSL1
from gpuacceleratedtracking_tpu.ops import (
    gen_code_replica,
    gen_code_replica_quantized,
)


def run(start=2048, stop=262144, step=4096, phase_bits=8):
    system = GPSL1()
    codes = jnp.asarray(system.codes)
    rows = []
    for n in range(start, stop + 1, step):
        fs = n / 1e-3
        exact = np.asarray(
            gen_code_replica(
                codes, 0, system.code_frequency, fs, 0.25, n, 0, 0,
                system.code_length,
            )
        )
        quant = np.asarray(
            gen_code_replica_quantized(
                codes, 0, system.code_frequency, fs, 0.25, n, 0, 0,
                system.code_length, phase_bits=phase_bits,
            )
        )
        mismatch = float(np.mean(exact != quant))
        # Relative code-phase error of the quantization grid: one LSB of the
        # fractional phase vs the chips-per-sample step (the reference's
        # error metric normalizes by code phase per sample).
        rel_err = 2.0**-phase_bits / (system.code_frequency / fs)
        rows.append(
            {
                "num_samples": n,
                "chip_mismatch_frac": mismatch,
                "relative_phase_error": rel_err,
            }
        )
    return rows


if __name__ == "__main__":
    rows = run()
    mm = np.array([r["chip_mismatch_frac"] for r in rows])
    print(
        json.dumps(
            {
                "min_pct": float(mm.min() * 100),
                "mean_pct": float(mm.mean() * 100),
                "median_pct": float(np.median(mm) * 100),
                "max_pct": float(mm.max() * 100),
                "reference_envelope_pct": {"mean": 0.03, "max": 3.17},
            },
            indent=1,
        )
    )
    out = pathlib.Path(__file__).parent.parent / "data" / "code_replica_experiment.json"
    out.parent.mkdir(parents=True, exist_ok=True)
    out.write_text(json.dumps(rows, indent=1))
