#!/usr/bin/env python
"""Stage ablation of the flagship per-row bank kernel (pallas_bank_rows).

Marginal per-stage cost via kernel variants with stages disabled, timed with
the interleaved differential protocol (within-process A/B — the only
comparison that survives this chip's run-to-run drift; CLAUDE.md). Writes
``data/benchmarks/ablation_rows.json``. NVTX-style stage evidence in the
reference: `/root/reference/scripts/nsys.jl:100-131`.

Stages:
  empty         grid sequencing + block DMA only (per-channel body removed)
  floor         + output accumulation plumbing (replica/carrier/MAC off)
  const_replica replica reconstruction disabled (carrier + MAC live)
  no_carrier    carrier wipe-off disabled (replica + MAC live)
  no_mac        tap MAC disabled (replica + carrier live)
  full          the shipped kernel
"""

import functools
import json
import pathlib
import statistics
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).parent.parent))

import numpy as np
import jax
import jax.numpy as jnp

from gpuacceleratedtracking_tpu.models import (
    GPSL1, EPLCorrelator, correlator_sample_shifts, gen_signal, soa,
)
from gpuacceleratedtracking_tpu.ops import registry

K = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
N = int(sys.argv[2]) if len(sys.argv) > 2 else 32768
REPS, TRIALS = 10, 9

VARIANTS = [
    ("empty", {"ablate": "empty"}),
    ("floor", {"ablate": "floor"}),
    ("const_replica", {"ablate": "const_replica"}),
    ("no_carrier", {"ablate": "no_carrier"}),
    ("no_mac", {"ablate": "no_mac"}),
    ("full", {}),
]


def main():
    system = GPSL1()
    fs = N / 1e-3
    signal, _ = gen_signal(system, 0, 1500.0, N)
    sre, sim = soa(signal)
    codes = jnp.asarray(system.codes)
    shifts = tuple(int(s) for s in correlator_sample_shifts(
        system, EPLCorrelator(3), fs))
    prns = jnp.arange(K, dtype=jnp.int32) % codes.shape[1]
    dops = jnp.linspace(-4000.0, 4000.0, K).astype(jnp.float32)
    zeros = jnp.zeros(K, jnp.float32)

    def make(kw, r):
        corr = functools.partial(
            registry.get("pallas_bank_rows"), sample_shifts=shifts,
            code_length=system.code_length, sampling_frequency=fs,
            nominal_code_frequency=system.code_frequency, **kw,
        )

        @jax.jit
        def run(offs):
            tot = jnp.float32(0.0)
            for i in range(r):
                are, aim = corr(
                    sre, sim, codes, prns, 1500.0 + dops,
                    carrier_phase=zeros + offs[i],
                    code_frequency=zeros + system.code_frequency,
                    code_phase=zeros,
                )
                tot = tot + are.sum() + aim.sum()
            return tot

        return run, (jnp.linspace(0.0, 0.1, r).astype(jnp.float32),)

    fns = {}
    for name, kw in VARIANTS:
        f1, a1 = make(kw, REPS)
        f2, a2 = make(kw, 2 * REPS)
        np.asarray(f1(*a1)); np.asarray(f2(*a2))
        fns[name] = (f1, a1, f2, a2)
        print(f"compiled {name}", flush=True)
    results = {name: [] for name in fns}
    for _ in range(TRIALS):
        for name, (f1, a1, f2, a2) in fns.items():
            t0 = time.perf_counter(); np.asarray(f1(*a1))
            ta = time.perf_counter() - t0
            t0 = time.perf_counter(); np.asarray(f2(*a2))
            tb = time.perf_counter() - t0
            results[name].append(max(tb - ta, 0.0) / REPS)
    med = {name: statistics.median(d) for name, d in results.items()}
    full = med["full"]
    payload = {
        "num_channels": K, "num_samples": N, "device":
        jax.devices()[0].device_kind, "median_ms_per_block":
        {k: round(v * 1e3, 4) for k, v in med.items()},
        "marginal_ms": {
            "grid_dma_floor": round(med["empty"] * 1e3, 4),
            "replica_reconstruct": round((full - med["const_replica"]) * 1e3, 4),
            "carrier_wipeoff": round((full - med["no_carrier"]) * 1e3, 4),
            "tap_mac": round((full - med["no_mac"]) * 1e3, 4),
        },
        "raw_s": results,
    }
    out = pathlib.Path(__file__).parent.parent / "data" / "benchmarks"
    out.mkdir(parents=True, exist_ok=True)
    (out / "ablation_rows.json").write_text(json.dumps(payload, indent=1))
    print(json.dumps(payload["marginal_ms"]))


if __name__ == "__main__":
    main()
