#!/usr/bin/env python
"""Interleaved in-process A/B: rows kernel vs composite kernel at M=1.

Round 2 built the composite bank kernel (`_bank_comp_kernel`) to replace the
rows kernel's per-channel ``[A, T] x [L, T]`` tap MAC (the measured 1.69 ms
marginal stage) with ONE wide MXU contraction per channel group — but only
routed multi-antenna banks to it. This experiment asks whether comp also wins
the single-antenna flagship (K=1024, N=32768 GPS L1): the per-channel VPU
work drops from ~6 tap-product planes + 2 full reduce trees to 2 composite
planes + a z-scratch relayout, while antennas/taps/IQ ride MXU output lanes.

Interleaved paired-unroll differential trials (CLAUDE.md protocol). Writes
data/benchmarks/comp_ab.json; exits 0 always.

Usage: exp_comp_ab.py [K] [N] [tile_rows] [chans_per_step]
"""

import functools
import json
import pathlib
import statistics
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from gpuacceleratedtracking_tpu.models import (
    GPSL1, EPLCorrelator, correlator_sample_shifts, gen_signal, soa,
)
from gpuacceleratedtracking_tpu.ops import pallas_epl

K = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
N = int(sys.argv[2]) if len(sys.argv) > 2 else 32768
TILE = int(sys.argv[3]) if len(sys.argv) > 3 else 256
CPS = int(sys.argv[4]) if len(sys.argv) > 4 else 16
REPS, TRIALS = (4, 12), 9
VARIANTS = {
    "rows": (pallas_epl.correlate_pallas_bank_rows, {}),
    "comp": (pallas_epl.correlate_pallas_bank_comp, {}),
    # [TR, 128]-layout z scratch: contraction reshapes [2G, TR, 128] ->
    # [2G, T] instead of per-channel relayout-at-store.
    "comp_stack": (pallas_epl.correlate_pallas_bank_comp,
                   {"contract": "stack"}),
    # bf16 z halves the composite store + S stream (accuracy: bf16 product
    # planes, ~1e-3 relative — tracking-grade, not golden-grade).
    "comp_bf16z": (pallas_epl.correlate_pallas_bank_comp,
                   {"z_dtype": jnp.bfloat16,
                    "mac_precision": jax.lax.Precision.DEFAULT}),
}


def main():
    system = GPSL1()
    fs = N / 1e-3
    shifts = tuple(
        int(s) for s in correlator_sample_shifts(system, EPLCorrelator(3), fs)
    )
    sig, _ = gen_signal(system, 0, 1500.0, N)
    sre, sim = soa(sig)
    codes = jnp.asarray(system.codes)
    rng = np.random.default_rng(3)
    prns = jnp.arange(K, dtype=jnp.int32) % codes.shape[1]
    fcar = jnp.asarray(1500.0 + rng.uniform(-4000, 4000, K), jnp.float32)
    fcode = jnp.full((K,), system.code_frequency, jnp.float32)
    zeros = jnp.zeros(K, jnp.float32)

    def build(fn, extra):
        kw = dict(
            sample_shifts=shifts, code_length=system.code_length,
            sampling_frequency=fs,
            nominal_code_frequency=system.code_frequency,
            nominal_carrier_frequency=0.0,
            tile_rows=TILE, chans_per_step=CPS,
        )
        kw.update(extra)
        corr = functools.partial(fn, **kw)

        def make(r):
            @jax.jit
            def run(offs):
                tot = jnp.float32(0.0)
                for i in range(r):
                    are, aim = corr(
                        sre, sim, codes, prns, fcar,
                        carrier_phase=zeros + offs[i],
                        code_frequency=fcode, code_phase=zeros,
                    )
                    tot = tot + are.sum() + aim.sum()
                return tot

            return run, (jnp.linspace(0.0, 0.1, r).astype(jnp.float32),)

        fa, aa = make(REPS[0])
        fb, ab = make(REPS[1])
        np.asarray(fa(*aa)); np.asarray(fb(*ab))
        return (fa, aa, fb, ab)

    built, failed = {}, {}
    for v, (fn, extra) in VARIANTS.items():
        try:
            built[v] = build(fn, extra)
        except Exception as e:  # Mosaic compile rejection etc. — keep going
            failed[v] = repr(e)[:200]
            print(f"{v}: build FAILED: {failed[v]}")

    # Numerical parity check before timing (same inputs, both kernels).
    # Skip if either variant failed to build — the timing loop below already
    # tolerates partial builds and this script must exit 0 regardless.
    rel = None
    if "rows" in built and "comp" in built:
        ref = VARIANTS["rows"][0](
            sre, sim, codes, prns, fcar, carrier_phase=zeros,
            code_frequency=fcode, code_phase=zeros,
            sample_shifts=shifts, code_length=system.code_length,
            sampling_frequency=fs,
            nominal_code_frequency=system.code_frequency,
            nominal_carrier_frequency=0.0, tile_rows=TILE,
            chans_per_step=CPS,
        )
        got = VARIANTS["comp"][0](
            sre, sim, codes, prns, fcar, carrier_phase=zeros,
            code_frequency=fcode, code_phase=zeros,
            sample_shifts=shifts, code_length=system.code_length,
            sampling_frequency=fs,
            nominal_code_frequency=system.code_frequency,
            nominal_carrier_frequency=0.0, tile_rows=TILE,
            chans_per_step=CPS,
        )
        rel = max(
            float(jnp.max(jnp.abs(g - r)) / jnp.max(jnp.abs(r)))
            for g, r in zip(got, ref)
        )
        print(f"comp vs rows parity: max rel diff {rel:.2e}")

    samples = {v: [] for v in built}
    for _ in range(TRIALS):
        for v in built:
            fa, aa, fb, ab = built[v]
            t0 = time.perf_counter(); np.asarray(fa(*aa)); t1 = time.perf_counter() - t0
            t0 = time.perf_counter(); np.asarray(fb(*ab)); t2 = time.perf_counter() - t0
            d = (t2 - t1) / (REPS[1] - REPS[0])
            if d > 0:
                samples[v].append(d)

    out = {"config": {"K": K, "N": N, "tile_rows": TILE,
                      "chans_per_step": CPS, "trials": TRIALS,
                      "parity_max_rel": rel},
           "failed": failed}
    for v in built:
        s = sorted(samples[v])
        med = s[len(s) // 2] if s else None
        out[v] = {"median_s": med, "samples": samples[v]}
        print(f"{v}: median {med*1e3 if med else float('nan'):.3f} ms/block "
              f"({len(s)} positive samples)")
    path = pathlib.Path(__file__).parent.parent / "data" / "benchmarks"
    with open(path / "comp_ab.json", "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
