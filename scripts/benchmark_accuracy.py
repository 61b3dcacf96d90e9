#!/usr/bin/env python
"""Accumulator accuracy vs a float64 oracle, across the sweep envelope.

Makes BASELINE.json's "accumulator SNR delta vs the CPU reference" a measured
number: for each (GNSS, N) cell of the kernel-benchmark envelope and each
algorithm x dtype-mode, correlate a noisy multi-satellite front end and report
the accumulator error against an independently-written float64 oracle —
max/mean relative error and accumulator SNR (dB). The accuracy analog of
data/benchmarks/replica_accuracy.json; reference bar: the paper's SNR-bound
discussion (`/root/reference/paper/paper.tex:322-331`).

Modes:
- f32 exact paths: `fused_xla`, `pallas_fused`, `pallas_bank_rows`,
  `pallas_bank_comp` (f32 z). The Pallas banks' internal bf16 matmuls touch
  only small-integer operands (codes +/-1, masks 0/1) and stay bit-exact.
- `pallas_bank` (transition): default bf16-matmul config AND an f32-matmul
  control — demonstrating the small-integer exactness claim on real data.
- `pallas_bank_comp` z_dtype=bf16 (tracking-grade): the one mode that
  rounds ACCUMULATOR streams to bf16; this table bounds what that costs.

Run on the TPU for the committed dataset (real MXU rounding); CPU interpret
mode reproduces the same numerics for tests. Output:
data/benchmarks/accumulator_accuracy.json.
"""

import functools
import json
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).parent.parent))

import numpy as np
import jax
import jax.numpy as jnp

from gpuacceleratedtracking_tpu.models import (
    GPSL1,
    GPSL5,
    EPLCorrelator,
    correlator_sample_shifts,
    gen_signal,
)
from gpuacceleratedtracking_tpu.ops import pallas_epl, registry

K = 8           # channels per cell (error stats over K x L accumulators)
SIGMA = 2.0     # AWGN per component (signal amplitude 1 per satellite)
ENVELOPE = {
    "GPSL1": [2 ** e for e in range(11, 19)],
    "GPSL5": [2 ** e for e in range(15, 19)],
}


def numpy_oracle(system, prn, carrier_freq, fs, carrier_phase, code_freq,
                 code_phase, num_samples, shifts, sig):
    """Float64 reference correlator (independent of the JAX ops)."""
    n = np.arange(num_samples, dtype=np.float64)
    carrier = np.exp(
        1j * (2 * np.pi * carrier_freq / fs * n + carrier_phase)
    )
    dw = sig.astype(np.complex128) * np.conj(carrier)
    out = []
    for d in shifts:
        idx = np.mod(
            np.floor(code_freq / fs * (n + d) + code_phase).astype(np.int64),
            system.code_length,
        )
        rep = system.codes[idx, prn].astype(np.float64)
        out.append(np.sum(dw * rep))
    return np.array(out)


def cell(system, gnss, num_samples):
    fs = num_samples / 1e-3
    rng = np.random.default_rng(num_samples)
    num_prns = system.codes.shape[1]
    prns = (np.arange(K) * 3) % num_prns
    dops = rng.uniform(-4000.0, 4000.0, K)
    phis_car = rng.uniform(0, 2 * np.pi, K)
    phis_code = rng.uniform(0, system.code_length, K)
    fcode = system.code_frequency * (1.0 + dops / system.center_frequency)

    # Front end: all K satellites superposed + AWGN, host f64 for the oracle.
    # Synthesis runs PINNED to the host CPU device: the axon TPU plugin
    # cannot host-transfer complex64 arrays (UNIMPLEMENTED), and the oracle
    # needs host data anyway — only the f32 planes go to the chip.
    cpu = jax.local_devices(backend="cpu")[0]
    mixed = None
    with jax.default_device(cpu):
        for i in range(K):
            s, _ = gen_signal(
                system, int(prns[i]), float(dops[i]), num_samples,
                start_carrier_phase=float(phis_car[i]),
                start_code_phase=float(phis_code[i]),
                code_frequency=float(fcode[i]),
            )
            s = np.asarray(s)
            mixed = s if mixed is None else mixed + s
    mixed = mixed.astype(np.complex128) + SIGMA * (
        rng.standard_normal(num_samples)
        + 1j * rng.standard_normal(num_samples)
    )
    sig32 = mixed.astype(np.complex64)
    sre = jnp.asarray(sig32.real)
    sim = jnp.asarray(sig32.imag)
    codes = jnp.asarray(system.codes)
    shifts = tuple(int(x) for x in correlator_sample_shifts(
        system, EPLCorrelator(3), fs))

    # Oracle on the SAME f32-quantized signal: isolates kernel arithmetic
    # error from front-end quantization.
    oracle = np.stack([
        numpy_oracle(system, int(prns[i]), float(dops[i]), fs,
                     float(phis_car[i]), float(fcode[i]),
                     float(phis_code[i]), num_samples, shifts,
                     sig32.astype(np.complex128))
        for i in range(K)
    ])                                            # [K, L] complex

    chips_per_sample = system.code_frequency / fs * 1.001
    prn_a = jnp.asarray(prns, jnp.int32)
    f_car = jnp.asarray(dops, jnp.float32)
    ph_car = jnp.asarray(phis_car, jnp.float32)        # radians
    f_code = jnp.asarray(fcode, jnp.float32)
    ph_code = jnp.asarray(phis_code, jnp.float32)      # chips

    def per_chan(fn, use_vmap):
        # Jitted calls (eager dispatch is unusable over the tunnel). vmap
        # only for pure-XLA paths: vmap of a pallas_call re-lowers the kernel
        # per batch element (CLAUDE.md) — those take a scalar-arg jit called
        # K times (one compile, traced scalars).
        one = jax.jit(
            lambda p, fc, pc, fcd, pcd: fn(
                sre, sim, codes, p, fc, fs, pc, fcd, pcd, shifts,
                system.code_length,
            )
        )
        if use_vmap:
            are, aim = jax.jit(jax.vmap(one))(
                prn_a, f_car, ph_car, f_code, ph_code
            )
        else:
            outs = [
                one(prn_a[i], f_car[i], ph_car[i], f_code[i], ph_code[i])
                for i in range(K)
            ]
            are = jnp.stack([o[0] for o in outs])
            aim = jnp.stack([o[1] for o in outs])
        return np.asarray(are) + 1j * np.asarray(aim)

    def bank(fn, **kw):
        jfn = jax.jit(functools.partial(
            fn,
            sampling_frequency=fs, sample_shifts=shifts,
            code_length=system.code_length,
            nominal_code_frequency=system.code_frequency,
            nominal_carrier_frequency=0.0, **kw,
        ))
        are, aim = jfn(
            sre, sim, codes, prn_a, f_car, carrier_phase=ph_car,
            code_frequency=f_code, code_phase=ph_code,
        )
        return np.asarray(are) + 1j * np.asarray(aim)

    variants = {
        "fused_xla": lambda: per_chan(registry.get("fused_xla"), True),
        "pallas_fused": lambda: per_chan(registry.get("pallas_fused"), False),
    }
    span = int(max(shifts)) - int(min(shifts))
    if span < 128:
        # The transition kernel keeps its span < 128 contract; static
        # routing (bank_algorithm_for) never sends wide-span scenarios here
        # (the rows/comp kernels carry them since round 5), so its variants
        # are simply out of envelope, not errors.
        variants["pallas_bank_bf16mm"] = lambda: bank(
            pallas_epl.correlate_pallas_bank
        )
        variants["pallas_bank_f32mm"] = lambda: bank(
            pallas_epl.correlate_pallas_bank, matmul_dtype=jnp.float32
        )
    if chips_per_sample < 0.17:
        variants["pallas_bank_rows"] = lambda: bank(
            pallas_epl.correlate_pallas_bank_rows
        )
        variants["pallas_bank_comp_f32z"] = lambda: bank(
            pallas_epl.correlate_pallas_bank_comp, chans_per_step=2
        )
        variants["pallas_bank_comp_bf16z"] = lambda: bank(
            pallas_epl.correlate_pallas_bank_comp, chans_per_step=2,
            z_dtype=jnp.bfloat16, mac_precision=jax.lax.Precision.DEFAULT,
        )

    scale = np.abs(oracle).max()
    rms_sig = np.sqrt(np.mean(np.abs(oracle) ** 2))
    rows = {}
    got_by_name = {}
    for name, fn in variants.items():
        try:
            got = fn()
        except Exception as e:
            rows[name] = {"error": repr(e)[:200]}
            continue
        got_by_name[name] = got
        err = np.abs(got - oracle)
        rms_err = np.sqrt(np.mean(err ** 2))
        rows[name] = {
            "max_rel": float(err.max() / scale),
            "mean_rel": float(err.mean() / scale),
            "snr_db": float(
                20 * np.log10(rms_sig / rms_err) if rms_err > 0 else np.inf
            ),
        }
    # max_rel vs the oracle is dominated by rare f32 chip-boundary flips
    # (one sample lands on the other side of a floor() than in f64 — an
    # envelope shared by ALL f32 paths). The dtype-mode cost proper is the
    # delta vs the same-formulation f32 kernel:
    for bf16_name, f32_name in [
        ("pallas_bank_comp_bf16z", "pallas_bank_comp_f32z"),
        ("pallas_bank_bf16mm", "pallas_bank_f32mm"),
    ]:
        if bf16_name in got_by_name and f32_name in got_by_name:
            d = np.abs(got_by_name[bf16_name] - got_by_name[f32_name])
            rows[bf16_name]["max_rel_vs_f32"] = float(d.max() / scale)
            rows[bf16_name]["mean_rel_vs_f32"] = float(d.mean() / scale)
    return rows


def main():
    out = {"config": {"K": K, "sigma": SIGMA, "num_correlators": 3,
                      "backend": jax.default_backend()},
           "cells": []}
    for gnss, ns in ENVELOPE.items():
        system = GPSL1() if gnss == "GPSL1" else GPSL5()
        for n in ns:
            rows = cell(system, gnss, n)
            out["cells"].append(
                {"GNSS": gnss, "num_samples": n, "algorithms": rows}
            )
            worst = {k: v.get("max_rel") for k, v in rows.items()}
            print(gnss, n, json.dumps(worst))
    path = (pathlib.Path(__file__).parent.parent
            / "data" / "benchmarks" / "accumulator_accuracy.json")
    path.write_text(json.dumps(out, indent=1))
    print("wrote", path)


if __name__ == "__main__":
    main()
