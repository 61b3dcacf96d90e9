"""Interactive TPU experiment helpers — import into a persistent python -i.

Usage (persistent session, pays the tunnel warmup once):

    PYTHONPATH=/root/repo:/root/.axon_site python -i scripts/tpu_session.py
    >>> s = flagship()           # K=1024 GPS L1 bank @ 32.768 MHz scenario
    >>> golden_check()
    >>> ab(s, [("pallas_bank", {}), ("pallas_bank_rows", {})])

`ab` runs an interleaved differential A/B: per trial, each variant's
per-block time is (t(2r) - t(r)) / r (cancels fixed tunneled-dispatch cost),
variants measured back-to-back within the same process so chip drift hits all
equally. Medians are the comparable numbers (CLAUDE.md "TPU access").
"""

import functools
import statistics
import time

import numpy as np
import jax
import jax.numpy as jnp

from gpuacceleratedtracking_tpu.models import (
    GPSL1,
    GPSL5,
    EPLCorrelator,
    correlator_sample_shifts,
    gen_signal,
    soa,
)
from gpuacceleratedtracking_tpu.ops import registry


def flagship(num_channels=1024, num_samples=32768, gnss="GPSL1", num_ants=1,
             num_taps=3):
    system = GPSL1() if gnss == "GPSL1" else GPSL5()
    fs = num_samples / 1e-3
    ants_kw = {} if num_ants == 1 else {"num_ants": num_ants}
    signal, _ = gen_signal(system, 0, 1500.0, num_samples, **ants_kw)
    sre, sim = soa(signal)
    shifts = tuple(int(x) for x in correlator_sample_shifts(
        system, EPLCorrelator(num_taps), fs))
    k = num_channels
    return dict(
        system=system, fs=fs, sre=sre, sim=sim, shifts=shifts,
        codes=jnp.asarray(system.codes),
        prns=jnp.arange(k, dtype=jnp.int32) % system.codes.shape[1],
        dops=jnp.linspace(-4000.0, 4000.0, k).astype(jnp.float32),
        code_freqs=jnp.full((k,), system.code_frequency, jnp.float32),
        zeros=jnp.zeros(k, jnp.float32),
        num_channels=k, num_samples=num_samples,
    )


def bank_call(s, algo, **kw):
    kwargs = dict(
        sample_shifts=s["shifts"], code_length=s["system"].code_length,
        sampling_frequency=s["fs"],
    )
    if algo in ("pallas_bank", "pallas_bank_rows"):
        kwargs["nominal_code_frequency"] = s["system"].code_frequency
    kwargs.update(kw)
    corr = functools.partial(registry.get(algo), **kwargs)

    def call(off):
        return corr(
            s["sre"], s["sim"], s["codes"], s["prns"], 1500.0 + s["dops"],
            carrier_phase=s["zeros"] + off, code_frequency=s["code_freqs"],
            code_phase=s["zeros"],
        )

    return call


def make_unrolled(call, r):
    @jax.jit
    def run(offs):
        tot = jnp.float32(0.0)
        for i in range(r):
            are, aim = call(offs[i])
            tot = tot + are.sum() + aim.sum()
        return tot
    return run, (jnp.linspace(0.0, 0.1, r).astype(jnp.float32),)


def ab(s, variants, reps=5, trials=7, verbose=True):
    """Interleaved differential A/B. variants: [(algo, kwargs), ...] or
    [(label, algo, kwargs), ...]. Returns {label: median_seconds_per_block}."""
    fns = {}
    for v in variants:
        label, algo, kw = v if len(v) == 3 else (f"{v[0]}{v[1] or ''}", *v)
        f1, a1 = make_unrolled(bank_call(s, algo, **kw), reps)
        f2, a2 = make_unrolled(bank_call(s, algo, **kw), 2 * reps)
        t0 = time.perf_counter()
        np.asarray(f1(*a1)); np.asarray(f2(*a2))
        if verbose:
            print(f"compiled {label} in {time.perf_counter()-t0:.1f}s",
                  flush=True)
        fns[label] = (f1, a1, f2, a2)
    results = {label: [] for label in fns}
    for t in range(trials):
        for label, (f1, a1, f2, a2) in fns.items():
            t0 = time.perf_counter(); np.asarray(f1(*a1))
            ta = time.perf_counter() - t0
            t0 = time.perf_counter(); np.asarray(f2(*a2))
            tb = time.perf_counter() - t0
            results[label].append(max(tb - ta, 0.0) / reps)
    out = {}
    for label, ds in results.items():
        out[label] = statistics.median(ds)
        if verbose:
            print(f"{label:40s} median {out[label]*1e3:8.3f} ms/block  "
                  f"min {min(ds)*1e3:8.3f}", flush=True)
    return out


def golden_check():
    """Golden EPL through fused_xla and both bank kernels at 32.768 MHz."""
    system = GPSL1()
    # classic golden at 2.5 MHz
    signal, fs = gen_signal(system, 0, 1500.0, 2500)
    sre, sim = soa(signal)
    shifts = tuple(int(x) for x in correlator_sample_shifts(
        system, EPLCorrelator(3), fs))
    are, aim = jax.jit(functools.partial(
        registry.get("fused_xla"), sample_shifts=shifts,
        code_length=system.code_length,
    ))(sre, sim, jnp.asarray(system.codes), 0, 1500.0, fs, 0.0,
       system.code_frequency, 0.0)
    print("fused_xla golden:", np.asarray(are), "(want [1476 2500 1476])")
    # flagship-rate golden + bank parity
    s = flagship(num_channels=4)
    s["dops"] = jnp.zeros(4, jnp.float32)   # golden needs exact carrier match
    for algo in ("pallas_bank", "pallas_bank_rows"):
        call = bank_call(s, algo)
        are, aim = jax.jit(call)(0.0)
        got = np.asarray(are)
        print(f"{algo} prompts:", got[..., 1].ravel(),
              f"(want {s['num_samples']})")
    # parity on random phases
    rng = np.random.default_rng(0)
    k = s["num_channels"]
    cph = jnp.asarray(rng.uniform(0, 2 * np.pi, k), jnp.float32)
    cp = jnp.asarray(rng.uniform(0, 1023, k), jnp.float32)
    outs = {}
    for algo in ("pallas_bank", "pallas_bank_rows"):
        corr = functools.partial(
            registry.get(algo), sample_shifts=s["shifts"],
            code_length=s["system"].code_length, sampling_frequency=s["fs"],
            nominal_code_frequency=s["system"].code_frequency,
        )
        outs[algo] = jax.jit(corr)(
            s["sre"], s["sim"], s["codes"], s["prns"], 1500.0 + s["dops"],
            carrier_phase=cph, code_frequency=s["code_freqs"], code_phase=cp,
        )
    d = max(
        np.abs(np.asarray(outs["pallas_bank"][i])
               - np.asarray(outs["pallas_bank_rows"][i])).max()
        for i in (0, 1)
    )
    print("bank vs rows max abs diff (random phases):", d)


if __name__ == "__main__":
    print("devices:", jax.devices())
