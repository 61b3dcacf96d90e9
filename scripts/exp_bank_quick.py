"""Scratch: quick bank-kernel timing (differential, interleaved trials)."""

import functools
import time

import numpy as np
import jax
import jax.numpy as jnp

from gpuacceleratedtracking_tpu.models import (
    GPSL1, EPLCorrelator, correlator_sample_shifts, gen_signal, soa,
)
from gpuacceleratedtracking_tpu.ops import registry

K, N = 1024, 32768
REPS1, REPS2 = 4, 12

system = GPSL1()
fs = N / 1e-3
signal, _ = gen_signal(system, 0, 1500.0, N)
sre, sim = soa(signal)
codes = jnp.asarray(system.codes)
shifts = tuple(int(s) for s in correlator_sample_shifts(system, EPLCorrelator(3), fs))
prns = jnp.arange(K, dtype=jnp.int32) % codes.shape[1]
dops = jnp.linspace(-4000.0, 4000.0, K).astype(jnp.float32)
code_freqs = jnp.full((K,), system.code_frequency, jnp.float32)
zeros = jnp.zeros(K, jnp.float32)
print("devices:", jax.devices())

golden_sig, _ = gen_signal(system, 0, 1500.0, 2500)
gre, gim = soa(golden_sig)


def build(tap_mac):
    corr = functools.partial(
        registry.get("pallas_bank"), sample_shifts=shifts,
        code_length=system.code_length, sampling_frequency=fs,
        tile_rows=256, nominal_code_frequency=system.code_frequency,
        tap_mac=tap_mac,
    )

    def make(r):
        @jax.jit
        def run(offs):
            tot = jnp.float32(0.0)
            for i in range(r):
                are, aim = corr(
                    sre, sim, codes, prns, 1500.0 + dops,
                    carrier_phase=zeros + offs[i],
                    code_frequency=code_freqs, code_phase=zeros,
                )
                tot = tot + are.sum() + aim.sum()
            return tot
        return run, (jnp.linspace(0.0, 0.1, r).astype(jnp.float32),)

    f1, a1 = make(REPS1)
    f2, a2 = make(REPS2)
    np.asarray(f1(*a1)); np.asarray(f2(*a2))
    return f1, a1, f2, a2


# Golden check on hardware first (MXU tap-MAC correctness).
gshifts = tuple(int(s) for s in correlator_sample_shifts(
    system, EPLCorrelator(3), 2.5e6))
gcorr = jax.jit(functools.partial(
    registry.get("pallas_bank"), sample_shifts=gshifts,
    code_length=system.code_length, sampling_frequency=2.5e6,
    nominal_code_frequency=system.code_frequency))
g_re, _ = gcorr(gre, gim, codes, jnp.zeros(2, jnp.int32), jnp.full(2, 1500.0),
                carrier_phase=jnp.zeros(2),
                code_frequency=jnp.full(2, system.code_frequency),
                code_phase=jnp.zeros(2))
print("golden:", np.asarray(g_re)[0], "(want [1476, 2500, 1476])")
assert np.allclose(np.asarray(g_re)[0], [1476, 2500, 1476], atol=1.0)

built = {v: build(v) for v in ("mxu", "vpu")}
res = {v: [] for v in built}
for _ in range(10):
    for v, (f1, a1, f2, a2) in built.items():
        t0 = time.perf_counter(); np.asarray(f1(*a1)); t1 = time.perf_counter() - t0
        t0 = time.perf_counter(); np.asarray(f2(*a2)); t2 = time.perf_counter() - t0
        res[v].append(max(t2 - t1, 0.0) / (REPS2 - REPS1))
for v, ts in res.items():
    ts = np.array(ts) * 1e3
    print(f"tap_mac={v}: min {ts.min():6.3f} med {np.median(ts):6.3f} ms/block "
          f"({K*N/np.median(ts)/1e6:6.1f} Gs/s med)  all {np.round(ts, 2)}")
