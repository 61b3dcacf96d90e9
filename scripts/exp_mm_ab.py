"""Scratch: same-process f32 vs bf16 matmul A/B for the transition bank kernel."""

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


def build(dtype):
    corr = functools.partial(
        registry.get("pallas_bank"), sample_shifts=shifts,
        code_length=system.code_length, sampling_frequency=fs,
        tile_rows=256, nominal_code_frequency=system.code_frequency,
        matmul_dtype=dtype,
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


built = {d: build(dt) for d, dt in (("f32", jnp.float32), ("bf16", jnp.bfloat16))}
# Exactness check: f32 and bf16 variants must agree bit-for-bit.
v32 = np.asarray(built["f32"][0](*built["f32"][1]))
v16 = np.asarray(built["bf16"][0](*built["bf16"][1]))
print("exactness: f32", v32, "bf16", v16, "equal:", v32 == v16)

res = {d: [] for d in built}
for _ in range(6):
    for d, (f1, a1, f2, a2) in built.items():
        t0 = time.perf_counter(); np.asarray(f1(*a1)); t1 = time.perf_counter() - t0
        t0 = time.perf_counter(); np.asarray(f2(*a2)); t2 = time.perf_counter() - t0
        res[d].append(max(t2 - t1, 0.0) / (REPS2 - REPS1))
for d, ts in res.items():
    ts = np.array(ts) * 1e3
    print(f"{d:4s}: min {ts.min():6.3f} ms  med {np.median(ts):6.3f} ms  all {np.round(ts, 2)}")
