"""Same-process A/B: hoisted-phasor carrier x one-hot-matmul reconstruction.

Differential protocol (paired unroll depths) on the 1024-channel GPS L1 bank;
variants interleaved each round so chip drift hits all arms equally.
"""

import functools
import itertools
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


def build(carrier, recon):
    corr = functools.partial(
        registry.get("pallas_bank"), sample_shifts=shifts,
        code_length=system.code_length, sampling_frequency=fs,
        tile_rows=256, nominal_code_frequency=system.code_frequency,
        carrier=carrier, recon=recon,
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


VARIANTS = [("inkernel", "mask"), ("inkernel", "onehot"),
            ("hoisted", "mask"), ("hoisted", "onehot")]
built = {}
for v in VARIANTS:
    t0 = time.perf_counter()
    built[v] = build(*v)
    print(f"built {v} in {time.perf_counter()-t0:.1f}s", flush=True)

vals = {v: float(np.asarray(b[0](*b[1]))) for v, b in built.items()}
print("checksums:", vals)
base = vals[("inkernel", "mask")]
for v, x in vals.items():
    assert abs(x - base) < 1e-2 * max(abs(base), 1.0), (v, x, base)

res = {v: [] for v in built}
for _ in range(6):
    for v, (f1, a1, f2, a2) in built.items():
        t0 = time.perf_counter(); np.asarray(f1(*a1)); t1 = time.perf_counter() - t0
        t0 = time.perf_counter(); np.asarray(f2(*a2)); t2 = time.perf_counter() - t0
        res[v].append(max(t2 - t1, 0.0) / (REPS2 - REPS1))
for v, ts in res.items():
    ts = np.array(ts) * 1e3
    print(f"{v[0]:9s}/{v[1]:7s}: min {ts.min():6.3f} ms  med {np.median(ts):6.3f} ms  all {np.round(ts, 2)}")
