#!/usr/bin/env python
"""xprof trace of the correlation pipeline — `/root/reference/scripts/nsys.jl` analog.

Where the reference wraps kernel launches in NVTX ranges under
`CUDA.@profile` (`/root/reference/scripts/nsys.jl:100-131`), the TPU path uses
`jax.profiler.trace` + `jax.profiler.TraceAnnotation`; the output directory is
loadable in XProf/TensorBoard.
"""

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).parent.parent))

import functools

import jax
import jax.numpy as jnp

from gpuacceleratedtracking_tpu.models import (
    GPSL1,
    EPLCorrelator,
    correlator_sample_shifts,
    gen_signal,
    soa,
)
from gpuacceleratedtracking_tpu.ops import registry

ALGO = sys.argv[1] if len(sys.argv) > 1 else "pallas_fused"
N = int(sys.argv[2]) if len(sys.argv) > 2 else 32768

if __name__ == "__main__":
    out = pathlib.Path(__file__).parent.parent / "data" / "profile"
    out.mkdir(parents=True, exist_ok=True)
    system = GPSL1()
    fs = N / 1e-3
    signal, _ = gen_signal(system, 0, 1500.0, N)
    sre, sim = soa(signal)
    shifts = tuple(
        int(s) for s in correlator_sample_shifts(system, EPLCorrelator(3), fs)
    )
    fn = jax.jit(
        functools.partial(
            registry.get(ALGO),
            sample_shifts=shifts,
            code_length=system.code_length,
        )
    )
    args = (sre, sim, jnp.asarray(system.codes), 0, 1500.0, fs, 0.0,
            system.code_frequency, 0.0)
    jax.block_until_ready(fn(*args))  # compile outside the trace
    with jax.profiler.trace(str(out)):
        with jax.profiler.TraceAnnotation(f"correlate_{ALGO}"):
            for _ in range(10):
                jax.block_until_ready(fn(*args))
    print(f"trace written to {out}")
