#!/usr/bin/env python
"""Open-loop kernel vs closed-loop track: interleaved in-process A/B.

Quantifies the loop-closure cost (discriminators + filters + NCO advance +
output stacking) at the flagship scenario by timing, in ONE process with
interleaved paired trials, (a) the bare bank correlation scanned over B
blocks and (b) the full `track_bank` closed loop over the same blocks —
both differential over scan depth (B vs 2B) so fixed dispatch cancels.
Chip throughput drifts run-to-run (RESULTS.md "Environment caveats"), so
only this interleaved form supports a claim like "loop closure costs X ms".

Writes data/benchmarks/loop_overhead.json. Role analog: the reference times
only open-loop kernels (`/root/reference/src/benchmarks.jl:35-80`); its
`run_track_benchmark` is a dead export (`src/GPUAcceleratedTracking.jl:102`).
"""

import json
import pathlib
import statistics
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).parent.parent))

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from gpuacceleratedtracking_tpu.bench.autotune import best_launch
from gpuacceleratedtracking_tpu.bench.timing import _sync
from gpuacceleratedtracking_tpu.models import GPSL1, gen_signal, soa
from gpuacceleratedtracking_tpu.ops import registry
from gpuacceleratedtracking_tpu.tracking import TrackConfig, init_state, track_bank
from gpuacceleratedtracking_tpu.tracking.track import (
    _bank_code_tile_kwargs,
    _bank_kernel_kwargs,
)

K = 1024
N = 32768
B = 8
TRIALS = 9
ALGO = "pallas_bank_auto"


def main():
    system = GPSL1()
    fs = N / 1e-3
    launch = best_launch(ALGO, K, N)
    cfg = TrackConfig.for_system(system, fs, N, algorithm=ALGO, **launch)
    codes = jnp.asarray(system.codes)
    prns = np.arange(K) % system.codes.shape[1]
    rng = np.random.default_rng(7)
    states = init_state(
        prns,
        carrier_doppler=rng.uniform(-4000, 4000, K).astype(np.float32),
        code_phase=rng.uniform(0, system.code_length, K).astype(np.float32),
    )
    signal, _ = gen_signal(system, 0, 1500.0, N)
    sre1, sim1 = soa(signal)

    corr = registry.get(ALGO)
    kwargs = _bank_kernel_kwargs(cfg)
    kwargs.update(_bank_code_tile_kwargs(cfg, codes, states.prn))
    f_car = cfg.intermediate_frequency + states.carrier_doppler
    f_code = cfg.code_frequency + states.code_doppler

    def blocks(b):
        return (jnp.tile(sre1[None], (b, 1)), jnp.tile(sim1[None], (b, 1)))

    def make_open(b):
        @jax.jit
        def fn(sre_b, sim_b, st):
            def body(acc, sig):
                sre, sim = sig
                are, aim = corr(
                    sre, sim, codes, st.prn, f_car,
                    carrier_phase=st.carrier_phase, code_frequency=f_code,
                    code_phase=st.code_phase,
                    sample_shifts=cfg.sample_shifts,
                    code_length=cfg.code_length, **kwargs,
                )
                return acc + are.sum() + aim.sum(), None

            out, _ = lax.scan(body, jnp.float32(0), (sre_b, sim_b))
            return out

        return fn, (*blocks(b), states)

    def make_closed(b):
        @jax.jit
        def fn(sre_b, sim_b, st):
            st2, out = track_bank(cfg, codes, st, sre_b, sim_b)
            return st2.carrier_doppler.sum() + out.prompt_re.sum()

        return fn, (*blocks(b), states)

    fo_a, ao_a = make_open(B)
    fo_b, ao_b = make_open(2 * B)
    fc_a, ac_a = make_closed(B)
    fc_b, ac_b = make_closed(2 * B)
    for f, a in ((fo_a, ao_a), (fo_b, ao_b), (fc_a, ac_a), (fc_b, ac_b)):
        _sync(f(*a))

    open_d, closed_d = [], []
    for _ in range(TRIALS):
        pair = []
        for f, a in ((fo_a, ao_a), (fo_b, ao_b), (fc_a, ac_a), (fc_b, ac_b)):
            t0 = time.perf_counter()
            _sync(f(*a))
            pair.append(time.perf_counter() - t0)
        open_d.append(max(pair[1] - pair[0], 0.0) / B)
        closed_d.append(max(pair[3] - pair[2], 0.0) / B)

    med_o = statistics.median(open_d)
    med_c = statistics.median(closed_d)
    out = {
        "config": {"K": K, "N": N, "blocks": B, "trials": TRIALS,
                   "algorithm": ALGO, "launch": launch},
        "open_loop_s": {"median": med_o, "min": min(open_d), "times": open_d},
        "closed_loop_s": {"median": med_c, "min": min(closed_d),
                          "times": closed_d},
        "loop_closure_overhead_s": med_c - med_o,
        "device": str(jax.devices()[0]),
    }
    path = pathlib.Path(__file__).parent.parent / "data" / "benchmarks"
    path.mkdir(parents=True, exist_ok=True)
    with open(path / "loop_overhead.json", "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({"open_ms": med_o * 1e3, "closed_ms": med_c * 1e3,
                      "overhead_ms": (med_c - med_o) * 1e3}))


if __name__ == "__main__":
    main()
