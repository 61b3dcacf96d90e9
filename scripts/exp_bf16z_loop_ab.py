#!/usr/bin/env python
"""On-chip closed-loop A/B: exact rows-f32 vs tracking-grade comp-bf16z.

The bf16-z composite mode is the one measured flagship win
(data/benchmarks/comp_ab.json: 1.730 vs 1.818 ms open-loop, same process).
Before routing it as a tracking-grade `TrackConfig(z_dtype="bf16")` mode, this
validates it where it matters: a CLOSED loop on the real chip, same initial
states and same signal, ≥500 blocks (convergence from a ~200 Hz Doppler
offset takes ~700 ms — CLAUDE.md), comparing

- pull-in: both modes converge to the true Doppler / code phase,
- trajectory parity: per-block |Δdoppler|, |Δcode_phase| between modes,
- C/N0: the estimator must be unbiased under bf16-z rounding,
- per-block time: interleaved differential A/B (closed loop, same process).

Output: data/benchmarks/bf16z_loop_ab.json. Exits 0 either way — a failing
parity is a committed negative result.

Protocol/role: the closed-loop analog of `scripts/exp_comp_ab.py`; reference
accuracy bar is the paper's SNR-bound discussion
(`/root/reference/paper/paper.tex:322-331`).
"""

import json
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).parent.parent))

import numpy as np
import jax
import jax.numpy as jnp

from gpuacceleratedtracking_tpu.models import GPSL1, gen_signal
from gpuacceleratedtracking_tpu.bench.autotune import best_launch
from gpuacceleratedtracking_tpu.tracking import (
    TrackConfig,
    init_state,
    track_bank,
)

K = 1024
N = 32768
NUM_PRNS = 8          # distinct satellites actually present in the front end
BLOCKS = 800          # > pull-in (~700 ms) + converged tail
DOP_ERR_HZ = 212.0    # initial Doppler error (CLAUDE.md convergence case)
SIGMA = 4.0           # AWGN per component (~35 dB-Hz at 32.768 MHz)
TAIL = 200            # converged-tail blocks for error stats
AB_BLOCKS = 8
AB_TRIALS = 9


def main():
    system = GPSL1()
    fs = N / 1e-3

    # Front end: NUM_PRNS satellites, distinct true Dopplers, scaled code
    # rates (coherent carrier/code dynamics), plus AWGN. Everything stays
    # device-resident — materializing 210 MB of signal through the tunnel
    # would dominate the experiment.
    true_dops = np.linspace(-3000.0, 3000.0, NUM_PRNS)
    total = N * BLOCKS
    mixed = None
    for prn, d in enumerate(true_dops):
        scale = 1.0 + d / system.center_frequency
        s, _ = gen_signal(
            system, prn, float(d), total, duration=BLOCKS * 1e-3,
            code_frequency=system.code_frequency * scale,
        )
        mixed = s if mixed is None else mixed + s
    key_re, key_im = jax.random.split(jax.random.key(0))
    sre = (jnp.real(mixed)
           + SIGMA * jax.random.normal(key_re, (total,), jnp.float32)
           ).reshape(BLOCKS, N)
    sim = (jnp.imag(mixed)
           + SIGMA * jax.random.normal(key_im, (total,), jnp.float32)
           ).reshape(BLOCKS, N)

    prns = np.arange(K) % NUM_PRNS
    states = init_state(
        prns, carrier_doppler=true_dops[prns] + DOP_ERR_HZ
    )
    codes = jnp.asarray(system.codes)

    configs = {}
    for mode in ("f32", "bf16"):
        launch = best_launch("pallas_bank_auto", K, N, 1, 3, "GPSL1")
        configs[mode] = TrackConfig.for_system(
            system, fs, N, algorithm="pallas_bank_auto", z_dtype=mode,
            **launch,
        )

    # --- Trajectories (full 800-block closed loop per mode) ---
    traj = {}
    for mode, cfg in configs.items():
        t0 = time.perf_counter()
        final, out = track_bank(cfg, codes, states, sre, sim)
        dop = np.asarray(out.carrier_doppler)      # [B, K]
        cph = np.asarray(out.code_phase)
        cn0 = np.asarray(out.cn0_dbhz)
        wall = time.perf_counter() - t0
        traj[mode] = dict(dop=dop, cph=cph, cn0=cn0, wall=wall)
        print(f"{mode}: {BLOCKS} blocks closed-loop in {wall:.2f}s wall")

    f32, bf16 = traj["f32"], traj["bf16"]
    true_per_chan = true_dops[prns]
    res = {
        "config": {
            "K": K, "N": N, "num_prns": NUM_PRNS, "blocks": BLOCKS,
            "dop_err_hz": DOP_ERR_HZ, "sigma": SIGMA, "tail_blocks": TAIL,
            "launch": best_launch("pallas_bank_auto", K, N, 1, 3, "GPSL1"),
        },
    }
    for mode in ("f32", "bf16"):
        tail_err = np.abs(traj[mode]["dop"][-TAIL:] - true_per_chan[None, :])
        res[f"{mode}_tail_dop_err_hz_median"] = float(np.median(tail_err))
        res[f"{mode}_tail_dop_err_hz_p95"] = float(
            np.percentile(tail_err, 95)
        )
        res[f"{mode}_tail_cn0_dbhz_mean"] = float(
            np.mean(traj[mode]["cn0"][-TAIL:])
        )
    d_dop = np.abs(bf16["dop"][-TAIL:] - f32["dop"][-TAIL:])
    d_cph = np.abs(bf16["cph"][-TAIL:] - f32["cph"][-TAIL:])
    d_cph = np.minimum(d_cph, system.code_length - d_cph)  # wraparound
    res["tail_mode_delta_dop_hz_median"] = float(np.median(d_dop))
    res["tail_mode_delta_dop_hz_p95"] = float(np.percentile(d_dop, 95))
    res["tail_mode_delta_code_chips_median"] = float(np.median(d_cph))
    res["tail_mode_delta_code_chips_p95"] = float(np.percentile(d_cph, 95))
    res["tail_mode_delta_cn0_db_mean"] = float(
        np.mean(bf16["cn0"][-TAIL:] - f32["cn0"][-TAIL:])
    )

    # Verdict: both converge; inter-mode deltas inside tracking noise.
    converged = (
        res["f32_tail_dop_err_hz_median"] < 5.0
        and res["bf16_tail_dop_err_hz_median"] < 5.0
    )
    parity = (
        res["tail_mode_delta_dop_hz_p95"] < 2.0
        and res["tail_mode_delta_code_chips_p95"] < 1e-2
        and abs(res["tail_mode_delta_cn0_db_mean"]) < 0.5
    )
    res["converged"] = bool(converged)
    res["tracking_grade"] = bool(converged and parity)

    # --- Interleaved closed-loop per-block time A/B (same process) ---
    samples = {m: [] for m in configs}
    fns = {}
    for mode, cfg in configs.items():
        def make(b, cfg=cfg):
            sr, si = sre[:b], sim[:b]

            def run():
                f, o = track_bank(cfg, codes, states, sr, si)
                return o.prompt_re.sum()

            return run

        fa, fb = make(AB_BLOCKS), make(2 * AB_BLOCKS)
        np.asarray(fa()), np.asarray(fb())      # warm both jits
        fns[mode] = (fa, fb)
    for _ in range(AB_TRIALS):
        for mode, (fa, fb) in fns.items():
            t0 = time.perf_counter(); np.asarray(fa()); ta = time.perf_counter() - t0
            t0 = time.perf_counter(); np.asarray(fb()); tb = time.perf_counter() - t0
            d = (tb - ta) / AB_BLOCKS
            if d > 0:
                samples[mode].append(d)
    for mode, ss in samples.items():
        res[f"{mode}_block_time_s_median"] = float(np.median(ss)) if ss else None
        res[f"{mode}_block_time_samples"] = ss

    out_path = (
        pathlib.Path(__file__).parent.parent
        / "data" / "benchmarks" / "bf16z_loop_ab.json"
    )
    out_path.write_text(json.dumps(res, indent=1))
    print(json.dumps({k: v for k, v in res.items()
                      if not k.endswith("samples")}, indent=1))


if __name__ == "__main__":
    main()
