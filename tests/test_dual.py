"""GPS L5 pilot/data dual-component tracking tests.

The dual capability the reference's GPSL5 benchmarks feed
(`/root/reference/scripts/run_benchmarks_gpsl5.jl`; Tracking.jl multi-
component role): pilot-aided carrier tracking must hold lock below the
data-only Costas threshold, and nav symbols must demodulate from the data
component once the loop has pulled in.
"""

import jax
import jax.numpy as jnp
import numpy as np

from gpuacceleratedtracking_tpu.models import GPSL5, gen_signal
from gpuacceleratedtracking_tpu.tracking import (
    TrackConfig,
    dual_config,
    init_state,
    track_bank,
    track_bank_dual,
)


def _dual_signal(num_blocks, num_samples, dop, prn, sigma, seed=5):
    """I5(data x NH10 x nav) + j Q5(pilot x NH20) + AWGN, per-block rows."""
    sys_i, sys_q = GPSL5(), GPSL5(quadrature=True)
    fs = num_samples / 1e-3
    scale = 1 + dop / sys_i.center_frequency
    rng = np.random.default_rng(seed)
    nav = np.repeat(
        rng.choice([-1.0, 1.0], num_blocks // 10), 10
    ).astype(np.float32)
    common = dict(
        duration=num_blocks * 1e-3,
        code_frequency=sys_i.code_frequency * scale,
    )
    sig_i, _ = gen_signal(sys_i, prn, dop, num_samples * num_blocks,
                          secondary_code=sys_i.secondary_code, **common)
    sig_q, _ = gen_signal(sys_q, prn, dop, num_samples * num_blocks,
                          secondary_code=sys_q.secondary_code,
                          start_carrier_phase=np.pi / 2, **common)
    base = (
        np.asarray(sig_i).reshape(num_blocks, num_samples) * nav[:, None]
        + np.asarray(sig_q).reshape(num_blocks, num_samples)
    )
    if sigma:
        base = base + sigma * (
            rng.standard_normal(base.shape)
            + 1j * rng.standard_normal(base.shape)
        ).astype(np.complex64)
    sig = jnp.asarray(base)
    return sys_i, sys_q, fs, jnp.real(sig), jnp.imag(sig), nav


class TestDualComponent:
    def test_pilot_aiding_beats_data_only_at_low_cn0(self):
        # At sigma=60 (~21 dB-Hz per component) the data-only Costas loop
        # loses lock; the pilot-driven dual loop (atan2 + 10 ms coherent)
        # holds, and nav symbols demodulate exactly after pull-in.
        N, B, dop, prn = 16384, 400, 900.0, 3
        sys_i, sys_q, fs, sre, sim, nav = _dual_signal(B, N, dop, prn, 60.0)

        cfg_a = TrackConfig.for_system(sys_i, fs, N, algorithm="xla_bank")
        st = init_state(np.array([prn]), carrier_doppler=np.array([dop + 15.0]))
        _, out_a = track_bank(cfg_a, jnp.asarray(sys_i.codes), st, sre, sim)
        err_a = abs(
            np.mean(np.asarray(out_a.carrier_doppler)[-40:, 0]) - dop
        )

        cfg_b = dual_config(TrackConfig.for_system(
            sys_i, fs, N, algorithm="xla_bank", use_secondary=False,
            coherent_blocks=10, pll_bandwidth=8.0,
        ))
        st = init_state(np.array([prn]), carrier_doppler=np.array([dop + 15.0]))
        _, out_b = track_bank_dual(
            cfg_b, jnp.asarray(sys_i.codes), jnp.asarray(sys_q.codes),
            st, sre, sim,
        )
        err_b = abs(
            np.mean(np.asarray(out_b.pilot.carrier_doppler)[-40:, 0]) - dop
        )
        assert err_b < 3.0, (err_a, err_b)
        assert err_a > 8.0, (err_a, err_b)
        # Nav symbols (100 sps = 10 blocks each): decide each symbol from the
        # sum of its 10 block prompts; after pull-in the symbols recover.
        d = np.asarray(out_b.data_prompt_re)[:, 0].reshape(-1, 10).sum(axis=1)
        sym = np.sign(d)[-15:]
        want = nav.reshape(-1, 10)[:, 0][-15:]
        np.testing.assert_array_equal(sym, want)

    def test_noiseless_symbol_recovery_exact(self):
        N, B, dop, prn = 16384, 150, -400.0, 7
        sys_i, sys_q, fs, sre, sim, nav = _dual_signal(B, N, dop, prn, 0.0)
        cfg = dual_config(TrackConfig.for_system(
            sys_i, fs, N, algorithm="xla_bank", use_secondary=False,
        ))
        st = init_state(np.array([prn]), carrier_doppler=np.array([dop + 10.0]))
        final, out = track_bank_dual(
            cfg, jnp.asarray(sys_i.codes), jnp.asarray(sys_q.codes),
            st, sre, sim,
        )
        dsign = np.sign(np.asarray(out.data_prompt_re)[:, 0])
        np.testing.assert_array_equal(dsign[-50:], nav[-50:])
        # Pilot prompt is strongly positive once rotated onto I.
        assert np.asarray(out.pilot.prompt_re)[-1, 0] > 0.5 * N
