"""Secondary (overlay) code tests: generation, wipe-off, sync detection.

The reference's external Tracking.jl provides bit/secondary-code handling for
its CPU baseline; here the capability is native: `gen_signal(secondary_code=)`
modulates the overlay, `TrackConfig.secondary_code` wipes it off inside the
scan loop, and `tracking.secondary.detect_secondary_offset` finds the overlay
phase from tracked prompts.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from gpuacceleratedtracking_tpu.models import GPSL1, GPSL5, gen_signal, soa
from gpuacceleratedtracking_tpu.models.gpsl5 import NH10_BITS, NH20_BITS
from gpuacceleratedtracking_tpu.tracking import (
    TrackConfig,
    detect_secondary_offset,
    detect_secondary_offset_windowed,
    init_state,
    track_bank,
)

NH10 = 1.0 - 2.0 * NH10_BITS.astype(np.float32)
NH20 = 1.0 - 2.0 * NH20_BITS.astype(np.float32)


class TestDetector:
    def test_recovers_offset(self):
        B = 30
        offset = 7
        prompts = 100.0 * NH20[(np.arange(B) + offset) % 20]
        got, conf = detect_secondary_offset(jnp.asarray(prompts), NH20)
        assert int(got) == offset
        assert float(conf) > 0.999

    def test_sign_ambiguity_and_noise(self):
        # A data-bit sign flip and mild noise must not break detection.
        rng = np.random.default_rng(0)
        B = 40
        offset = 13
        prompts = -80.0 * NH20[(np.arange(B) + offset) % 20]
        prompts = prompts + rng.normal(0, 8.0, B)
        got, conf = detect_secondary_offset(jnp.asarray(prompts), NH20)
        assert int(got) == offset
        assert float(conf) > 0.9

    def test_batched_channels(self):
        B = 25
        offsets = np.array([0, 4, 9])
        prompts = 50.0 * NH10[(np.arange(B)[:, None] + offsets[None, :]) % 10]
        got, conf = detect_secondary_offset(jnp.asarray(prompts), NH10)
        np.testing.assert_array_equal(np.asarray(got), offsets)
        assert np.all(np.asarray(conf) > 0.999)

    def test_windowed_data_robust(self):
        # BeiDou B1I D1 structure: overlay = NH20 x one nav bit per cycle,
        # bit edges ON the cycle boundaries — dense random bit flips, no
        # pilot. The whole-window detector decorrelates on windows that
        # straddle a bit edge; the windowed detector must recover the true
        # offset per channel with confidence ~1 anyway.
        rng = np.random.default_rng(3)
        B = 60
        offsets = np.array([5, 12, 19])
        b = np.arange(B)[:, None]
        bits = rng.choice([-1.0, 1.0], (B // 20 + 2, len(offsets)))
        nav = np.take_along_axis(
            bits, (b + offsets[None, :]) // 20, axis=0)
        prompts = 90.0 * NH20[(b + offsets[None, :]) % 20] * nav
        prompts = prompts + rng.normal(0, 9.0, prompts.shape)
        got, conf = detect_secondary_offset_windowed(
            jnp.asarray(prompts), NH20)
        np.testing.assert_array_equal(np.asarray(got), offsets)
        assert np.all(np.asarray(conf) > 0.9), np.asarray(conf)

    def test_windowed_needs_enough_blocks(self):
        with pytest.raises(ValueError):
            detect_secondary_offset_windowed(jnp.ones(30), NH20)


class TestOverlayTracking:
    def _run(self, secondary_cfg, ms0=0, phase0=3, fll_bandwidth=4.0):
        system = GPSL1()
        N = 2048
        fs = N / 1e-3
        B = 40
        sig, _ = gen_signal(
            system, 0, 1000.0, N * B, duration=B * 1e-3,
            secondary_code=NH10, secondary_phase=phase0,
        )
        sre, sim = soa(sig)
        sre, sim = sre.reshape(B, N), sim.reshape(B, N)
        config = TrackConfig.for_system(
            system, fs, N, algorithm="xla_bank",
            secondary_code=secondary_cfg, fll_bandwidth=fll_bandwidth,
        )
        states = init_state(
            np.zeros(1, np.int64), carrier_doppler=np.full(1, 1000.0),
            ms_elapsed=ms0,
        )
        _, out = track_bank(config, jnp.asarray(system.codes), states, sre, sim)
        return np.asarray(out.prompt_re)[:, 0]

    def test_without_wipeoff_prompts_follow_overlay(self):
        # FLL assist off: un-wiped 180-degree flips read as frequency error
        # and would (correctly) drag an FLL-assisted loop off — a pure Costas
        # loop is sign-blind, so the prompts cleanly carry the overlay.
        prompts = self._run(secondary_cfg=(), phase0=3, fll_bandwidth=0.0)
        signs = np.sign(prompts)
        expected = NH10[(np.arange(len(prompts)) + 3) % 10]
        np.testing.assert_array_equal(signs, expected)
        # ...and the detector recovers the planted offset from those prompts.
        got, conf = detect_secondary_offset(jnp.asarray(prompts), NH10)
        assert int(got) == 3
        assert float(conf) > 0.999

    def test_with_wipeoff_prompts_positive(self):
        prompts = self._run(
            secondary_cfg=tuple(float(s) for s in NH10), ms0=3, phase0=3
        )
        assert np.all(prompts > 0.9 * 2048)


class TestAutoFill:
    def test_l5_config_gets_nh(self):
        system = GPSL5()
        fs = 16368000.0
        config = TrackConfig.for_system(system, fs, 16368)
        np.testing.assert_array_equal(config.secondary_code, NH10)

    def test_opt_out_and_mismatched_block(self):
        system = GPSL5()
        fs = 16368000.0
        assert TrackConfig.for_system(
            system, fs, 16368, use_secondary=False
        ).secondary_code == ()
        # 2 ms blocks span two overlay bits -> no auto-fill.
        assert TrackConfig.for_system(
            system, fs, 32736
        ).secondary_code == ()

    def test_l1_has_none(self):
        system = GPSL1()
        assert TrackConfig.for_system(system, 2.5e6, 2500).secondary_code == ()
