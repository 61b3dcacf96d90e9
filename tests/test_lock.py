"""Phase-lock detection and data-bit synchronization tests.

Role: Tracking.jl's lock detectors + `SecondaryCodeOrBitDetector` (the
reference's `TrackingState` construction path,
`/root/reference/src/benchmarks.jl:54`) — here bank-vectorized device math.
"""

import numpy as np
import jax
import jax.numpy as jnp

from gpuacceleratedtracking_tpu.models import GPSL1, gen_signal, soa
from gpuacceleratedtracking_tpu.tracking import (
    TrackConfig,
    detect_bit_boundary,
    init_state,
    phase_lock_metric,
    track_bank,
)


def _bits(num_blocks, bit_length, offset, rng):
    """+/-1 per block with bit edges where (b + offset) % bit_length == 0."""
    first = bit_length - offset if offset else bit_length
    n_bits = 2 + num_blocks // bit_length
    bits = rng.choice([-1.0, 1.0], n_bits)
    reps = [min(first, num_blocks)] + [bit_length] * (n_bits - 1)
    seq = np.concatenate([np.full(r, b) for b, r in zip(bits, reps)])
    return seq[:num_blocks]


class TestPhaseLock:
    def test_locked_vs_unlocked(self):
        rng = np.random.default_rng(0)
        b = 200
        bits = _bits(b, 20, 7, rng)
        # locked channel: prompts on I with BPSK signs + noise
        locked_re = 1000.0 * bits + 50.0 * rng.standard_normal(b)
        locked_im = 50.0 * rng.standard_normal(b)
        # unlocked channel: uniformly spinning phase
        theta = np.cumsum(rng.uniform(0.5, 1.5, b))
        spin_re = 1000.0 * np.cos(theta)
        spin_im = 1000.0 * np.sin(theta)
        m = np.asarray(phase_lock_metric(
            jnp.asarray(np.stack([locked_re, spin_re], 1)),
            jnp.asarray(np.stack([locked_im, spin_im], 1)),
        ))
        assert m.shape == (10, 2)
        assert (m[:, 0] > 0.9).all(), m[:, 0]
        assert (np.abs(m[:, 1]) < 0.6).all(), m[:, 1]

    def test_bit_flips_do_not_break_lock_metric(self):
        rng = np.random.default_rng(1)
        bits = _bits(100, 20, 3, rng)
        m = np.asarray(phase_lock_metric(
            jnp.asarray(500.0 * bits), jnp.asarray(np.zeros(100))
        ))
        np.testing.assert_allclose(m, 1.0)


class TestBitSync:
    def test_recovers_planted_offsets(self):
        rng = np.random.default_rng(2)
        b = 600
        offsets = [0, 7, 19]
        prompts = np.stack(
            [1000.0 * _bits(b, 20, o, rng)
             + 30.0 * rng.standard_normal(b) for o in offsets],
            axis=1,
        )
        off, conf = detect_bit_boundary(jnp.asarray(prompts))
        np.testing.assert_array_equal(np.asarray(off), offsets)
        assert (np.asarray(conf) > 0.9).all(), conf

    def test_no_bit_structure_low_confidence(self):
        rng = np.random.default_rng(3)
        prompts = rng.choice([-1.0, 1.0], 600) * 1000.0
        _, conf = detect_bit_boundary(jnp.asarray(prompts))
        assert float(conf) < 0.2

    def test_end_to_end_on_tracked_bank(self):
        # Plant a 20 ms data-bit stream on a GPS L1 signal, track it, then
        # recover both lock state and the bit boundary from the loop outputs.
        system = GPSL1()
        n, blocks = 2048, 700
        fs = n / 1e-3
        rng = np.random.default_rng(4)
        bit_offset = 11
        bits = _bits(blocks, 20, bit_offset, rng)
        sig, _ = gen_signal(
            system, 0, 500.0, n * blocks, duration=blocks * 1e-3,
            secondary_code=bits,   # one sign per 1 ms period = the bit stream
        )
        sre, sim = soa(sig)
        cfg = TrackConfig.for_system(system, fs, n, use_secondary=False)
        st = init_state(np.array([0]), carrier_doppler=np.array([520.0]))
        _, out = track_bank(
            cfg, jnp.asarray(system.codes), st,
            sre.reshape(blocks, n), sim.reshape(blocks, n),
        )
        settle = 300   # ~full PLL pull-in (CLAUDE.md: ~700 ms from 212 Hz)
        p_re = np.asarray(out.prompt_re)[settle:, 0]
        p_im = np.asarray(out.prompt_im)[settle:, 0]
        m = np.asarray(phase_lock_metric(jnp.asarray(p_re), jnp.asarray(p_im)))
        # The settled loop keeps a slow small phase wobble (~25 deg peak)
        # with data present: every window stays clearly lock-positive and
        # the average is high; prompt SIGNS (what bit sync needs) are clean.
        assert (m[5:] > 0.5).all() and m[5:].mean() > 0.8, m
        off, conf = detect_bit_boundary(jnp.asarray(p_re))
        assert int(off) == (bit_offset + settle) % 20, (off, conf)
        assert float(conf) > 0.85
