"""Native IQ ingest + streaming runtime tests."""

import numpy as np
import jax.numpy as jnp
import pytest

from gpuacceleratedtracking_tpu.models import GPSL1, gen_signal, soa
from gpuacceleratedtracking_tpu.runtime import (
    IQFile,
    IQRing,
    decode,
    native_available,
    track_file,
)
from gpuacceleratedtracking_tpu.tracking import (
    TrackConfig,
    init_state,
    loop_filter,
)


def _write_iq(path, re, im, fmt):
    inter = np.empty(re.size * 2, dtype=np.float32)
    inter[0::2], inter[1::2] = re, im
    if fmt == "int8":
        inter = np.clip(np.round(inter), -127, 127).astype(np.int8)
    elif fmt == "int16":
        inter = np.clip(np.round(inter), -32767, 32767).astype(np.int16)
    else:
        inter = inter.astype(np.float32)
    inter.tofile(path)
    return inter


class TestDecode:
    @pytest.mark.parametrize("fmt", ["int8", "int16", "float32"])
    def test_roundtrip(self, fmt, tmp_path):
        rng = np.random.default_rng(0)
        re = np.round(rng.uniform(-100, 100, 1000)).astype(np.float32)
        im = np.round(rng.uniform(-100, 100, 1000)).astype(np.float32)
        raw = _write_iq(tmp_path / "x.bin", re, im, fmt)
        out_re, out_im = decode(raw.tobytes(), fmt, scale=1.0)
        np.testing.assert_array_equal(out_re, re)
        np.testing.assert_array_equal(out_im, im)

    def test_scale(self):
        raw = np.array([100, -50], dtype=np.int8).tobytes()
        re, im = decode(raw, "int8", scale=1.0 / 128)
        np.testing.assert_allclose(re, [100 / 128])
        np.testing.assert_allclose(im, [-50 / 128])


class TestIQFile:
    def test_block_reads_and_eof(self, tmp_path):
        re = np.arange(2500, dtype=np.float32) % 97 - 48
        im = -re
        path = tmp_path / "cap.bin"
        _write_iq(path, re, im, "int16")
        with IQFile(path, "int16") as f:
            assert f.num_samples == 2500
            r1, i1 = f.read(1000)
            r2, i2 = f.read(1000)
            r3, i3 = f.read(1000)  # short read: only 500 left
        np.testing.assert_array_equal(np.concatenate([r1, r2, r3]), re)
        np.testing.assert_array_equal(np.concatenate([i1, i2, i3]), im)
        assert r3.size == 500

    def test_missing_file(self, tmp_path):
        with pytest.raises(FileNotFoundError):
            IQFile(tmp_path / "nope.bin", "int8")


@pytest.mark.skipif(not native_available(), reason="no native toolchain")
class TestIQRing:
    def test_spsc_blocks(self):
        ring = IQRing(4096)
        assert len(ring) == 0
        assert ring.pop_block(100) is None
        re = np.arange(3000, dtype=np.float32)
        im = re + 0.5
        assert ring.push(re[:2000], im[:2000]) == 2000
        out = ring.pop_block(1500)
        assert out is not None
        np.testing.assert_array_equal(out[0], re[:1500])
        assert ring.push(re[2000:], im[2000:]) == 1000
        out = ring.pop_block(1500)
        np.testing.assert_array_equal(out[0], re[1500:3000])
        assert len(ring) == 0
        ring.close()

    def test_capacity_limit(self):
        ring = IQRing(100)
        re = np.ones(150, np.float32)
        assert ring.push(re, re) == 100
        ring.close()


class TestTrackFile:
    def test_closed_loop_from_capture_file(self, tmp_path):
        # Synthesize a 2-satellite capture, quantize to int8, track from disk.
        system = GPSL1()
        N, num_ms = 2048, 60
        fs = N / 1e-3
        dops = [700.0, -900.0]
        sigs = []
        for prn, d in enumerate(dops):
            scale = 1.0 + d / system.center_frequency
            s, _ = gen_signal(system, prn, d, N * num_ms,
                              duration=num_ms * 1e-3,
                              code_frequency=system.code_frequency * scale)
            sigs.append(s)
        mixed = sigs[0] + sigs[1]
        sre, sim = soa(mixed)
        path = tmp_path / "twosat.bin"
        _write_iq(path, np.asarray(sre) * 40, np.asarray(sim) * 40, "int8")

        config = TrackConfig.for_system(system, fs, N)
        states = init_state(np.array([0, 1]),
                            carrier_doppler=np.asarray(dops))
        result = track_file(config, system.codes, states, path,
                            fmt="int8", scale=1.0 / 40,
                            blocks_per_dispatch=16)
        assert result.blocks_processed == num_ms
        out = result.stacked()
        assert out.prompt_re.shape == (num_ms, 2)
        prompts = np.asarray(out.prompt_re)[-1]
        assert (prompts > 1200).all(), prompts
        dop_end = np.asarray(out.carrier_doppler)[-1]
        np.testing.assert_allclose(dop_end, dops, atol=20.0)


class TestResampler:
    """Native polyphase rational resampler: front-end rates -> kernel rates."""

    def test_tone_frequency_and_amplitude(self):
        from gpuacceleratedtracking_tpu.runtime import Resampler

        fs_in, fs_out, f_tone = 10.0e6, 8.192e6, 1.25e5
        n = 50000
        t = np.arange(n) / fs_in
        x = np.exp(2j * np.pi * f_tone * t)
        rs = Resampler.for_rates(fs_in, fs_out)
        assert (rs.up, rs.down) == (512, 625)
        yr, yi = rs.process(np.real(x), np.imag(x))
        y = (yr + 1j * yi)[2000:-2000]
        phase = np.unwrap(np.angle(y))
        f_est = np.polyfit(np.arange(y.size), phase, 1)[0] / (2 * np.pi) * fs_out
        assert abs(f_est - f_tone) < 1.0
        np.testing.assert_allclose(np.abs(y).mean(), 1.0, atol=1e-3)

    def test_chunking_invariance(self):
        from gpuacceleratedtracking_tpu.runtime import Resampler

        rng = np.random.default_rng(0)
        x_re = rng.standard_normal(30000).astype(np.float32)
        x_im = rng.standard_normal(30000).astype(np.float32)
        one = Resampler(512, 625)
        a_re, a_im = one.process(x_re, x_im)
        chunked = Resampler(512, 625)
        parts = []
        for c in range(0, 30000, 997):
            parts.append(chunked.process(x_re[c:c + 997], x_im[c:c + 997]))
        b_re = np.concatenate([p[0] for p in parts])
        b_im = np.concatenate([p[1] for p in parts])
        np.testing.assert_array_equal(a_re[: b_re.size], b_re)
        np.testing.assert_array_equal(a_im[: b_im.size], b_im)

    def test_alias_rejection(self):
        # A tone above the output Nyquist must be strongly attenuated
        # (Kaiser beta=8 sinc: ~80 dB design stopband).
        from gpuacceleratedtracking_tpu.runtime import Resampler

        # 25 -> 8.192 MS/s so the stopband has room below the INPUT Nyquist
        # (at 10 MS/s in, a 5.5 MHz complex tone wraps to -4.5 MHz). 7 MHz is
        # fully past the Kaiser(8) prototype's ~2 MHz transition band around
        # the 4.096 MHz cutoff (4.9 MHz mid-transition reads only ~-39 dB).
        fs_in, fs_out = 25.0e6, 8.192e6
        f_alias = 7.0e6                      # >> fs_out/2 = 4.096 MHz
        n = 40000
        t = np.arange(n) / fs_in
        x = np.exp(2j * np.pi * f_alias * t)
        rs = Resampler.for_rates(fs_in, fs_out)
        yr, yi = rs.process(np.real(x), np.imag(x))
        y = (yr + 1j * yi)[1000:-1000]
        assert np.abs(y).max() < 0.01, np.abs(y).max()   # < -40 dB residual

    def test_gnss_capture_resampled_correlates(self):
        # End-to-end: a GPS L1 block synthesized at a 10 MHz front-end rate,
        # natively resampled to 8.192 MHz, must correlate like a directly
        # generated 8.192 MHz block (prompt within ~1% of N).
        import functools

        from gpuacceleratedtracking_tpu.models import (
            GPSL1, EPLCorrelator, correlator_sample_shifts, gen_signal, soa,
        )
        from gpuacceleratedtracking_tpu.ops import registry
        from gpuacceleratedtracking_tpu.runtime import Resampler

        system = GPSL1()
        fs_in, fs_out = 10.0e6, 8.192e6
        n_in, n_out = 20000, 8192
        sig, _ = gen_signal(system, 0, 0.0, n_in, duration=n_in / fs_in)
        sre_in, sim_in = soa(sig)
        rs = Resampler.for_rates(fs_in, fs_out)
        yr, yi = rs.process(np.asarray(sre_in), np.asarray(sim_in))
        # The FIR group delay is fractional in output samples; compensate it
        # exactly through the correlator's code_phase instead of slicing:
        # block starts at output sample s0, signal code phase there is
        # (s0/fs_out - delay) * f_code.
        s0 = 256                        # past the zero-history startup
        delay_s = (24 * 512 - 1) / 2 / 512 / fs_in
        phi = ((s0 / fs_out - delay_s) * system.code_frequency) % 1023
        block_re = jnp.asarray(yr[s0:s0 + n_out])
        block_im = jnp.asarray(yi[s0:s0 + n_out])
        shifts = tuple(int(s) for s in correlator_sample_shifts(
            system, EPLCorrelator(3), fs_out))
        corr = functools.partial(
            registry.get("fused_xla"), sample_shifts=shifts,
            code_length=system.code_length)
        are, aim = corr(block_re, block_im, jnp.asarray(system.codes), 0,
                        0.0, fs_out, 0.0, system.code_frequency, phi)
        prompt = float(np.asarray(are)[1])
        # ~2.6% correlation loss is physical: the C/A spectrum's sidelobes
        # above the 4.096 MHz output Nyquist are (correctly) filtered out,
        # where the directly-generated 8.192 MHz block keeps them aliased.
        assert abs(prompt - n_out) < 0.04 * n_out, prompt
