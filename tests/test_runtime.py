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
