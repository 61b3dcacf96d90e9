"""Code-generator tests: IS-GPS-200/705 structural properties.

The reference gets code tables from GNSSSignals.jl and never tests them; we
generate them from the LFSR definitions and verify against published constants.
"""

import numpy as np

from gpuacceleratedtracking_tpu.models import gpsl1, gpsl5


class TestGPSL1:
    def test_first_chips_octal_published_values(self):
        # IS-GPS-200 Table 3-Ia "First 10 chips" (octal).
        expected = {1: 1440, 2: 1620, 3: 1710, 4: 1744, 5: 1133, 6: 1455,
                    7: 1131, 8: 1454, 9: 1626, 10: 1504, 11: 1642, 12: 1750,
                    19: 1633, 20: 1715, 21: 1746, 25: 1743, 30: 1453, 31: 1625,
                    32: 1712, 33: 1745, 37: 1713}
        for prn, octal in expected.items():
            assert gpsl1.first_chips_octal(prn) == octal, f"PRN {prn}"

    def test_table_shape_and_chips(self):
        t = gpsl1.code_table()
        assert t.shape == (1023, 37)
        assert t.dtype == np.float32
        assert set(np.unique(t)) == {-1.0, 1.0}

    def test_gold_balance(self):
        # Every C/A code has 512 ones and 511 zeros -> chip sum = +/-1.
        t = gpsl1.code_table()
        assert np.all(np.abs(t.sum(axis=0)) == 1)

    def test_gold_cross_correlation_bounded(self):
        # Gold codes: cross-correlation takes values in {-65, -1, 63} (x 1/1023).
        t = gpsl1.code_table().astype(np.float64)[:, :8]
        for i in range(4):
            for j in range(i + 1, 4):
                xc = np.fft.ifft(
                    np.fft.fft(t[:, i]) * np.conj(np.fft.fft(t[:, j]))
                ).real.round()
                assert set(np.unique(xc)) <= {-65.0, -1.0, 63.0}

    def test_autocorrelation_peak(self):
        t = gpsl1.code_table().astype(np.float64)
        ac = np.fft.ifft(np.fft.fft(t[:, 0]) * np.conj(np.fft.fft(t[:, 0]))).real
        assert abs(ac[0] - 1023) < 1e-6
        assert np.max(np.abs(ac[1:])) <= 65.0 + 1e-6


class TestGPSL5:
    def test_table_shape(self):
        t = gpsl5.code_table()
        assert t.shape == (10230, 37)
        assert set(np.unique(t)) == {-1.0, 1.0}

    def test_xa_short_cycle(self):
        xa = gpsl5._xa_sequence()
        assert xa.shape == (8190,)

    def test_xb_full_period(self):
        xb = gpsl5._xb_sequence()
        assert xb.shape == (8191,)
        # m-sequence balance: 4096 ones, 4095 zeros.
        assert xb.sum() == 4096

    def test_codes_near_balanced(self):
        # XOR of two near-balanced sequences: chip sums stay small.
        t = gpsl5.code_table()
        assert np.all(np.abs(t.sum(axis=0)) < 200)

    def test_i5_q5_differ(self):
        assert not np.array_equal(gpsl5.code_table(False), gpsl5.code_table(True))

    def test_cross_correlation_low(self):
        t = gpsl5.code_table()
        xc = np.fft.ifft(np.fft.fft(t[:, 0]) * np.conj(np.fft.fft(t[:, 1]))).real
        # Random-code bound ~ sqrt(L)*few; check well below the 10230 peak.
        assert np.max(np.abs(xc)) < 500

    def test_neuman_hofman(self):
        nh10 = gpsl5.neuman_hofman(False)
        nh20 = gpsl5.neuman_hofman(True)
        assert nh10.shape == (10,) and nh20.shape == (20,)
        assert set(np.unique(nh10)) == {-1.0, 1.0}
