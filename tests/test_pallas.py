"""Pallas kernel tests (interpret mode on CPU) against the XLA oracle.

Mirrors the reference's per-algorithm golden testsets
(`/root/reference/test/algorithms.jl`) with the TPU algorithm registry.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gpuacceleratedtracking_tpu.models import (
    GPSL1,
    GPSL5,
    EPLCorrelator,
    correlator_sample_shifts,
    gen_signal,
    soa,
)
from gpuacceleratedtracking_tpu.ops import registry

GOLDEN = np.array([1476.0, 2500.0, 1476.0])


def run(algo, system, signal, fs, shifts, *, prn=0, fcar=1500.0, phicar=0.0,
        phicode=0.0):
    sre, sim = soa(signal)
    fn = jax.jit(
        functools.partial(
            registry.get(algo),
            sample_shifts=tuple(int(s) for s in shifts),
            code_length=system.code_length,
        )
    )
    are, aim = fn(sre, sim, jnp.asarray(system.codes), prn, fcar, fs, phicar,
                  system.code_frequency, phicode)
    return np.asarray(are) + 1j * np.asarray(aim)


@pytest.mark.parametrize("algo", ["pallas_taps", "pallas_fused"])
class TestPallasKernels:
    def test_golden(self, algo):
        system = GPSL1()
        signal, fs = gen_signal(system, 0, 1500.0, 2500)
        shifts = correlator_sample_shifts(system, EPLCorrelator(3), fs)
        acc = run(algo, system, signal, fs, shifts)
        np.testing.assert_allclose(acc.real, GOLDEN, rtol=3.5e-4)
        np.testing.assert_allclose(acc.imag, 0.0, atol=0.5)

    def test_matches_oracle_offsets(self, algo):
        system = GPSL1()
        N = 4096
        kwargs = dict(prn=5, fcar=-2345.0, phicar=0.9, phicode=517.3)
        signal, fs = gen_signal(
            system, kwargs["prn"], kwargs["fcar"], N,
            start_code_phase=kwargs["phicode"],
            start_carrier_phase=kwargs["phicar"],
        )
        shifts = correlator_sample_shifts(system, EPLCorrelator(3), fs)
        got = run(algo, system, signal, fs, shifts, **kwargs)
        want = run("fused_xla", system, signal, fs, shifts, **kwargs)
        np.testing.assert_allclose(got, want, rtol=1e-3, atol=0.2)

    def test_multi_antenna(self, algo):
        system = GPSL1()
        signal, fs = gen_signal(system, 0, 1500.0, 2500, num_ants=4)
        shifts = correlator_sample_shifts(system, EPLCorrelator(3), fs)
        acc = run(algo, system, signal, fs, shifts)
        assert acc.shape == (4, 3)
        for a in range(4):
            np.testing.assert_allclose(acc[a].real, GOLDEN, rtol=3.5e-4)

    def test_seven_taps(self, algo):
        system = GPSL1()
        signal, fs = gen_signal(system, 0, 1500.0, 8192)
        shifts = correlator_sample_shifts(system, EPLCorrelator(7), fs)
        got = run(algo, system, signal, fs, shifts)
        want = run("fused_xla", system, signal, fs, shifts)
        np.testing.assert_allclose(got, want, rtol=1e-3, atol=0.3)

    def test_l5(self, algo):
        system = GPSL5()
        signal, fs = gen_signal(system, 3, 2000.0, 32768)
        shifts = correlator_sample_shifts(system, EPLCorrelator(3), fs)
        got = run(algo, system, signal, fs, shifts, prn=3, fcar=2000.0)
        want = run("fused_xla", system, signal, fs, shifts, prn=3, fcar=2000.0)
        np.testing.assert_allclose(got, want, rtol=1e-3, atol=3.0)

    def test_wide_span(self, algo):
        # Tap span >= 128 samples (multi-row flat shift, q in {1, 2}) at an
        # interpret-affordable N — the reference envelope's fs >= 131 MHz
        # regime, where its mega-kernel keeps working
        # (`/root/reference/src/algorithms.jl:720-825`).
        system = GPSL1()
        signal, fs = gen_signal(system, 0, 1500.0, 4096)
        shifts = np.array([-150, 0, 163])
        got = run(algo, system, signal, fs, shifts)
        want = run("fused_xla", system, signal, fs, shifts)
        np.testing.assert_allclose(got, want, rtol=1e-3, atol=0.3)

    def test_tile_unaligned_n(self, algo):
        # N = 2500 (not a multiple of the 2048 tile) already covered by golden;
        # also check a sub-tile N.
        system = GPSL1()
        signal, fs = gen_signal(system, 0, 500.0, 1000)
        shifts = correlator_sample_shifts(system, EPLCorrelator(3), fs)
        got = run(algo, system, signal, fs, shifts, fcar=500.0)
        want = run("fused_xla", system, signal, fs, shifts, fcar=500.0)
        np.testing.assert_allclose(got, want, rtol=1e-3, atol=0.2)


class TestBankKernel:
    def _bank(self, system, sre, sim, fs, shifts, prns, dops, phases=None):
        import jax.numpy as jnp
        from gpuacceleratedtracking_tpu.ops.pallas_epl import correlate_pallas_bank

        K = len(prns)
        phases = jnp.zeros(K) if phases is None else jnp.asarray(phases)
        fn = jax.jit(functools.partial(
            correlate_pallas_bank, sample_shifts=tuple(int(s) for s in shifts),
            code_length=system.code_length, sampling_frequency=fs,
            nominal_code_frequency=system.code_frequency,
        ))
        return fn(
            sre, sim, jnp.asarray(system.codes), jnp.asarray(prns, jnp.int32),
            1500.0 + jnp.asarray(dops, jnp.float32), carrier_phase=phases,
            code_frequency=jnp.full((K,), system.code_frequency, jnp.float32),
            code_phase=phases,
        )

    def test_matches_per_channel_oracle(self):
        system = GPSL1()
        N = 4096
        fs = N / 1e-3
        prns = np.arange(4)
        dops = np.linspace(-3000.0, 3000.0, 4)
        sigs = [gen_signal(system, int(p), float(d), N)[0]
                for p, d in zip(prns, dops)]
        mixed = sum(sigs[1:], sigs[0])
        sre, sim = soa(mixed)
        shifts = correlator_sample_shifts(system, EPLCorrelator(3), fs)
        are, aim = self._bank(system, sre, sim, fs, shifts, prns, dops)
        assert are.shape == (4, 3)
        oracle = registry.get("fused_xla")
        for k in range(4):
            wre, wim = oracle(
                sre, sim, jnp.asarray(system.codes), int(prns[k]),
                1500.0 + float(dops[k]), fs, 0.0, system.code_frequency, 0.0,
                tuple(int(s) for s in shifts), system.code_length,
            )
            np.testing.assert_allclose(np.asarray(are)[k], np.asarray(wre),
                                       rtol=1e-3, atol=0.5)
            np.testing.assert_allclose(np.asarray(aim)[k], np.asarray(wim),
                                       rtol=1e-3, atol=0.5)

    def test_chans_per_step_batching(self):
        # G channels per grid step (incl. K % G != 0 edge-padding) must match
        # the unbatched kernel exactly.
        import jax.numpy as jnp
        from gpuacceleratedtracking_tpu.ops.pallas_epl import correlate_pallas_bank

        system = GPSL1()
        N = 2048
        fs = N / 1e-3
        K = 6
        prns = np.arange(K)
        dops = np.linspace(-2000.0, 2000.0, K)
        mixed = sum(
            (gen_signal(system, int(p), float(d), N)[0]
             for p, d in zip(prns[1:], dops[1:])),
            gen_signal(system, 0, float(dops[0]), N)[0],
        )
        sre, sim = soa(mixed)
        shifts = correlator_sample_shifts(system, EPLCorrelator(3), fs)

        def run(g):
            fn = jax.jit(functools.partial(
                correlate_pallas_bank,
                sample_shifts=tuple(int(s) for s in shifts),
                code_length=system.code_length, sampling_frequency=fs,
                nominal_code_frequency=system.code_frequency,
                chans_per_step=g,
            ))
            return fn(
                sre, sim, jnp.asarray(system.codes),
                jnp.asarray(prns, jnp.int32),
                1500.0 + jnp.asarray(dops, jnp.float32),
                carrier_phase=jnp.zeros(K),
                code_frequency=jnp.full((K,), system.code_frequency, jnp.float32),
                code_phase=jnp.zeros(K),
            )

        base_re, base_im = run(1)
        for g in (2, 4):   # 4 exercises the K=6 -> 8 padding path
            are, aim = run(g)
            assert are.shape == (K, 3)
            np.testing.assert_allclose(np.asarray(are), np.asarray(base_re),
                                       rtol=1e-6)
            np.testing.assert_allclose(np.asarray(aim), np.asarray(base_im),
                                       rtol=1e-6)

    def test_recon_and_carrier_variants_exact(self):
        # The one-hot-matmul replica reconstruction must be BIT-exact against
        # the mask formulation (same step functions, different scatter), and
        # the hoisted-phasor carrier must match the in-kernel NCO (identical
        # f32 phase decomposition; on the CPU backend both use XLA cos/sin).
        import jax.numpy as jnp
        from gpuacceleratedtracking_tpu.ops.pallas_epl import correlate_pallas_bank

        system = GPSL1()
        N = 4096
        fs = N / 1e-3
        K = 5
        prns = np.arange(K)
        dops = np.linspace(-4000.0, 4000.0, K)
        signal, _ = gen_signal(system, 0, 1500.0, N)
        sre, sim = soa(signal)
        shifts = correlator_sample_shifts(system, EPLCorrelator(3), fs)

        def run(carrier, recon):
            fn = jax.jit(functools.partial(
                correlate_pallas_bank,
                sample_shifts=tuple(int(s) for s in shifts),
                code_length=system.code_length, sampling_frequency=fs,
                nominal_code_frequency=system.code_frequency,
                carrier=carrier, recon=recon, tile_rows=16,
            ))
            are, aim = fn(
                sre, sim, jnp.asarray(system.codes),
                jnp.asarray(prns, jnp.int32),
                1500.0 + jnp.asarray(dops, jnp.float32),
                carrier_phase=jnp.linspace(0.0, 3.0, K).astype(jnp.float32),
                code_frequency=jnp.full((K,), system.code_frequency, jnp.float32),
                code_phase=jnp.linspace(0.0, 900.0, K).astype(jnp.float32),
            )
            return np.asarray(are), np.asarray(aim)

        for carrier in ("inkernel", "hoisted"):
            # Same carrier, different reconstruction: bit-exact.
            ref = run(carrier, "mask")
            got = run(carrier, "onehot")
            np.testing.assert_array_equal(got[0], ref[0], err_msg=carrier)
            np.testing.assert_array_equal(got[1], ref[1], err_msg=carrier)
        # Across carrier variants the cos/sin *implementations* differ by
        # <= 1 ulp (XLA full-tile vs in-kernel vectorization; Mosaic on real
        # TPU): accumulators agree to ~sqrt(N) ulp, not bitwise.
        ref = run("inkernel", "mask")
        got = run("hoisted", "onehot")
        np.testing.assert_allclose(got[0], ref[0], atol=2e-3)
        np.testing.assert_allclose(got[1], ref[1], atol=2e-3)

    def test_multi_antenna_bank(self):
        system = GPSL1()
        signal, fs = gen_signal(system, 0, 1500.0, 2500, num_ants=2)
        sre, sim = soa(signal)
        shifts = correlator_sample_shifts(system, EPLCorrelator(3), fs)
        are, aim = self._bank(system, sre, sim, fs, shifts, [0, 0], [0.0, 0.0])
        assert are.shape == (2, 2, 3)
        for k in range(2):
            for a in range(2):
                np.testing.assert_allclose(np.asarray(are)[k, a], GOLDEN,
                                           rtol=3.5e-4)

    def test_l5_bank(self):
        system = GPSL5()
        N = 32768
        fs = N / 1e-3
        signal, _ = gen_signal(system, 3, 2000.0, N)
        sre, sim = soa(signal)
        shifts = correlator_sample_shifts(system, EPLCorrelator(3), fs)
        from gpuacceleratedtracking_tpu.ops.pallas_epl import correlate_pallas_bank

        fn = jax.jit(functools.partial(
            correlate_pallas_bank, sample_shifts=tuple(int(s) for s in shifts),
            code_length=system.code_length, sampling_frequency=fs,
            nominal_code_frequency=system.code_frequency,
        ))
        are, aim = fn(
            sre, sim, jnp.asarray(system.codes),
            jnp.array([3, 3], jnp.int32),
            jnp.full((2,), 2000.0, jnp.float32),
            carrier_phase=jnp.zeros(2),
            code_frequency=jnp.full((2,), system.code_frequency, jnp.float32),
            code_phase=jnp.zeros(2),
        )
        want = run("fused_xla", system, signal, fs, shifts, prn=3, fcar=2000.0)
        for k in range(2):
            np.testing.assert_allclose(
                np.asarray(are)[k] + 1j * np.asarray(aim)[k], want,
                rtol=1e-3, atol=3.0,
            )

    def test_l5_m4_l7_challenge_config(self):
        # The reference's "unsolved challenge": GPS L5, 4 antennas, 7 taps was
        # not real-time on either of its GPUs (`paper/paper.tex:345`). The
        # bank kernel must at least produce oracle-exact accumulators for the
        # config (its real-time headroom is measured on hardware; RESULTS.md).
        system = GPSL5()
        N = 32768
        fs = N / 1e-3
        signal, _ = gen_signal(system, 6, -1800.0, N, num_ants=4)
        sre, sim = soa(signal)
        shifts = correlator_sample_shifts(system, EPLCorrelator(7), fs)
        from gpuacceleratedtracking_tpu.ops.pallas_epl import correlate_pallas_bank

        fn = jax.jit(functools.partial(
            correlate_pallas_bank, sample_shifts=tuple(int(s) for s in shifts),
            code_length=system.code_length, sampling_frequency=fs,
            nominal_code_frequency=system.code_frequency,
        ))
        are, aim = fn(
            sre, sim, jnp.asarray(system.codes),
            jnp.array([6], jnp.int32),
            jnp.full((1,), -1800.0, jnp.float32),
            carrier_phase=jnp.zeros(1),
            code_frequency=jnp.full((1,), system.code_frequency, jnp.float32),
            code_phase=jnp.zeros(1),
        )
        assert are.shape == (1, 4, 7)
        oracle = registry.get("fused_xla")
        wre, wim = oracle(
            sre, sim, jnp.asarray(system.codes), 6, -1800.0, fs, 0.0,
            system.code_frequency, 0.0,
            tuple(int(s) for s in shifts), system.code_length,
        )
        # f32 chip-phase rounding at L5's 10.23 Mchip/s misplaces a few chip
        # boundaries by one sample (<= 0.02% of N here) — the same error class
        # as the reference's texture path, whose envelope is mean 0.03% /
        # max 3.17% (`paper/paper.tex:326-329`).
        np.testing.assert_allclose(np.asarray(are)[0], np.asarray(wre),
                                   rtol=2e-3, atol=8.0)
        np.testing.assert_allclose(np.asarray(aim)[0], np.asarray(wim),
                                   rtol=2e-3, atol=8.0)

    def test_xla_bank_matches(self):
        system = GPSL1()
        N = 4096
        fs = N / 1e-3
        signal, _ = gen_signal(system, 2, 900.0, N)
        sre, sim = soa(signal)
        shifts = tuple(int(s) for s in
                       correlator_sample_shifts(system, EPLCorrelator(3), fs))
        fn = jax.jit(functools.partial(
            registry.get("xla_bank"), sample_shifts=shifts,
            code_length=system.code_length, sampling_frequency=fs,
        ))
        are, aim = fn(
            sre, sim, jnp.asarray(system.codes), jnp.array([2, 2], jnp.int32),
            jnp.full((2,), 900.0, jnp.float32),
            carrier_phase=jnp.zeros(2),
            code_frequency=jnp.full((2,), system.code_frequency, jnp.float32),
            code_phase=jnp.zeros(2),
        )
        want = run("fused_xla", system, signal, fs, shifts, prn=2, fcar=900.0)
        np.testing.assert_allclose(np.asarray(are)[0] + 1j * np.asarray(aim)[0],
                                   want, rtol=1e-5, atol=1e-2)

    def test_wide_span_raises(self):
        # The transition kernel keeps its span < 128 contract (static routing
        # never selects it there — the rows/comp kernels carry wide spans).
        system = GPSL1()
        signal, fs = gen_signal(system, 0, 1500.0, 131072)
        sre, sim = soa(signal)
        shifts = correlator_sample_shifts(system, EPLCorrelator(7), fs)
        with pytest.raises(ValueError):
            self._bank(system, sre, sim, fs, shifts, [0], [0.0])

    def test_onehot_wide_span(self):
        # The one-hot bank variant accepts any span (multi-row halo).
        from gpuacceleratedtracking_tpu.ops.pallas_epl import (
            correlate_pallas_bank_onehot,
        )

        system = GPSL1()
        N, K = 4096, 2
        fs = N / 1e-3
        signal, _ = gen_signal(system, 0, 1500.0, N)
        sre, sim = soa(signal)
        shifts = (-160, 0, 170)
        fn = jax.jit(functools.partial(
            correlate_pallas_bank_onehot, sample_shifts=shifts,
            code_length=system.code_length, tile_rows=8,
            sampling_frequency=fs,
        ))
        are, aim = fn(
            sre, sim, jnp.asarray(system.codes),
            jnp.zeros(K, jnp.int32), jnp.full(K, 1500.0),
            carrier_phase=jnp.zeros(K),
            code_frequency=jnp.full(K, system.code_frequency),
            code_phase=jnp.zeros(K),
        )
        want = run("fused_xla", system, signal, fs, shifts)
        got = np.asarray(are)[0] + 1j * np.asarray(aim)[0]
        np.testing.assert_allclose(got, want, rtol=1e-3, atol=0.3)


class TestBankRowsKernel:
    """Per-row boundary bank kernel (`pallas_bank_rows`): the high-rate
    flagship. Must be bit-identical to the transition kernel (same exact
    floor/ceil chip arithmetic, different reconstruction)."""

    def _run(self, algo, system, sre, sim, fs, shifts, prns, dops,
             carrier_phase, code_freq, code_phase, **kw):
        fn = jax.jit(functools.partial(
            registry.get(algo), sample_shifts=tuple(int(s) for s in shifts),
            code_length=system.code_length, sampling_frequency=fs,
            nominal_code_frequency=system.code_frequency, **kw,
        ))
        are, aim = fn(
            sre, sim, jnp.asarray(system.codes), jnp.asarray(prns, jnp.int32),
            jnp.asarray(dops, jnp.float32),
            carrier_phase=jnp.asarray(carrier_phase, jnp.float32),
            code_frequency=jnp.asarray(code_freq, jnp.float32),
            code_phase=jnp.asarray(code_phase, jnp.float32),
        )
        return np.asarray(are), np.asarray(aim)

    def _random_case(self, system, N, K, seed=0):
        rng = np.random.default_rng(seed)
        fs = N / 1e-3
        signal, _ = gen_signal(system, 0, 1500.0, N)
        sre, sim = soa(signal)
        shifts = correlator_sample_shifts(system, EPLCorrelator(3), fs)
        return dict(
            system=system, sre=sre, sim=sim, fs=fs, shifts=shifts,
            prns=np.arange(K) % 32,
            dops=1500.0 + rng.uniform(-4000.0, 4000.0, K),
            carrier_phase=rng.uniform(0, 2 * np.pi, K),
            code_freq=system.code_frequency + rng.uniform(-3, 3, K),
            code_phase=rng.uniform(0, system.code_length, K),
        )

    def test_wide_span_parity(self):
        # Tap span >= 2*128 samples (the reference envelope's L1 fs >= 131 MHz
        # regime scaled to an interpret-affordable N): multi-row `_flat_shift`
        # (q in {1, 2}) + the grown replica halo, vs the per-sample oracle.
        case = self._random_case(GPSL1(), 8192, 4, seed=5)
        case["shifts"] = np.array([-160, 0, 170])
        got = self._run("pallas_bank_rows", **case)
        want = self._run("xla_bank", **case)
        np.testing.assert_allclose(got[0], want[0], rtol=2e-3, atol=4.5)
        np.testing.assert_allclose(got[1], want[1], rtol=2e-3, atol=4.5)
        # Multi-tile: the tap halo crosses into the next tile's rows.
        got2 = self._run("pallas_bank_rows", **case, tile_rows=32,
                         chans_per_step=2)
        np.testing.assert_allclose(got2[0], want[0], rtol=2e-3, atol=4.5)
        np.testing.assert_allclose(got2[1], want[1], rtol=2e-3, atol=4.5)

    def test_reference_envelope_wide_cell(self):
        # GPS L1 at fs = 131.072 MHz (N = 2^17): unit tap shift = 64 samples,
        # L=3 span = 128 — the smallest envelope cell round 4 could not serve
        # at bank speed (`/root/reference/scripts/run_benchmarks_gpsl1.jl:8`).
        # The auto route must resolve to the rows kernel and match the oracle.
        from gpuacceleratedtracking_tpu.ops.pallas_epl import bank_algorithm_for

        system = GPSL1()
        assert bank_algorithm_for(
            131072, 131.072e6, 1023, system.code_frequency
        ) == "pallas_bank_rows"
        case = self._random_case(system, 131072, 2, seed=9)
        assert int(case["shifts"].max() - case["shifts"].min()) >= 128
        got = self._run("pallas_bank_auto", **case)
        want = self._run("xla_bank", **case)
        np.testing.assert_allclose(got[0], want[0], rtol=2e-3, atol=8.0)
        np.testing.assert_allclose(got[1], want[1], rtol=2e-3, atol=8.0)

    def test_rowmm_tap_mac_matches_sum2d(self):
        # The MXU-reduction tap MAC ("rowmm": ones-vector lane contraction +
        # per-antenna selector row contraction) must agree with the shipped
        # full-VPU reduce ("sum2d") to f32 reassociation tolerance (different
        # reduction order; exactness is not expected or required).
        case = self._random_case(GPSL1(), 32768, 8, seed=3)
        a = self._run("pallas_bank_rows", tap_mac="sum2d", chans_per_step=4,
                      **case)
        b = self._run("pallas_bank_rows", tap_mac="rowmm", chans_per_step=4,
                      **case)
        np.testing.assert_allclose(b[0], a[0], rtol=1e-4, atol=0.3)
        np.testing.assert_allclose(b[1], a[1], rtol=1e-4, atol=0.3)

    @pytest.mark.parametrize("n_samples,k", [(32768, 8), (8192, 5)])
    def test_matches_transition_kernel(self, n_samples, k):
        # Same exact floor/ceil chip arithmetic as the transition kernel up
        # to f32 FMA-contraction order, which can flip a rare chip boundary
        # by one sample (amplitude ±2) — the shared envelope both kernels
        # have vs the per-sample oracle.
        case = self._random_case(GPSL1(), n_samples, k)
        got = self._run("pallas_bank_rows", **case)
        want = self._run("pallas_bank", **case)
        np.testing.assert_allclose(got[0], want[0], rtol=2e-3, atol=4.5)
        np.testing.assert_allclose(got[1], want[1], rtol=2e-3, atol=4.5)

    def test_rows_matches_transition_gpsl5_wideband(self):
        # 65.536 MHz puts GPS L5 (10.23 MHz code) at 0.156 chips/sample —
        # inside the rows kernel's envelope, the deployed wideband-L5 config
        # (DualTrackBenchmark num_samples=65536 cells). Parity vs the
        # transition kernel: both share the exact floor/ceil chip arithmetic;
        # with 10x L1's chip-boundary count the f32 FMA boundary-flip
        # envelope scales accordingly (each flip is +/-2 on one sample;
        # ~2e-4 of the matched prompt scale N).
        case = self._random_case(GPSL5(), 65536, 3, seed=2)
        got = self._run("pallas_bank_rows", **case)
        want = self._run("pallas_bank", **case)
        np.testing.assert_allclose(got[0], want[0], rtol=2e-3, atol=24.0)
        np.testing.assert_allclose(got[1], want[1], rtol=2e-3, atol=24.0)

    def test_golden_prompt(self):
        system = GPSL1()
        N = 32768
        fs = N / 1e-3
        signal, _ = gen_signal(system, 0, 1500.0, N)
        sre, sim = soa(signal)
        shifts = correlator_sample_shifts(system, EPLCorrelator(3), fs)
        z = np.zeros(3)
        are, _ = self._run(
            "pallas_bank_rows", system, sre, sim, fs, shifts, [0, 0, 0],
            z + 1500.0, z, z + system.code_frequency, z,
        )
        np.testing.assert_array_equal(are[:, 1], np.full(3, float(N)))

    def test_multi_tile_and_chans_per_step(self):
        # tile_rows < N/128 exercises the multi-tile nominal-base rebasing;
        # chans_per_step exercises group batching incl. the K padding path.
        # Retiling itself moves f32 phase-rebasing boundaries (identically in
        # both bank kernels), so each shape is checked bit-exactly against the
        # transition kernel at the SAME tile shape instead of across shapes.
        case = self._random_case(GPSL1(), 16384, 6, seed=3)
        base = self._run("pallas_bank_rows", **case)
        for kw in ({}, {"tile_rows": 64}):
            got = self._run("pallas_bank_rows", **case, **kw,
                            chans_per_step=4)
            want = self._run("pallas_bank", **case, **kw)
            np.testing.assert_allclose(got[0], want[0], rtol=2e-3, atol=4.5,
                                       err_msg=str(kw))
            np.testing.assert_allclose(got[1], want[1], rtol=2e-3, atol=4.5,
                                       err_msg=str(kw))
        # Group batching itself must not change results at all.
        np.testing.assert_array_equal(
            self._run("pallas_bank_rows", **case, chans_per_step=4)[0],
            base[0],
        )

    def test_multi_antenna(self):
        system = GPSL1()
        signal, fs = gen_signal(system, 0, 1500.0, 32768, num_ants=2)
        sre, sim = soa(signal)
        shifts = correlator_sample_shifts(system, EPLCorrelator(3), fs)
        z = np.zeros(2)
        are, aim = self._run(
            "pallas_bank_rows", system, sre, sim, fs, shifts, [0, 0],
            z + 1500.0, z, z + system.code_frequency, z,
        )
        assert are.shape == (2, 2, 3)
        np.testing.assert_array_equal(are[:, :, 1], np.full((2, 2), 32768.0))

    def test_low_rate_rejected(self):
        # 2.5 MHz GPS L1 is ~0.41 chips/sample -> a row touches ~54 chips;
        # the rows kernel refuses and the transition kernel is the right tool.
        case = self._random_case(GPSL1(), 2500, 2)
        with pytest.raises(ValueError, match="chips/sample"):
            self._run("pallas_bank_rows", **case)

    def test_auto_selects_per_scenario(self):
        # pallas_bank_auto resolves statically: rows kernel at high rates,
        # transition kernel at low rates — outputs match the resolved kernel.
        from gpuacceleratedtracking_tpu.ops.pallas_epl import bank_algorithm_for

        system = GPSL1()
        assert bank_algorithm_for(
            32768, 32.768e6, 1023, system.code_frequency
        ) == "pallas_bank_rows"
        assert bank_algorithm_for(
            2500, 2.5e6, 1023, system.code_frequency
        ) == "pallas_bank"
        for n in (32768, 2500):
            case = self._random_case(system, n, 3)
            got = self._run("pallas_bank_auto", **case)
            want = self._run(bank_algorithm_for(
                n, n * 1e3, 1023, system.code_frequency), **case)
            np.testing.assert_array_equal(got[0], want[0])


class TestBankCompKernel:
    """Composite bank kernel (`pallas_bank_comp`): conj(carrier)*code folded
    into one plane per channel, taps/antennas/IQ on one wide MXU contraction.
    Mathematically identical to the rows kernel via the exact tone identity
    carrier[u-d] = carrier[u]*e^{-2*pi*i*f*d}; f32 rounding order differs, so
    parity is tolerance-based (~1e-5 relative), not bit-exact."""

    _run = TestBankRowsKernel._run
    _random_case = TestBankRowsKernel._random_case

    @pytest.mark.parametrize("n_samples,k", [(32768, 8), (8192, 5)])
    def test_matches_rows_kernel(self, n_samples, k):
        case = self._random_case(GPSL1(), n_samples, k)
        got = self._run("pallas_bank_comp", **case, chans_per_step=4)
        want = self._run("pallas_bank_rows", **case)
        scale = np.abs(want[0]).max()
        np.testing.assert_allclose(got[0], want[0], atol=3e-5 * scale)
        np.testing.assert_allclose(got[1], want[1], atol=3e-5 * scale)

    def test_bf16_z_tracking_grade(self):
        # Opt-in bf16 composite planes — the one measured flagship win on
        # chip (1.730 vs 1.818 ms, data/benchmarks/comp_ab.json). bf16
        # products bound parity at ~1e-3 relative: tracking-grade (far
        # inside the discriminator noise floor), deliberately not the
        # golden-exact default.
        import jax

        case = self._random_case(GPSL1(), 32768, 4, seed=11)
        want = self._run("pallas_bank_rows", **case)
        got = self._run(
            "pallas_bank_comp", **case, chans_per_step=2,
            z_dtype=jnp.bfloat16,
            mac_precision=jax.lax.Precision.DEFAULT,
        )
        scale = np.abs(want[0]).max()
        np.testing.assert_allclose(got[0], want[0], atol=4e-3 * scale)
        np.testing.assert_allclose(got[1], want[1], atol=4e-3 * scale)

    def test_golden_prompt(self):
        system = GPSL1()
        N = 32768
        fs = N / 1e-3
        signal, _ = gen_signal(system, 0, 1500.0, N)
        sre, sim = soa(signal)
        shifts = correlator_sample_shifts(system, EPLCorrelator(3), fs)
        z = np.zeros(3)
        are, _ = self._run(
            "pallas_bank_comp", system, sre, sim, fs, shifts, [0, 0, 0],
            z + 1500.0, z, z + system.code_frequency, z, chans_per_step=3,
        )
        np.testing.assert_allclose(are[:, 1], np.full(3, float(N)), rtol=1e-5)

    def test_halo_terms_at_exact_tile_multiple(self):
        # N == n_pad (one 256-row tile exactly): the late-tap terms
        # u in [N, N+d_l) fall off the padded grid and ride the dedicated
        # halo contraction — random code phases make them nonzero.
        case = self._random_case(GPSL1(), 32768, 4, seed=7)
        got = self._run("pallas_bank_comp", **case, chans_per_step=2)
        want = self._run("pallas_bank_rows", **case)
        scale = np.abs(want[0]).max()
        np.testing.assert_allclose(got[0], want[0], atol=3e-5 * scale)
        np.testing.assert_allclose(got[1], want[1], atol=3e-5 * scale)

    def test_multi_tile_and_padded_k(self):
        case = self._random_case(GPSL1(), 32768, 5, seed=3)
        want = self._run("pallas_bank_comp", **case, chans_per_step=1)
        # K=5 with G=3 exercises the channel-padding path; tile_rows=64 the
        # multi-tile nominal-base rebasing (4 tiles).
        got = self._run("pallas_bank_comp", **case, chans_per_step=3)
        np.testing.assert_array_equal(got[0], want[0])
        multi = self._run("pallas_bank_comp", **case, tile_rows=64,
                          chans_per_step=2)
        ref = self._run("pallas_bank_rows", **case, tile_rows=64)
        scale = np.abs(ref[0]).max()
        np.testing.assert_allclose(multi[0], ref[0], atol=3e-5 * scale)

    def test_multi_antenna(self):
        system = GPSL1()
        signal, fs = gen_signal(system, 0, 1500.0, 32768, num_ants=2)
        sre, sim = soa(signal)
        shifts = correlator_sample_shifts(system, EPLCorrelator(3), fs)
        z = np.zeros(2)
        are, aim = self._run(
            "pallas_bank_comp", system, sre, sim, fs, shifts, [0, 0],
            z + 1500.0, z, z + system.code_frequency, z, chans_per_step=2,
        )
        assert are.shape == (2, 2, 3)
        np.testing.assert_allclose(
            are[:, :, 1], np.full((2, 2), 32768.0), rtol=1e-5
        )

    def test_wide_span_multi_antenna(self):
        # Wide taps + M=2: the comp kernel's signal shifts exceed one lane
        # row and the last-tile halo correction spans halo_rows 128-lane
        # slices (N == n_pad at tile_rows=32, so the correction carries real
        # payload).
        system = GPSL1()
        case = self._random_case(system, 8192, 3, seed=6)
        signal, _ = gen_signal(system, 0, 1500.0, 8192, num_ants=2)
        case["sre"], case["sim"] = soa(signal)
        case["shifts"] = np.array([-160, 0, 170])
        got = self._run("pallas_bank_comp", **case, chans_per_step=2,
                        tile_rows=32)
        want = self._run("xla_bank", **case)
        np.testing.assert_allclose(got[0], want[0], rtol=2e-3, atol=4.5)
        np.testing.assert_allclose(got[1], want[1], rtol=2e-3, atol=4.5)

    def test_unaligned_n(self):
        # N=20000 (not a tile multiple): the shifted-in tail rides the S
        # padding region and the halo input is all zeros.
        case = self._random_case(GPSL1(), 20000, 3, seed=5)
        got = self._run("pallas_bank_comp", **case, chans_per_step=3)
        want = self._run("pallas_bank_rows", **case)
        scale = np.abs(want[0]).max()
        np.testing.assert_allclose(got[0], want[0], atol=3e-5 * scale)

    def test_low_rate_rejected(self):
        case = self._random_case(GPSL1(), 2500, 2)
        with pytest.raises(ValueError, match="chips/sample"):
            self._run("pallas_bank_comp", **case)


def test_registry_names():
    names = registry.names()
    for expected in ["fused_xla", "unfused_xla", "pallas_taps", "pallas_fused",
                     "pallas_bank"]:
        assert expected in names
    with pytest.raises(KeyError):
        registry.get("nope")


def test_wide_span_fused_native():
    # Tap span >= 128 samples runs NATIVELY in the fused kernel (multi-row
    # replica halo) — a true reference-envelope cell (L=7 at 131 MHz, span
    # 384 samples) that round 4 served only via the taps fallback.
    system = GPSL1()
    N = 131072  # 131 MHz: unit shift = 64 samples, span 7 taps = 384
    signal, fs = gen_signal(system, 0, 1500.0, N)
    shifts = correlator_sample_shifts(system, EPLCorrelator(7), fs)
    assert int(max(shifts)) - int(min(shifts)) >= 128
    got = run("pallas_fused", system, signal, fs, shifts)
    want = run("fused_xla", system, signal, fs, shifts)
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=2.0)
