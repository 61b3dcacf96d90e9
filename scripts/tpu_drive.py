"""End-to-end TPU smoke drive: golden EPL, fused bank kernel, closed-loop
convergence, and secondary-code wipe-off — run on the real chip
(`PYTHONPATH=/root/repo:/root/.axon_site python scripts/tpu_drive.py`)."""

import functools

import numpy as np
import jax
import jax.numpy as jnp

import gpuacceleratedtracking_tpu as gt

print("devices:", jax.devices())
system = gt.models.GPSL1()

# 1. Golden single-channel EPL via the fused XLA path.
signal, fs = gt.models.gen_signal(system, 0, 1500.0, 2500)
shifts = tuple(int(s) for s in gt.models.correlator_sample_shifts(
    system, gt.models.EPLCorrelator(3), fs))
corr = jax.jit(functools.partial(
    gt.ops.correlate_fused, sample_shifts=shifts,
    code_length=system.code_length))
are, aim = corr(*gt.models.soa(signal), jnp.asarray(system.codes), 0,
                1500.0, fs, 0.0, system.code_frequency, 0.0)
are = np.asarray(are)
assert np.allclose(are, [1476, 2500, 1476], atol=0.5), are
print("golden fused_xla OK:", are)

# 2. Same scenario through the bf16 transition bank kernel (K=4 channels,
# channel 0 = golden config; hoisted code tiles path exercised via track_bank).
K = 4
prns = jnp.zeros(K, jnp.int32)
bank = jax.jit(functools.partial(
    gt.ops.registry.get("pallas_bank"), sample_shifts=shifts,
    code_length=system.code_length, sampling_frequency=fs,
    nominal_code_frequency=system.code_frequency))
bre, bim = bank(*gt.models.soa(signal), jnp.asarray(system.codes), prns,
                jnp.full(K, 1500.0), carrier_phase=jnp.zeros(K),
                code_frequency=jnp.full(K, system.code_frequency),
                code_phase=jnp.zeros(K))
bre = np.asarray(bre)
assert np.allclose(bre[0], [1476, 2500, 1476], atol=1.0), bre
print("golden pallas_bank (bf16) OK:", bre[0])

# 3. Closed-loop bank convergence: 200 ms of a Doppler/phase-offset signal;
# tracked Doppler must converge to the true offset.
N = 4096
fs2 = N / 1e-3
B = 800
true_dop = 812.5
sig, _ = gt.models.gen_signal(
    system, 0, true_dop, N * B, duration=B * 1e-3, start_code_phase=0.25,
)
sre, sim = gt.models.soa(sig)
sre, sim = sre.reshape(B, N), sim.reshape(B, N)
config = gt.tracking.TrackConfig.for_system(
    system, fs2, N, algorithm="pallas_bank")
states = gt.tracking.init_state(
    np.zeros(8, np.int64), carrier_doppler=np.full(8, 600.0))
final, out = gt.tracking.track_bank(
    config, jnp.asarray(system.codes), states, sre, sim)
dop = np.asarray(out.carrier_doppler)[-1]
cn0 = np.asarray(out.cn0_dbhz)[-1]
assert np.all(np.abs(dop - true_dop) < 5.0), dop
print(f"closed-loop bank converged: doppler={dop[0]:.1f} Hz "
      f"(true {true_dop}), cn0={cn0[0]:.1f} dBHz")

# 4. Secondary-code wipe-off: NH10-modulated L1 signal, wipe-off enabled
# (ms_elapsed-aligned) -> prompts all positive through the Pallas bank.
from gpuacceleratedtracking_tpu.models.gpsl5 import NH10_BITS

NH10 = tuple(float(1.0 - 2.0 * b) for b in NH10_BITS)
Bs = 30
sig2, _ = gt.models.gen_signal(
    system, 0, 1000.0, N * Bs, duration=Bs * 1e-3,
    secondary_code=np.asarray(NH10), secondary_phase=4,
)
s2re, s2im = gt.models.soa(sig2)
cfg2 = gt.tracking.TrackConfig.for_system(
    system, fs2, N, algorithm="pallas_bank", secondary_code=NH10)
st2 = gt.tracking.init_state(
    np.zeros(2, np.int64), carrier_doppler=np.full(2, 1000.0), ms_elapsed=4)
_, out2 = gt.tracking.track_bank(
    cfg2, jnp.asarray(system.codes), st2,
    s2re.reshape(Bs, N), s2im.reshape(Bs, N))
p2 = np.asarray(out2.prompt_re)[:, 0]
assert np.all(p2 > 0.9 * N), p2
print("secondary-code wipe-off OK: min prompt", p2.min())

# 5. PCPS acquisition -> tracking handoff on chip.
prns5 = np.array([2, 9, 17])
dops5 = np.array([1250.0, -2400.0, 300.0])
phases5 = np.array([100.25, 511.0, 900.5])
sig5, fs5 = gt.models.gen_signal_mixed(
    system, prns5, dops5, 4096, start_code_phases=phases5)
s5re, s5im = gt.models.soa(sig5)
res5 = gt.acquire.acquire(system, s5re, s5im, prns5, fs5, max_doppler=4000.0)
got = np.asarray(res5.carrier_doppler)
assert np.all(np.abs(got - dops5) < 400.0), got
assert np.all(np.asarray(res5.peak_metric) > 10.0)
print("acquisition OK: doppler", got, "metric",
      np.round(np.asarray(res5.peak_metric), 1))

# 6. Round-5 legs: wide-span rows kernel (131.072 MHz, tap span 128) and
# Galileo E1 BOC(1,1) — both golden-prompt exact on chip.
N6 = 131072
fs6 = N6 / 1e-3
sig6, _ = gt.models.gen_signal(system, 0, 1500.0, N6)
shifts6 = tuple(int(s) for s in gt.models.correlator_sample_shifts(
    system, gt.models.EPLCorrelator(3), fs6))
assert max(shifts6) - min(shifts6) >= 128
wide = jax.jit(functools.partial(
    gt.ops.registry.get("pallas_bank_auto"), sample_shifts=shifts6,
    code_length=system.code_length, sampling_frequency=fs6,
    nominal_code_frequency=system.code_frequency))
k6 = 2
w_re, _ = wide(*gt.models.soa(sig6), jnp.asarray(system.codes),
               jnp.zeros(k6, jnp.int32), jnp.full(k6, 1500.0),
               carrier_phase=jnp.zeros(k6),
               code_frequency=jnp.full(k6, system.code_frequency),
               code_phase=jnp.zeros(k6))
w_re = np.asarray(w_re)
assert np.allclose(w_re[:, 1], N6, atol=2.0), w_re
print("wide-span rows kernel OK: prompt =", w_re[0, 1])

e1 = gt.models.GalileoE1(pilot=True)
N7 = 32768
fs7 = N7 / 1e-3
sig7, _ = gt.models.gen_signal(e1, 0, 1000.0, N7)
shifts7 = tuple(int(s) for s in gt.models.correlator_sample_shifts(
    e1, gt.models.EPLCorrelator(3), fs7))
boc = jax.jit(functools.partial(
    gt.ops.registry.get("pallas_bank_auto"), sample_shifts=shifts7,
    code_length=e1.code_length, sampling_frequency=fs7,
    nominal_code_frequency=e1.code_frequency))
g_re, _ = boc(*gt.models.soa(sig7), jnp.asarray(e1.codes),
              jnp.zeros(2, jnp.int32), jnp.full(2, 1000.0),
              carrier_phase=jnp.zeros(2),
              code_frequency=jnp.full(2, e1.code_frequency),
              code_phase=jnp.zeros(2))
g_re = np.asarray(g_re)
# BOC doubles the transition count, so a couple of f32 chip-boundary flips
# (+/-2 each) between the signal's and the kernel's phase grids are inside
# the documented envelope at this non-commensurate rate.
assert np.allclose(g_re[:, 1], N7, atol=12.0), g_re
print("Galileo E1 BOC(1,1) rows kernel OK: prompt =", g_re[0, 1])
print("VERIFY DRIVE OK")
