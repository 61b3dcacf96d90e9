"""Scratch: stage ablation of the transition bank kernel.

Stages: align (permutation matmuls) -> deltas/bounds (VPU) -> reconstruct
(MXU h + rowsum g) -> carrier+wipeoff -> tap MAC. Each ablation level keeps a
prefix of stages and writes a cheap stand-in for the rest, so timings reveal
each stage's marginal cost. Levels:
  0: read params + write zeros            (grid/DMA floor)
  1: + align matmuls                      (q_lane/p_row)
  2: + delta + bounds + reconstruct       (replica complete)
  3: + carrier + wipeoff + tap MAC        (= full kernel)
"""

import functools
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gpuacceleratedtracking_tpu.models import (
    GPSL1, EPLCorrelator, correlator_sample_shifts, gen_signal, soa,
)
from gpuacceleratedtracking_tpu.ops import pallas_epl as pe

K, N = 1024, 32768
TILE_ROWS = 256
REPS1, REPS2 = 4, 12
LANES = 128

system = GPSL1()
fs = N / 1e-3
signal, _ = gen_signal(system, 0, 1500.0, N)
sre_h, sim_h = soa(signal)
codes = jnp.asarray(system.codes)
shifts = tuple(int(s) for s in correlator_sample_shifts(system, EPLCorrelator(3), fs))
prns = jnp.arange(K, dtype=jnp.int32) % codes.shape[1]
dops = jnp.linspace(-4000.0, 4000.0, K).astype(jnp.float32)
print("devices:", jax.devices())

d_min = min(shifts)
deltas = tuple(int(d) - d_min for d in shifts)
num_taps = len(shifts)
tile = TILE_ROWS * LANES
ext = TILE_ROWS + 1
num_e = (ext + 7) // 8 * 8
rho_nom = system.code_frequency / fs
_, num_c, crt = pe._transition_geometry(
    N, TILE_ROWS, fs, system.code_length, system.code_frequency, None)
cr = num_c // LANES
code_tiles = pe.prepare_bank_code_tiles(
    codes, prns, code_length=system.code_length, num_samples=N,
    sampling_frequency=fs, tile_rows=TILE_ROWS,
    nominal_code_frequency=system.code_frequency)
num_tiles = 1
sre = sre_h.reshape(1, -1, LANES)
sim = sim_h.reshape(1, -1, LANES)
lc = float(system.code_length)


def kernel(params_ref, sre_ref, sim_ref, codecol_ref, outre_ref, outim_ref,
           *, level):
    k = pl.program_id(0)
    f_cyc = params_ref[k, 0]
    phi_cyc = params_ref[k, 1]
    rho = params_ref[k, 2]
    phi_code = params_ref[k, 3]

    outre_ref[...] = jnp.zeros_like(outre_ref)
    outim_ref[...] = jnp.zeros_like(outim_ref)
    if level == 0:
        outre_ref[0, :, 0:1] = jnp.full((1, 1), f_cyc + rho)
        return

    lcf = jnp.float32(lc)
    p = phi_code - lcf * jnp.floor(phi_code / lcf)
    c0 = p.astype(jnp.int32)
    frac = p - c0.astype(jnp.float32)
    q = jax.lax.div(c0, LANES)
    r = jax.lax.rem(c0, LANES)

    code2d = codecol_ref[0]
    lane_diff = jax.lax.rem(
        jax.lax.broadcasted_iota(jnp.int32, (LANES, LANES), 0)
        - jax.lax.broadcasted_iota(jnp.int32, (LANES, LANES), 1) + LANES, LANES)
    q_lane = (lane_diff == r).astype(jnp.bfloat16)
    y = jax.lax.dot_general(code2d.astype(jnp.bfloat16), q_lane,
                            (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    row_diff = (jax.lax.broadcasted_iota(jnp.int32, (crt, crt), 1)
                - jax.lax.broadcasted_iota(jnp.int32, (crt, crt), 0))
    p_row = (row_diff == q).astype(jnp.bfloat16)
    a1 = jax.lax.dot_general(p_row, y.astype(jnp.bfloat16),
                             (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)[: cr + 1]
    a2 = jnp.concatenate([a1[1:], jnp.zeros_like(a1[:1])], axis=0)
    lane_i = jax.lax.broadcasted_iota(jnp.int32, (cr + 1, LANES), 1)
    aligned = jnp.where(lane_i < LANES - r, a1, a2)
    if level == 1:
        outre_ref[0, :, 0:1] = aligned[:1, :1]
        return

    prev_l = pltpu.roll(aligned, 1, axis=1)
    prev_r = pltpu.roll(aligned, 1, axis=0)
    prev_r = pltpu.roll(prev_r, 1, axis=1)
    prev = jnp.where(lane_i == 0, prev_r, prev_l)
    flat_c = jax.lax.broadcasted_iota(jnp.int32, (cr + 1, LANES), 0) * LANES + lane_i
    delta2d = jnp.where(flat_c == 0, aligned, aligned - prev)[:cr]
    sel_lane = jax.lax.broadcasted_iota(jnp.int32, (LANES, num_c), 0)
    sel_chip = jax.lax.broadcasted_iota(jnp.int32, (LANES, num_c), 1)
    parts = []
    for a in range(cr):
        sel = (sel_chip == a * LANES + sel_lane).astype(jnp.bfloat16)
        parts.append(jax.lax.dot_general(
            delta2d[a: a + 1].astype(jnp.bfloat16), sel,
            (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32))
    delta_lane = sum(parts)
    inv_rho = 1.0 / rho

    def bounds(c_idx):
        t = jnp.ceil((c_idx.astype(jnp.float32) - frac) * inv_rho)
        t = jnp.where(c_idx == 0, 0.0, t)
        t = jnp.clip(t, 0.0, jnp.float32(num_e * LANES)).astype(jnp.int32)
        return jax.lax.div(t, LANES), jax.lax.rem(t, LANES)

    rt_lane, _ = bounds(jax.lax.broadcasted_iota(jnp.int32, (1, num_c), 1))
    _, lt_col = bounds(jax.lax.broadcasted_iota(jnp.int32, (num_c, 1), 0))
    r_sub = jax.lax.broadcasted_iota(jnp.int32, (num_e, 1), 0)
    ge = (r_sub > rt_lane).astype(jnp.float32)
    eq = (r_sub == rt_lane).astype(jnp.float32)
    g_rows = jnp.sum(ge * delta_lane, axis=1, keepdims=True)
    me = eq * delta_lane
    l_lane = jax.lax.broadcasted_iota(jnp.int32, (1, LANES), 1)
    lstep = (l_lane >= lt_col).astype(jnp.bfloat16)
    h = jax.lax.dot_general(me.astype(jnp.bfloat16), lstep,
                            (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    rep = (g_rows + h)[:ext]
    if level == 2:
        outre_ref[0, :, 0:1] = rep[:1, :1]
        return

    cos, sin = pe._carrier_tile(jnp.int32(0), TILE_ROWS, f_cyc, phi_cyc, tile=tile)
    sre_v = sre_ref[...]
    sim_v = sim_ref[...]
    dw_re = sre_v * cos + sim_v * sin
    dw_im = sim_v * cos - sre_v * sin
    for l, delta in enumerate(deltas):
        tap = pe._flat_shift(rep, delta)[:TILE_ROWS]
        s_re = jnp.sum((dw_re * tap).reshape(1, -1), axis=1, keepdims=True)
        s_im = jnp.sum((dw_im * tap).reshape(1, -1), axis=1, keepdims=True)
        outre_ref[0, :, l: l + 1] += s_re
        outim_ref[0, :, l: l + 1] += s_im


def build(level):
    rho = jnp.full((K,), system.code_frequency / fs, jnp.float32)
    grid_spec = pl.GridSpec(
        grid=(K,),
        in_specs=[
            pl.BlockSpec((K, 4), lambda k: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, TILE_ROWS, LANES), lambda k: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TILE_ROWS, LANES), lambda k: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, crt, LANES), lambda k: (k, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, 1, num_taps), lambda k: (k, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, num_taps), lambda k: (k, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
    )
    out_shape = (jax.ShapeDtypeStruct((K, 1, num_taps), jnp.float32),
                 jax.ShapeDtypeStruct((K, 1, num_taps), jnp.float32))
    kfn = functools.partial(kernel, level=level)

    def call(params):
        return pl.pallas_call(kfn, grid_spec=grid_spec, out_shape=out_shape,
                              interpret=False)(params, sre, sim, code_tiles)

    def make(rr):
        @jax.jit
        def run(offs):
            tot = jnp.float32(0.0)
            for i in range(rr):
                pr = jnp.stack([
                    (1500.0 + dops) / fs, jnp.zeros(K) + offs[i], rho,
                    jnp.zeros(K)], axis=-1)
                o1, o2 = call(pr)
                tot = tot + o1.sum() + o2.sum()
            return tot
        return run, (jnp.linspace(0.0, 0.1, rr).astype(jnp.float32),)

    f1, a1 = make(REPS1)
    f2, a2 = make(REPS2)
    np.asarray(f1(*a1)); np.asarray(f2(*a2))
    return f1, a1, f2, a2


built = {lv: build(lv) for lv in (0, 1, 2, 3)}
res = {lv: [] for lv in built}
for _ in range(6):
    for lv, (f1, a1, f2, a2) in built.items():
        t0 = time.perf_counter(); np.asarray(f1(*a1)); t1 = time.perf_counter() - t0
        t0 = time.perf_counter(); np.asarray(f2(*a2)); t2 = time.perf_counter() - t0
        res[lv].append(max(t2 - t1, 0.0) / (REPS2 - REPS1))
names = {0: "floor (grid+DMA)", 1: "+align", 2: "+reconstruct", 3: "full"}
for lv, ts in res.items():
    ts = np.array(ts) * 1e3
    print(f"level {lv} {names[lv]:18s}: min {ts.min():6.3f} med {np.median(ts):6.3f} "
          f"all {np.round(ts, 2)}")
