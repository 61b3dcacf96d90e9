"""Fused Pallas EPL correlation kernels — the TPU-native `downconvert_and_
correlate_kernel_*` family.

Behavioral spec: the reference's fully-fused mega-kernel 5431
(`/root/reference/src/algorithms.jl:720-825`): per-block code-replica
generation, per-sample carrier sincos, conjugate wipe-off, tap-shifted MAC and
reduction to ``accum[ant, corr]`` — one kernel launch, no HBM intermediates.
CUDA realizes it with shared-memory trees + `CUDA.@atomic`; on TPU the same
contract maps to (SURVEY.md §7):

- grid over **time tiles**, sequential on a TPU core -> the cross-block
  accumulation is a plain revisit of the output block (no atomics needed);
- the Harris reduction ladder (`/root/reference/src/reduction.jl`) collapses
  into an MXU contraction ``[A, T] x [T, L]`` with f32 accumulation;
- the texture-unit code fetch becomes either a precomputed tap matrix
  (``pallas_taps``, the 3431-analog: replica from XLA, rest fused) or an
  **in-kernel one-hot MXU gather** (``pallas_fused``, the 5431-analog: chip
  index = fixed-point NCO arithmetic; code lookup = one-hot(lane) @ code-matrix
  on the MXU — the TPU's replacement for texture wrap + nearest-neighbour).

Both kernels run in interpret mode on CPU (tests) and compiled on TPU.
"""

from __future__ import annotations

import functools
import math
from typing import Sequence

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import registry, replica as replica_ops
from .correlate import _tap_matrix

LANES = 128
TILE_ROWS = 16          # 16 x 128 = 2048 samples per grid step
TILE = TILE_ROWS * LANES
_TWO_PI = 2.0 * math.pi
# Transition-kernel chip-window cap: bounds the [tile_rows, num_c] scratch
# tensors to fit the ~16 MB scoped-VMEM limit at any chip rate (see
# _transition_geometry).
MAX_WINDOW_CHIPS = 2048


def _interpret() -> bool:
    return jax.default_backend() == "cpu"


def _pad_to(x: jax.Array, size: int, axis: int = -1) -> jax.Array:
    pad = size - x.shape[axis]
    if pad == 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths)


def _carrier_tile(tile_idx, rows, f_cyc, phi_cyc, row_offset=0.0, tile=TILE):
    """(cos, sin) of the carrier over one ``[rows, 128]`` tile.

    Phase-rotator factorization: ``carrier[r, l] = rot_row[r] * rot_lane[l]``
    (complex product of two unit phasors), so transcendentals run only on the
    ``rows + 128`` boundary vectors (~0.07/sample) and the bulk work is a
    6-op/sample complex outer product — the TPU answer to the reference's
    per-thread `CUDA.sincos` (`/root/reference/src/algorithms.jl:573`).
    Phases are wrapped as cycles before the 2*pi multiply to keep f32 accuracy
    at any block length.
    """
    row = jax.lax.broadcasted_iota(jnp.int32, (rows, 1), 0).astype(jnp.float32)
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, LANES), 1).astype(jnp.float32)
    cyc_row = f_cyc * ((tile_idx * tile).astype(jnp.float32) + (row + row_offset) * LANES) + phi_cyc
    cyc_row = cyc_row - jnp.floor(cyc_row)
    theta_row = _TWO_PI * cyc_row                      # [rows, 1]
    cyc_lane = f_cyc * lane
    theta_lane = _TWO_PI * (cyc_lane - jnp.floor(cyc_lane))  # [1, 128]
    cr, sr = jnp.cos(theta_row), jnp.sin(theta_row)
    cl, sl = jnp.cos(theta_lane), jnp.sin(theta_lane)
    return cr * cl - sr * sl, sr * cl + cr * sl


# ---------------------------------------------------------------------------
# Kernel A: precomputed tap matrix (3431-analog)
# ---------------------------------------------------------------------------


def _taps_kernel(params_ref, sre_ref, sim_ref, taps_ref, outre_ref, outim_ref):
    i = pl.program_id(0)
    f_cyc = params_ref[0, 0]
    phi_cyc = params_ref[0, 1]
    cos, sin = _carrier_tile(i, TILE_ROWS, f_cyc, phi_cyc)

    sre = sre_ref[...]                      # [A, TR, 128]
    sim = sim_ref[...]
    dw_re = sre * cos + sim * sin           # wipe-off (conj carrier)
    dw_im = sim * cos - sre * sin

    num_ants = sre.shape[0]
    num_taps = taps_ref.shape[0]
    taps = taps_ref[...].reshape(num_taps, TILE)

    def contract(dw):
        return jax.lax.dot_general(
            dw.reshape(num_ants, TILE),
            taps,
            (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    @pl.when(i == 0)
    def _():
        outre_ref[...] = jnp.zeros_like(outre_ref)
        outim_ref[...] = jnp.zeros_like(outim_ref)

    outre_ref[...] += contract(dw_re)
    outim_ref[...] += contract(dw_im)


def correlate_pallas_taps(
    signal_re: jax.Array,
    signal_im: jax.Array,
    codes: jax.Array,
    prn,
    carrier_frequency,
    sampling_frequency,
    carrier_phase,
    code_frequency,
    code_phase,
    sample_shifts: Sequence[int],
    code_length: int,
) -> tuple[jax.Array, jax.Array]:
    """Fused carrier-NCO + wipe-off + MXU tap MAC; replica from XLA.

    Registry signature (see `ops.registry`); ``signal_*`` is ``[N]`` or
    ``[A, N]``. Returns ``[L]`` / ``[A, L]`` f32 accumulators.
    """
    squeeze = signal_re.ndim == 1
    if squeeze:
        signal_re, signal_im = signal_re[None], signal_im[None]
    num_ants, num_samples = signal_re.shape
    num_taps = len(sample_shifts)

    code_rep = replica_ops.gen_code_replica(
        codes, prn, code_frequency, sampling_frequency, code_phase,
        num_samples, int(min(sample_shifts)), int(max(sample_shifts)),
        code_length,
    )
    taps = _tap_matrix(code_rep, sample_shifts, num_samples)  # [L, N]

    num_tiles = pl.cdiv(num_samples, TILE)
    n_pad = num_tiles * TILE
    sre = _pad_to(signal_re, n_pad).reshape(num_ants, -1, LANES)
    sim = _pad_to(signal_im, n_pad).reshape(num_ants, -1, LANES)
    taps = _pad_to(taps, n_pad).reshape(num_taps, -1, LANES)
    params = jnp.array(
        [[carrier_frequency / sampling_frequency, carrier_phase / _TWO_PI]],
        dtype=jnp.float32,
    )

    grid_spec = pl.GridSpec(
        grid=(num_tiles,),
        in_specs=[
            pl.BlockSpec((1, 2), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec(
                (num_ants, TILE_ROWS, LANES), lambda i: (0, i, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (num_ants, TILE_ROWS, LANES), lambda i: (0, i, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (num_taps, TILE_ROWS, LANES), lambda i: (0, i, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=(
            pl.BlockSpec((num_ants, num_taps), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((num_ants, num_taps), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ),
    )
    out_shape = (
        jax.ShapeDtypeStruct((num_ants, num_taps), jnp.float32),
        jax.ShapeDtypeStruct((num_ants, num_taps), jnp.float32),
    )
    acc_re, acc_im = pl.pallas_call(
        _taps_kernel,
        grid_spec=grid_spec,
        out_shape=out_shape,
        interpret=_interpret(),
    )(params, sre, sim, taps)
    if squeeze:
        acc_re, acc_im = acc_re[0], acc_im[0]
    return acc_re, acc_im


# ---------------------------------------------------------------------------
# Kernel B: fully fused — in-kernel replica via one-hot MXU gather (5431-analog)
# ---------------------------------------------------------------------------


def _flat_shift(arr: jax.Array, delta: int) -> jax.Array:
    """View ``arr [R+H, 128]`` as flat samples and shift left by ``delta`` =
    ``q*128 + r``: ``out[i, l] = flat[i*128 + l + delta]``, valid for the
    first ``R+H-q-1`` rows (``R+H-q`` when ``r == 0``; trailing rows are halo
    garbage). ``q`` static sublane rolls + one lane roll + a lane-position
    select — all STATIC shifts (dynamic `pltpu.roll` hangs Mosaic on this
    toolchain), covering any tap span given enough halo rows (the wide-span
    regime: GPS L1 at fs >= 131 MHz where one EPL chip spans >= 128 samples,
    the reference mega-kernel's N=2^17/2^18 envelope cells,
    `/root/reference/scripts/run_benchmarks_gpsl1.jl:8`)."""
    if delta == 0:
        return arr
    q, r = divmod(int(delta), LANES)
    if q:
        # Shift rows up by q: out[i] = in[i + q] (pltpu.roll is a right-roll).
        arr = pltpu.roll(arr, arr.shape[0] - q, axis=0)
    if r == 0:
        return arr
    rolled = pltpu.roll(arr, LANES - r, axis=1)              # [i, (l+r) % 128]
    next_row = pltpu.roll(rolled, arr.shape[0] - 1, axis=0)  # [i+1, (l+r) % 128]
    lane = jax.lax.broadcasted_iota(jnp.int32, arr.shape, 1)
    return jnp.where(lane < LANES - r, rolled, next_row)


def _halo_rows_for_span(span: int) -> int:
    """Halo rows a kernel's replica must carry so `_flat_shift` by any tap
    delta <= ``span`` only reads valid rows: ``q_max`` extra full rows plus
    one for the lane shift."""
    return int(span) // LANES + 1


def _fused_kernel(
    params_ref, sre_ref, sim_ref, code2d_ref, outre_ref, outim_ref,
    *, deltas: tuple, code_length: int, num_hi: int, halo_rows: int = 1,
):
    i = pl.program_id(0)
    f_cyc = params_ref[0, 0]
    phi_cyc = params_ref[0, 1]
    rho = params_ref[0, 2]          # chips per sample
    phi_code = params_ref[0, 3]     # chips (already offset by d_min)
    ext_rows = TILE_ROWS + halo_rows    # halo covers the max tap span

    # --- code replica for the extended tile (one-hot MXU gather) ---
    row = jax.lax.broadcasted_iota(jnp.int32, (ext_rows, LANES), 0).astype(jnp.float32)
    lane = jax.lax.broadcasted_iota(jnp.int32, (ext_rows, LANES), 1).astype(jnp.float32)
    m = (i * TILE).astype(jnp.float32) + row * LANES + lane
    p = rho * m + phi_code
    # wrap into [0, code_length): p - Lc*floor(p/Lc)
    lc = jnp.float32(code_length)
    p = p - lc * jnp.floor(p / lc)
    idx = jnp.clip(p.astype(jnp.int32), 0, code_length - 1)  # chip index
    hi = jax.lax.div(idx, LANES)
    lo = jax.lax.rem(idx, LANES)

    # One-hot over the lane-sized low digit; the gather itself runs on the MXU:
    # W[r, pos, h] = codes[h*128 + lo[r, pos]].
    onehot = (
        lo[:, :, None]
        == jax.lax.broadcasted_iota(jnp.int32, (ext_rows, LANES, LANES), 2)
    ).astype(jnp.float32)
    w = jax.lax.dot_general(
        onehot,
        code2d_ref[...],                      # [num_hi, 128]
        (((2,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )                                          # [ext_rows, 128, num_hi]
    sel = (
        hi[:, :, None]
        == jax.lax.broadcasted_iota(jnp.int32, (ext_rows, LANES, num_hi), 2)
    )
    rep = jnp.sum(jnp.where(sel, w, 0.0), axis=2)   # [ext_rows, 128]

    # --- carrier + wipe-off over the tile ---
    cos, sin = _carrier_tile(i, TILE_ROWS, f_cyc, phi_cyc)
    sre = sre_ref[...]
    sim = sim_ref[...]
    dw_re = sre * cos + sim * sin
    dw_im = sim * cos - sre * sin

    @pl.when(i == 0)
    def _():
        outre_ref[...] = jnp.zeros_like(outre_ref)
        outim_ref[...] = jnp.zeros_like(outim_ref)

    # --- tap-shifted MAC: tap l uses replica samples shifted by delta_l ---
    # Sums stay 2-D ([A, 1] into a [:, l:l+1] ref slice): rank-1 vector writes
    # crash libtpu's layout inference for A > 1 on real hardware.
    num_ants = sre.shape[0]
    for l, delta in enumerate(deltas):
        tap = _flat_shift(rep, delta)[:TILE_ROWS]   # [TR, 128]
        s_re = jnp.sum((dw_re * tap).reshape(num_ants, -1), axis=1,
                       keepdims=True)
        s_im = jnp.sum((dw_im * tap).reshape(num_ants, -1), axis=1,
                       keepdims=True)
        outre_ref[:, l : l + 1] += s_re
        outim_ref[:, l : l + 1] += s_im


def correlate_pallas_fused(
    signal_re: jax.Array,
    signal_im: jax.Array,
    codes: jax.Array,
    prn,
    carrier_frequency,
    sampling_frequency,
    carrier_phase,
    code_frequency,
    code_phase,
    sample_shifts: Sequence[int],
    code_length: int,
) -> tuple[jax.Array, jax.Array]:
    """Fully fused EPL correlation: replica generation inside the kernel.

    The one kernel = the reference's 5431 mega-kernel, and like it valid at
    any N of the reference envelope (`/root/reference/src/algorithms.jl:720-825`
    works at any grid size): the replica halo carries ``span // 128 + 1``
    extra rows, so wide tap spans (GPS L1 at fs >= 131 MHz) stay on the fused
    path instead of degrading to `pallas_taps`. The code table column for
    ``prn`` rides in VMEM as ``[ceil(Lc/128), 128]``; chip lookup is a one-hot
    lane matmul (exact in f32).
    """
    span = int(max(sample_shifts)) - int(min(sample_shifts))
    halo_rows = _halo_rows_for_span(span)
    squeeze = signal_re.ndim == 1
    if squeeze:
        signal_re, signal_im = signal_re[None], signal_im[None]
    num_ants, num_samples = signal_re.shape
    num_taps = len(sample_shifts)
    d_min = int(min(sample_shifts))
    deltas = tuple(int(d) - d_min for d in sample_shifts)

    num_hi = pl.cdiv(code_length, LANES)
    code_col = jnp.take(codes.T, jnp.asarray(prn), axis=0)      # [Lc]
    code2d = _pad_to(code_col, num_hi * LANES).reshape(num_hi, LANES)

    num_tiles = pl.cdiv(num_samples, TILE)
    n_pad = num_tiles * TILE
    sre = _pad_to(signal_re, n_pad).reshape(num_ants, -1, LANES)
    sim = _pad_to(signal_im, n_pad).reshape(num_ants, -1, LANES)

    # precise_div: a traced f32 divide lowers to reciprocal-multiply (1-2 ulp
    # off), which shifts exactly-on-sample chip boundaries — see
    # ops.replica.precise_div.
    rho = replica_ops.precise_div(code_frequency, sampling_frequency)
    params = jnp.array(
        [[
            carrier_frequency / sampling_frequency,
            carrier_phase / _TWO_PI,
            rho,
            code_phase + rho * d_min,   # chip phase of the earliest tap sample
        ]],
        dtype=jnp.float32,
    )

    # Signal blocks carry one extra (zero) halo row so tap shifts never read
    # out of bounds on the last tile; simpler: give the kernel the full padded
    # rows and slice per tile via index_map — the halo row of tile i is the
    # first row of tile i+1, so blocks of TILE_ROWS+1 rows with stride
    # TILE_ROWS overlap by one row. BlockSpec blocks cannot overlap, so the
    # replica is instead generated over ext_rows inside the kernel (no signal
    # halo needed — only the replica needs lookahead).
    grid_spec = pl.GridSpec(
        grid=(num_tiles,),
        in_specs=[
            pl.BlockSpec((1, 4), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((num_ants, TILE_ROWS, LANES), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((num_ants, TILE_ROWS, LANES), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((num_hi, LANES), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((num_ants, num_taps), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((num_ants, num_taps), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ),
    )
    out_shape = (
        jax.ShapeDtypeStruct((num_ants, num_taps), jnp.float32),
        jax.ShapeDtypeStruct((num_ants, num_taps), jnp.float32),
    )
    kernel = functools.partial(
        _fused_kernel, deltas=deltas, code_length=int(code_length),
        num_hi=int(num_hi), halo_rows=halo_rows,
    )
    acc_re, acc_im = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shape,
        interpret=_interpret(),
    )(params, sre, sim, code2d)
    if squeeze:
        acc_re, acc_im = acc_re[0], acc_im[0]
    return acc_re, acc_im


# ---------------------------------------------------------------------------
# Kernel C: multi-channel bank — channels as a grid axis (3d_4431-analog)
# ---------------------------------------------------------------------------


def _bank_kernel(
    params_ref, sre_ref, sim_ref, code2d_ref, outre_ref, outim_ref,
    *, deltas: tuple, code_length: int, num_hi: int, tile_rows: int,
    halo_rows: int = 1,
):
    """One (channel, tile) grid step of the fused bank correlator.

    Identical math to `_fused_kernel` but the channel dimension is the
    *leading grid axis* — the TPU answer to the reference's 3-D multi-satellite
    launch (`/root/reference/src/algorithms.jl:637-718`, grid z = satellite).
    Batching via the grid compiles once for any K, where `jax.vmap` of a
    `pallas_call` re-lowers the kernel per batch element (hours at K=64).
    """
    k = pl.program_id(0)
    i = pl.program_id(1)
    tile = tile_rows * LANES
    # Whole [K, 4] params table rides in SMEM (TPU SMEM blocks cannot be
    # split per grid step); each channel reads its own row.
    f_cyc = params_ref[k, 0]
    phi_cyc = params_ref[k, 1]
    rho = params_ref[k, 2]
    phi_code = params_ref[k, 3]
    ext_rows = tile_rows + halo_rows

    row = jax.lax.broadcasted_iota(jnp.int32, (ext_rows, LANES), 0).astype(jnp.float32)
    lane = jax.lax.broadcasted_iota(jnp.int32, (ext_rows, LANES), 1).astype(jnp.float32)
    m = (i * tile).astype(jnp.float32) + row * LANES + lane
    p = rho * m + phi_code
    lc = jnp.float32(code_length)
    p = p - lc * jnp.floor(p / lc)
    idx = jnp.clip(p.astype(jnp.int32), 0, code_length - 1)
    hi = jax.lax.div(idx, LANES)
    lo = jax.lax.rem(idx, LANES)

    # One-hot lane gather on the MXU in bf16 (exact: one-hot is 0/1, chips
    # are +/-1) with f32 accumulation.
    onehot = (
        lo[:, :, None]
        == jax.lax.broadcasted_iota(jnp.int32, (ext_rows, LANES, LANES), 2)
    ).astype(jnp.bfloat16)
    w = jax.lax.dot_general(
        onehot,
        code2d_ref[0].astype(jnp.bfloat16),
        (((2,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    sel = (
        hi[:, :, None]
        == jax.lax.broadcasted_iota(jnp.int32, (ext_rows, LANES, num_hi), 2)
    )
    rep = jnp.sum(jnp.where(sel, w, 0.0), axis=2)

    cos, sin = _carrier_tile(i, tile_rows, f_cyc, phi_cyc, tile=tile)
    sre = sre_ref[...]
    sim = sim_ref[...]
    dw_re = sre * cos + sim * sin
    dw_im = sim * cos - sre * sin

    @pl.when(i == 0)
    def _():
        outre_ref[...] = jnp.zeros_like(outre_ref)
        outim_ref[...] = jnp.zeros_like(outim_ref)

    num_ants = sre.shape[0]
    for l, delta in enumerate(deltas):
        tap = _flat_shift(rep, delta)[:tile_rows]
        s_re = jnp.sum((dw_re * tap).reshape(num_ants, -1), axis=1,
                       keepdims=True)
        s_im = jnp.sum((dw_im * tap).reshape(num_ants, -1), axis=1,
                       keepdims=True)
        outre_ref[0, :, l : l + 1] += s_re
        outim_ref[0, :, l : l + 1] += s_im


def prepare_bank_code_tiles_onehot(
    codes: jax.Array, prn: jax.Array, *, code_length: int
) -> jax.Array:
    """Per-channel padded code planes ``[K, ceil(Lc/128), 128]`` for the
    one-hot bank kernel. Hoist this out of `lax.scan` loops: inside a scan the
    channel PRNs ride the carry, so XLA re-gathers the table every block."""
    num_hi = pl.cdiv(code_length, LANES)
    code_cols = jnp.take(codes.T, jnp.asarray(prn), axis=0)        # [K, Lc]
    return _pad_to(code_cols, num_hi * LANES).reshape(
        prn.shape[0], num_hi, LANES
    )


def correlate_pallas_bank_onehot(
    signal_re: jax.Array,
    signal_im: jax.Array,
    codes: jax.Array,
    prn: jax.Array,
    carrier_frequency: jax.Array,
    sampling_frequency,
    carrier_phase: jax.Array,
    code_frequency: jax.Array,
    code_phase: jax.Array,
    sample_shifts: Sequence[int],
    code_length: int,
    tile_rows: int = 64,
    code_tiles: jax.Array | None = None,
) -> tuple[jax.Array, jax.Array]:
    """Fused EPL correlation of one shared front-end block against K channels.

    ``prn / carrier_frequency / carrier_phase / code_frequency / code_phase``
    are ``[K]`` arrays (one satellite channel each); ``signal_*`` is ``[N]`` or
    ``[A, N]`` shared by all channels. Returns ``[K, A, L]`` (or ``[K, L]``)
    accumulators. Any tap span (the replica halo scales with it). ``tile_rows``
    sets the time-tile (``tile_rows * 128`` samples per grid step) — large
    tiles amortize per-step fixed cost, the dominant term for the bank's
    K×tiles-step sequential grid.
    """
    span = int(max(sample_shifts)) - int(min(sample_shifts))
    halo_rows = _halo_rows_for_span(span)
    squeeze = signal_re.ndim == 1
    if squeeze:
        signal_re, signal_im = signal_re[None], signal_im[None]
    num_ants, num_samples = signal_re.shape
    num_taps = len(sample_shifts)
    d_min = int(min(sample_shifts))
    deltas = tuple(int(d) - d_min for d in sample_shifts)
    num_k = prn.shape[0]

    num_hi = pl.cdiv(code_length, LANES)
    if code_tiles is None:
        code_tiles = prepare_bank_code_tiles_onehot(
            codes, prn, code_length=code_length
        )
    code2d = code_tiles

    tile = tile_rows * LANES
    num_tiles = pl.cdiv(num_samples, tile)
    n_pad = num_tiles * tile
    sre = _pad_to(signal_re, n_pad).reshape(num_ants, -1, LANES)
    sim = _pad_to(signal_im, n_pad).reshape(num_ants, -1, LANES)

    rho = replica_ops.precise_div(code_frequency, sampling_frequency)
    params = jnp.stack(
        [
            jnp.asarray(carrier_frequency, jnp.float32)
            / jnp.float32(sampling_frequency),
            jnp.asarray(carrier_phase, jnp.float32) / jnp.float32(_TWO_PI),
            rho,
            jnp.asarray(code_phase, jnp.float32) + rho * jnp.float32(d_min),
        ],
        axis=-1,
    )                                                               # [K, 4]

    grid_spec = pl.GridSpec(
        grid=(num_k, num_tiles),
        in_specs=[
            pl.BlockSpec((num_k, 4), lambda k, i: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((num_ants, tile_rows, LANES), lambda k, i: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((num_ants, tile_rows, LANES), lambda k, i: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, num_hi, LANES), lambda k, i: (k, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, num_ants, num_taps), lambda k, i: (k, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, num_ants, num_taps), lambda k, i: (k, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
    )
    out_shape = (
        jax.ShapeDtypeStruct((num_k, num_ants, num_taps), jnp.float32),
        jax.ShapeDtypeStruct((num_k, num_ants, num_taps), jnp.float32),
    )
    kernel = functools.partial(
        _bank_kernel, deltas=deltas, code_length=int(code_length),
        num_hi=int(num_hi), tile_rows=int(tile_rows),
        halo_rows=halo_rows,
    )
    acc_re, acc_im = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shape,
        interpret=_interpret(),
    )(params, sre, sim, code2d)
    if squeeze:
        acc_re, acc_im = acc_re[:, 0], acc_im[:, 0]
    return acc_re, acc_im


# ---------------------------------------------------------------------------
# Kernel D: transition-matmul bank — per-chip work instead of per-sample gather
# ---------------------------------------------------------------------------


def _bank_transition_kernel(
    params_ref, base_ref, *refs,
    deltas: tuple, code_length: int, tile_rows: int, num_c: int,
    rho_nom: float, fcar_nom_cyc: float, chans_per_step: int = 1,
    mm_dtype=jnp.bfloat16, tap_mac: str = "mxu", carrier: str = "hybrid",
    recon: str = "onehot",
):
    """One (channel, tile) step of the transition-formulation bank correlator.

    The replica is *piecewise constant*: at < 1 chip/sample it changes value
    only at ~``rho * tile`` chip boundaries per tile. Instead of gathering a
    chip per sample (the one-hot kernels — per-SAMPLE work that dominated the
    profile), this kernel does per-CHIP work:

    1. align the channel's tiled code so chip ``c0`` (the tile's first chip)
       sits at flat position 0. The dynamic shift is built from compare-
       generated permutation matrices multiplied on the MXU — Mosaic handles
       dynamic *compares* everywhere, where dynamic `pltpu.roll` shifts hang
       its compiler on this toolchain. This is the TPU register-file
       replacement for the texture unit's wrapped fetch
       (`/root/reference/src/algorithms.jl:72`).
    2. compute each chip's first-sample boundary ``t_c = ceil((c - frac)/rho)``
       and the chip-value steps ``delta_c`` (vectors of length C ~ hundreds),
    3. reconstruct ``rep[r, l] = sum_c delta_c * (128 r + l >= t_c)`` with the
       split ``(r > rt_c) + (r == rt_c)(l >= lt_c)`` as one ``[E, C] x [C,
       128]`` MXU matmul plus a row reduction.

    Everything per-sample that remains is the carrier wipe-off and tap MAC.
    """
    if carrier == "hoisted":
        (rowcos_ref, rowsin_ref, lanecos_ref, lanesin_ref,
         sre_ref, sim_ref, codecol_ref, outre_ref, outim_ref) = refs
        phasors = (rowcos_ref, rowsin_ref, lanecos_ref, lanesin_ref)
    elif carrier == "hybrid":
        (lanecos_ref, lanesin_ref,
         sre_ref, sim_ref, codecol_ref, outre_ref, outim_ref) = refs
        phasors = (lanecos_ref, lanesin_ref)
    else:
        sre_ref, sim_ref, codecol_ref, outre_ref, outim_ref = refs
        phasors = None
    k = pl.program_id(0)
    i = pl.program_id(1)
    tile = tile_rows * LANES
    ext = tile_rows + 1
    num_e = (ext + 7) // 8 * 8
    cr = num_c // LANES
    lc = jnp.float32(code_length)

    @pl.when(i == 0)
    def _():
        outre_ref[...] = jnp.zeros_like(outre_ref)
        outim_ref[...] = jnp.zeros_like(outim_ref)

    sre = sre_ref[...]
    sim = sim_ref[...]
    num_ants = sre.shape[0]

    # The grid batches `chans_per_step` channels per step (unrolled below):
    # per-step fixed cost (scalar reads, small-matmul latency, serial
    # dependency chains) amortizes over the batch and the independent
    # per-channel chains give Mosaic ILP to pipeline.
    for g in range(chans_per_step):
        ch = k * chans_per_step + g
        _transition_channel(
            params_ref, base_ref, sre, sim, codecol_ref, outre_ref,
            outim_ref, ch, g, i, deltas=deltas, code_length=code_length,
            tile_rows=tile_rows, num_c=num_c, rho_nom=rho_nom,
            fcar_nom_cyc=fcar_nom_cyc, num_ants=num_ants, ext=ext,
            num_e=num_e, cr=cr, tile=tile, lc=lc, mm_dtype=mm_dtype,
            tap_mac=tap_mac, phasors=phasors, recon=recon,
        )


def _transition_channel(
    params_ref, base_ref, sre, sim, codecol_ref, outre_ref, outim_ref,
    ch, g, i, *, deltas, code_length, tile_rows, num_c, rho_nom,
    fcar_nom_cyc, num_ants, ext, num_e, cr, tile, lc, mm_dtype=jnp.bfloat16,
    tap_mac="mxu", phasors=None, recon="onehot",
):
    f_cyc = params_ref[ch, 0]
    phi_cyc = params_ref[ch, 1]
    rho = params_ref[ch, 2]
    phi_code = params_ref[ch, 3]

    # Per-tile phase advance: static f64-exact nominal base + tiny residual.
    n0 = (i * tile).astype(jnp.float32)
    phi_car_tile = phi_cyc + base_ref[i, 0] + (f_cyc - jnp.float32(fcar_nom_cyc)) * n0
    p = phi_code + base_ref[i, 1] + (rho - jnp.float32(rho_nom)) * n0
    p = p - lc * jnp.floor(p / lc)                    # [0, Lc)
    c0 = p.astype(jnp.int32)                          # first chip of the tile
    frac = p - c0.astype(jnp.float32)                 # [0, 1)
    q = jax.lax.div(c0, LANES)
    r = jax.lax.rem(c0, LANES)

    # 1. Align the code window: flat shift by c0 = 128 q + r as two
    # permutation matmuls + a carry select (see _flat_shift for the static
    # analog). All dynamic dependence is scalar compares. All matmuls in this
    # kernel run bf16 with f32 accumulation: operands are exact small integers
    # (codes +/-1, permutation/step masks 0/1, chip deltas in {-2,0,2}), so
    # bf16 is bit-exact while the MXU runs ~6-8x faster than f32 passes.
    code2d = codecol_ref[g]                                     # [CRT, 128]
    crt = code2d.shape[0]
    lane_diff = jax.lax.rem(
        jax.lax.broadcasted_iota(jnp.int32, (LANES, LANES), 0)
        - jax.lax.broadcasted_iota(jnp.int32, (LANES, LANES), 1)
        + LANES,
        LANES,
    )
    q_lane = (lane_diff == r).astype(mm_dtype)              # [128, 128]
    y = jax.lax.dot_general(
        code2d.astype(mm_dtype), q_lane, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )                                                           # [CRT, 128]
    row_diff = (
        jax.lax.broadcasted_iota(jnp.int32, (crt, crt), 1)
        - jax.lax.broadcasted_iota(jnp.int32, (crt, crt), 0)
    )
    p_row = (row_diff == q).astype(mm_dtype)                # [CRT, CRT]
    a1 = jax.lax.dot_general(
        p_row, y.astype(mm_dtype), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )[: cr + 1]                                                 # [CR+1, 128]
    a2 = jnp.concatenate([a1[1:], jnp.zeros_like(a1[:1])], axis=0)
    lane_i = jax.lax.broadcasted_iota(jnp.int32, (cr + 1, LANES), 1)
    aligned = jnp.where(lane_i < LANES - r, a1, a2)             # flat win

    # 2. Chip-value steps delta_c (flat right-shift by one: static rolls).
    prev_l = pltpu.roll(aligned, 1, axis=1)
    prev_r = pltpu.roll(aligned, 1, axis=0)
    prev_r = pltpu.roll(prev_r, 1, axis=1)
    prev = jnp.where(lane_i == 0, prev_r, prev_l)
    flat_c = jax.lax.broadcasted_iota(jnp.int32, (cr + 1, LANES), 0) * LANES + lane_i
    delta2d = jnp.where(flat_c == 0, aligned, aligned - prev)[:cr]   # [CR, 128]

    # delta into lane layout [1, C] via CR selection matmuls
    # (direct [CR,128] -> [1, C] relayout is an unsupported shape cast).
    sel_lane = jax.lax.broadcasted_iota(jnp.int32, (LANES, num_c), 0)
    sel_chip = jax.lax.broadcasted_iota(jnp.int32, (LANES, num_c), 1)
    parts = []
    for a in range(cr):
        sel = (sel_chip == a * LANES + sel_lane).astype(mm_dtype)  # [128, C]
        parts.append(
            jax.lax.dot_general(
                delta2d[a : a + 1].astype(mm_dtype), sel,
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        )
    delta_lane = sum(parts)                                     # [1, C]

    # 3. Chip boundaries (pure index math, computed per needed layout).
    inv_rho = 1.0 / rho

    def bounds(c_idx):
        t = jnp.ceil((c_idx.astype(jnp.float32) - frac) * inv_rho)
        t = jnp.where(c_idx == 0, 0.0, t)
        t = jnp.clip(t, 0.0, jnp.float32(num_e * LANES)).astype(jnp.int32)
        return jax.lax.div(t, LANES), jax.lax.rem(t, LANES)

    if recon == "onehot":
        # 4. Reconstruct the replica with NO [*, 1]-layout index math and no
        # duplicated [E, C] masks: boundaries live only in [1, C] lane layout
        # (9 vregs at C~1152, vs 144 near-empty ones for a [C, 1] column),
        # scattered to rows/lanes by one-hot matmuls on the MXU:
        #   G[m, m2] = sum_c delta_c (rt_c == m)(lt_c == m2)   [ME, 128]
        #   rep[e, l] = sum_m (e > m) W[m]  +  (G @ U)[e, l]
        # with W[m] = sum_c delta_c (rt_c == m) and U[m2, l] = (l >= m2).
        # All operands are exact small integers in bf16 (delta in {-2,0,2},
        # masks 0/1, per-row delta sums bounded by 2*128).
        rt_lane, lt_lane = bounds(
            jax.lax.broadcasted_iota(jnp.int32, (1, num_c), 1)
        )                                                       # [1, C] each
        num_m = num_e + 8                                       # rt in 0..num_e
        ohrt = (
            jax.lax.broadcasted_iota(jnp.int32, (num_m, num_c), 0) == rt_lane
        )
        a_mm = (ohrt * delta_lane).astype(mm_dtype)             # [ME, C]
        # One-hot lt rows 0..127 + a ones row at 128 (W = per-row delta sums
        # rides the same matmul; a separate [ME,1] bf16 matvec trips the
        # Mosaic vector.broadcast verification bug).
        mb = jax.lax.broadcasted_iota(jnp.int32, (LANES + 8, num_c), 0)
        b_mat = ((mb == lt_lane) | (mb == LANES)).astype(mm_dtype)
        gw = jax.lax.dot_general(
            a_mm, b_mat, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )                                                       # [ME, 136]
        u_mat = (
            jax.lax.broadcasted_iota(jnp.int32, (LANES, LANES), 1)
            >= jax.lax.broadcasted_iota(jnp.int32, (LANES, LANES), 0)
        ).astype(mm_dtype)                                      # [m2, l]
        h_mat = jax.lax.dot_general(
            gw[:, :LANES].astype(mm_dtype), u_mat, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )                                                       # [ME, 128]
        vg = (
            jax.lax.broadcasted_iota(jnp.int32, (num_e, num_m), 0)
            > jax.lax.broadcasted_iota(jnp.int32, (num_e, num_m), 1)
        ).astype(mm_dtype)                                      # [E, ME]
        # W (+7 zero columns) -> 8-wide matmul, column 0 (matvec bug again).
        g_rows = jax.lax.dot_general(
            vg, gw[:, LANES:].astype(mm_dtype), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )[:, :1]                                                # [E, 1]
        rep = (g_rows + h_mat[:num_e])[:ext]                    # [ext, 128]
    else:
        # Mask variant (audit / A-B baseline): [E, C] compare masks + a
        # [C, 1]-layout boundary pass.
        rt_lane, _ = bounds(jax.lax.broadcasted_iota(jnp.int32, (1, num_c), 1))
        _, lt_col = bounds(jax.lax.broadcasted_iota(jnp.int32, (num_c, 1), 0))

        r_sub = jax.lax.broadcasted_iota(jnp.int32, (num_e, 1), 0)
        ge = (r_sub > rt_lane).astype(jnp.float32)              # [E, C]
        eq = (r_sub == rt_lane).astype(jnp.float32)
        # NOTE: an MXU matvec ([E,C] x [1,C] contract C, bf16) for g_rows hits
        # a Mosaic verification bug (vector.broadcast bf16->f32); VPU mult+red.
        g_rows = jnp.sum(ge * delta_lane, axis=1, keepdims=True)  # [E, 1]
        me = eq * delta_lane                                    # [E, C]
        l_lane = jax.lax.broadcasted_iota(jnp.int32, (1, LANES), 1)
        lstep = (l_lane >= lt_col).astype(mm_dtype)             # [C, 128]
        h = jax.lax.dot_general(
            me.astype(mm_dtype), lstep, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )                                                       # [E, 128]
        rep = (g_rows + h)[:ext]                                # [ext, 128]

    # Carrier wipe-off + tap MAC (the per-sample floor of the pipeline).
    if phasors is not None and len(phasors) == 4:
        # Fully hoisted carrier (legacy): row phasors ride HBM as
        # [K, tiles, TR, 1] — NOTE the trailing unit dim makes XLA pad them
        # 128x ("hybrid" avoids this and is the default).
        rowcos_ref, rowsin_ref, lanecos_ref, lanesin_ref = phasors
        rc = rowcos_ref[g, 0]                                   # [TR, 1]
        rs = rowsin_ref[g, 0]
        lcos = lanecos_ref[g, 0:1, :]                           # [1, 128]
        lsin = lanesin_ref[g, 0:1, :]
        cos = rc * lcos - rs * lsin
        sin = rs * lcos + rc * lsin
    elif phasors is not None:
        # Hybrid: dense hoisted lane phasors + in-kernel row phasors (one
        # cos/sin over a [TR, 1] column per channel).
        lanecos_ref, lanesin_ref = phasors
        row_f = jax.lax.broadcasted_iota(
            jnp.int32, (tile_rows, 1), 0
        ).astype(jnp.float32) * jnp.float32(LANES)
        cyc = f_cyc * row_f + phi_car_tile
        cyc = cyc - jnp.floor(cyc)
        theta = jnp.float32(_TWO_PI) * cyc
        rc, rs = jnp.cos(theta), jnp.sin(theta)                 # [TR, 1]
        lcos = lanecos_ref[g, 0:1, :]                           # [1, 128]
        lsin = lanesin_ref[g, 0:1, :]
        cos = rc * lcos - rs * lsin
        sin = rs * lcos + rc * lsin
    else:
        cos, sin = _carrier_tile(
            jnp.int32(0), tile_rows, f_cyc, phi_car_tile, tile=tile
        )
    dw_re = sre * cos + sim * sin
    dw_im = sim * cos - sre * sin

    if tap_mac == "mxu":
        # Tap MAC as ONE MXU contraction [A, T] x [L, T] -> [A, L] (the
        # ablation showed per-channel VPU lane reductions dominating the
        # whole kernel: 6 x 32k-element jnp.sums per channel; the MXU does
        # the multiply-accumulate in its pipeline instead).
        taps = jnp.stack(
            [_flat_shift(rep, delta)[:tile_rows] for delta in deltas], axis=0
        ).reshape(len(deltas), tile)                            # [L, T]
        dw_re2 = dw_re.reshape(num_ants, tile)
        dw_im2 = dw_im.reshape(num_ants, tile)
        acc_re = jax.lax.dot_general(
            dw_re2, taps, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )                                                       # [A, L]
        acc_im = jax.lax.dot_general(
            dw_im2, taps, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        outre_ref[g] += acc_re
        outim_ref[g] += acc_im
        return
    # VPU variant (audit / A-B baseline): per-tap elementwise mult + reduce.
    for l, delta in enumerate(deltas):
        tap = _flat_shift(rep, delta)[:tile_rows]
        s_re = jnp.sum((dw_re * tap).reshape(num_ants, -1), axis=1,
                       keepdims=True)
        s_im = jnp.sum((dw_im * tap).reshape(num_ants, -1), axis=1,
                       keepdims=True)
        outre_ref[g, :, l : l + 1] += s_re
        outim_ref[g, :, l : l + 1] += s_im


def _hoisted_carrier(
    params: jax.Array,
    base: jax.Array,
    num_tiles: int,
    tile_rows: int,
    fcar_nom_cyc: float,
    g: int,
) -> tuple[list, list]:
    """Hoisted per-(channel, tile) carrier phasors + their block specs.

    Row/lane carrier phasors for every (channel, tile), computed by XLA at
    full vector-lane utilization and DMA'd per grid step (~1 KB). Same f32
    phase decomposition as the in-kernel path: f64-exact nominal base per tile
    + small residual. In-kernel cos/sin on a ``[tile_rows, 1]`` vector would
    waste 127/128 lanes of every transcendental.
    """
    tile = tile_rows * LANES
    f_cyc_k = params[:, 0]                                   # [Kp]
    phi_cyc_k = params[:, 1]
    n0_t = jnp.arange(num_tiles, dtype=jnp.float32) * jnp.float32(tile)
    phi_tile = (
        phi_cyc_k[:, None]
        + base[None, :, 0]
        + (f_cyc_k - jnp.float32(fcar_nom_cyc))[:, None] * n0_t[None, :]
    )                                                        # [Kp, tiles]
    row = jnp.arange(tile_rows, dtype=jnp.float32) * jnp.float32(LANES)
    cyc_row = (
        f_cyc_k[:, None, None] * row[None, None, :]
        + phi_tile[:, :, None]
    )
    cyc_row = cyc_row - jnp.floor(cyc_row)
    theta_row = jnp.float32(_TWO_PI) * cyc_row               # [Kp,T,R]
    lane = jnp.arange(LANES, dtype=jnp.float32)
    cyc_lane = f_cyc_k[:, None] * lane[None, :]
    theta_lane = jnp.float32(_TWO_PI) * (cyc_lane - jnp.floor(cyc_lane))
    # Lane blocks are padded to 8 sublanes (hardware lowering requires the
    # sublane block dim divisible by 8); row 0 carries the phasor.
    lane_pad = (
        lambda x: jnp.broadcast_to(x[:, None, :], (x.shape[0], 8, LANES))
    )
    extra_inputs = [
        jnp.cos(theta_row)[..., None],                       # [Kp,T,R,1]
        jnp.sin(theta_row)[..., None],
        lane_pad(jnp.cos(theta_lane)),                       # [Kp,8,128]
        lane_pad(jnp.sin(theta_lane)),
    ]
    row_spec = pl.BlockSpec(
        (g, 1, tile_rows, 1), lambda k, i: (k, i, 0, 0),
        memory_space=pltpu.VMEM,
    )
    lane_spec = pl.BlockSpec(
        (g, 8, LANES), lambda k, i: (k, 0, 0), memory_space=pltpu.VMEM
    )
    return extra_inputs, [row_spec, row_spec, lane_spec, lane_spec]


def _hoisted_lane_phasors(params: jax.Array, g: int) -> tuple[list, list]:
    """Lane-phasor-only hoisting: dense ``[Kp, 8, 128]`` cos/sin blocks.

    Row phasors must NOT be hoisted as ``[Kp, tiles, TR, 1]``: the trailing
    unit minor dim makes XLA pad the last two dims to (8, 128) tiles — a 128x
    HBM blow-up (~134 MB per call at K=1024, N=32768) that was measured to
    dominate the whole bank kernel. Rows are cheap to generate in-kernel
    (one cos/sin over a [TR, 1] column); only the lane phasors ride HBM.
    """
    f_cyc_k = params[:, 0]                                   # [Kp]
    lane = jnp.arange(LANES, dtype=jnp.float32)
    cyc_lane = f_cyc_k[:, None] * lane[None, :]
    theta_lane = jnp.float32(_TWO_PI) * (cyc_lane - jnp.floor(cyc_lane))
    lane_pad = (
        lambda x: jnp.broadcast_to(x[:, None, :], (x.shape[0], 8, LANES))
    )
    extra_inputs = [
        lane_pad(jnp.cos(theta_lane)),                       # [Kp, 8, 128]
        lane_pad(jnp.sin(theta_lane)),
    ]
    lane_spec = pl.BlockSpec(
        (g, 8, LANES), lambda k, i: (k, 0, 0), memory_space=pltpu.VMEM
    )
    return extra_inputs, [lane_spec, lane_spec]


def _transition_geometry(
    num_samples: int,
    tile_rows: int,
    sampling_frequency: float,
    code_length: int,
    nominal_code_frequency: float | None,
    max_chips_per_sample: float | None,
) -> tuple[int, int, int]:
    """Static tile geometry of the transition bank kernel.

    Returns ``(tile_rows, num_c, crt)``: the clamped time-tile row count, the
    per-tile chip-window width (lane-padded), and the row count of the tiled
    per-channel code table. Shared by the kernel wrapper and
    `prepare_bank_code_tiles` so hoisted tables always match.

    The kernel's scratch tensors scale as ``[tile_rows, num_c]`` with
    ``num_c ~ chips_per_sample * tile_rows * 128``, i.e. quadratically in the
    tile — at L5's 0.31 chips/sample a 256-row tile needs a ~10k-chip window
    and blows the 16 MB scoped-VMEM limit on real hardware. The tile is
    therefore additionally capped so the chip window stays <= ``MAX_WINDOW_CHIPS``
    (no-op for L1-class chip rates).
    """
    tile_rows = min(tile_rows, pl.cdiv(num_samples, LANES))
    if max_chips_per_sample is None:
        max_chips_per_sample = (
            float(nominal_code_frequency) / float(sampling_frequency) * 1.001
            if nominal_code_frequency is not None
            else 0.65
        )
    if max_chips_per_sample >= 1.0:
        raise ValueError("transition kernel requires < 1 chip per sample")
    max_ext = int(MAX_WINDOW_CHIPS / (max_chips_per_sample * LANES))
    tile_rows = max(8, min(tile_rows, (max_ext - 1) // 8 * 8))
    ext = tile_rows + 1
    num_c = (
        (int(math.ceil(max_chips_per_sample * ext * LANES)) + 2 + LANES - 1)
        // LANES * LANES
    )
    crt = (code_length + num_c + 2 + LANES - 1) // LANES
    return tile_rows, num_c, crt


def prepare_bank_code_tiles(
    codes: jax.Array,
    prn: jax.Array,
    *,
    code_length: int,
    num_samples: int,
    sampling_frequency: float,
    tile_rows: int = 256,
    nominal_code_frequency: float | None = None,
    max_chips_per_sample: float | None = None,
) -> jax.Array:
    """Per-channel tiled code tables ``[K, crt, 128]`` for the transition bank.

    For K=1024 GPS L1 channels this is ~5.7 MB of gather+tile work; inside a
    `lax.scan` tracking loop the PRNs ride the carry and XLA rebuilds it every
    block — hoist it once per run and pass it as ``code_tiles``. Geometry
    arguments must match the later `correlate_pallas_bank` call.
    """
    _, _, crt = _transition_geometry(
        num_samples, tile_rows, float(sampling_frequency), code_length,
        nominal_code_frequency, max_chips_per_sample,
    )
    code_cols = jnp.take(codes.T, jnp.asarray(prn), axis=0)       # [K, Lc]
    reps_needed = math.ceil(crt * LANES / code_length)
    codecol = jnp.tile(code_cols, (1, reps_needed))[:, : crt * LANES]
    return codecol.reshape(prn.shape[0], crt, LANES)


def correlate_pallas_bank(
    signal_re: jax.Array,
    signal_im: jax.Array,
    codes: jax.Array,
    prn: jax.Array,
    carrier_frequency: jax.Array,
    sampling_frequency,
    carrier_phase: jax.Array,
    code_frequency: jax.Array,
    code_phase: jax.Array,
    sample_shifts: Sequence[int],
    code_length: int,
    tile_rows: int = 256,
    nominal_code_frequency: float | None = None,
    nominal_carrier_frequency: float = 0.0,
    max_chips_per_sample: float | None = None,
    code_tiles: jax.Array | None = None,
    chans_per_step: int = 1,
    matmul_dtype=jnp.bfloat16,
    tap_mac: str = "mxu",
    carrier: str = "hybrid",
    recon: str = "onehot",
) -> tuple[jax.Array, jax.Array]:
    """Transition-formulation fused EPL bank correlator (flagship kernel).

    Same contract as the one-hot bank (`correlate_pallas_bank_onehot`): one
    shared ``[N]`` / ``[A, N]`` front-end block against ``[K]`` channels,
    ``[K, (A,) L]`` accumulators, tap span < 128 samples, chip rate strictly
    below one chip per sample. ``sampling_frequency`` must be static.
    ``nominal_code_frequency`` (static) seeds f64-exact per-tile phase tables
    and sizes the per-tile chip window; when omitted, the window is sized for
    ``max_chips_per_sample`` (default 0.65) and nominal-phase rebasing is
    disabled (full f32 phase accumulation — fine below ~2^17 samples).
    """
    span = int(max(sample_shifts)) - int(min(sample_shifts))
    if span >= LANES:
        raise ValueError(
            f"tap span {span} >= {LANES}; use the XLA bank path for wide spans"
        )
    squeeze = signal_re.ndim == 1
    if squeeze:
        signal_re, signal_im = signal_re[None], signal_im[None]
    num_ants, num_samples = signal_re.shape
    num_taps = len(sample_shifts)
    d_min = int(min(sample_shifts))
    deltas = tuple(int(d) - d_min for d in sample_shifts)
    num_k = prn.shape[0]
    fs = float(sampling_frequency)

    tile_rows, num_c, crt = _transition_geometry(
        num_samples, tile_rows, fs, code_length,
        nominal_code_frequency, max_chips_per_sample,
    )
    tile = tile_rows * LANES
    ext = tile_rows + 1
    # Tiled code, flat lane-major [CRT, 128], long enough that a flat shift by
    # any c0 < code_length plus C window reads never leaves the array.
    if code_tiles is None:
        code_tiles = prepare_bank_code_tiles(
            codes, prn, code_length=code_length, num_samples=num_samples,
            sampling_frequency=fs, tile_rows=tile_rows,
            nominal_code_frequency=nominal_code_frequency,
            max_chips_per_sample=max_chips_per_sample,
        )
    elif code_tiles.shape[1] != crt:
        raise ValueError(
            f"code_tiles rows {code_tiles.shape[1]} != expected {crt}; "
            "prepare_bank_code_tiles geometry must match the kernel call"
        )
    codecol = code_tiles

    num_tiles = pl.cdiv(num_samples, tile)
    n_pad = num_tiles * tile
    sre = _pad_to(signal_re, n_pad).reshape(num_ants, -1, LANES)
    sim = _pad_to(signal_im, n_pad).reshape(num_ants, -1, LANES)

    rho_nom = (
        float(nominal_code_frequency) / fs
        if nominal_code_frequency is not None
        else 0.0
    )
    fcar_nom_cyc = float(nominal_carrier_frequency) / fs
    import numpy as _np

    t_idx = _np.arange(num_tiles, dtype=_np.float64) * tile
    base = _np.stack(
        [
            _np.mod(fcar_nom_cyc * t_idx, 1.0),
            _np.mod(rho_nom * t_idx, float(code_length)),
        ],
        axis=-1,
    )
    base = jnp.asarray(base, jnp.float32)                        # [tiles, 2]

    rho = replica_ops.precise_div(code_frequency, fs)
    params = jnp.stack(
        [
            jnp.asarray(carrier_frequency, jnp.float32) / jnp.float32(fs),
            jnp.asarray(carrier_phase, jnp.float32) / jnp.float32(_TWO_PI),
            rho,
            jnp.asarray(code_phase, jnp.float32) + rho * jnp.float32(d_min),
        ],
        axis=-1,
    )                                                            # [K, 4]

    # Channel batching: pad K up to a multiple of `chans_per_step` by
    # repeating channel 0 (valid params — padded outputs are sliced off).
    g = max(int(chans_per_step), 1)
    num_kp = pl.cdiv(num_k, g) * g
    if num_kp != num_k:
        pad = ((0, num_kp - num_k),)
        params = jnp.pad(params, pad + ((0, 0),), mode="edge")
        codecol = jnp.pad(codecol, pad + ((0, 0), (0, 0)), mode="edge")

    extra_inputs = []
    extra_specs = []
    if carrier == "hoisted":
        extra_inputs, extra_specs = _hoisted_carrier(
            params, base, num_tiles, tile_rows, fcar_nom_cyc, g
        )
    elif carrier == "hybrid":
        extra_inputs, extra_specs = _hoisted_lane_phasors(params, g)

    grid_spec = pl.GridSpec(
        grid=(num_kp // g, num_tiles),
        in_specs=[
            pl.BlockSpec((num_kp, 4), lambda k, i: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((num_tiles, 2), lambda k, i: (0, 0),
                         memory_space=pltpu.SMEM),
            *extra_specs,
            pl.BlockSpec((num_ants, tile_rows, LANES), lambda k, i: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((num_ants, tile_rows, LANES), lambda k, i: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((g, crt, LANES), lambda k, i: (k, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((g, num_ants, num_taps), lambda k, i: (k, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((g, num_ants, num_taps), lambda k, i: (k, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
    )
    out_shape = (
        jax.ShapeDtypeStruct((num_kp, num_ants, num_taps), jnp.float32),
        jax.ShapeDtypeStruct((num_kp, num_ants, num_taps), jnp.float32),
    )
    kernel = functools.partial(
        _bank_transition_kernel,
        deltas=deltas, code_length=int(code_length),
        tile_rows=int(tile_rows), num_c=int(num_c),
        rho_nom=rho_nom, fcar_nom_cyc=fcar_nom_cyc, chans_per_step=g,
        mm_dtype=matmul_dtype, tap_mac=tap_mac, carrier=carrier, recon=recon,
    )
    acc_re, acc_im = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shape,
        interpret=_interpret(),
    )(params, base, *extra_inputs, sre, sim, codecol)
    acc_re, acc_im = acc_re[:num_k], acc_im[:num_k]
    if squeeze:
        acc_re, acc_im = acc_re[:, 0], acc_im[:, 0]
    return acc_re, acc_im


# ---------------------------------------------------------------------------
# Kernel E: per-row boundary bank — per-ROW gather + J boundary MACs
# ---------------------------------------------------------------------------


def _rows_geometry(
    num_samples: int,
    tile_rows: int,
    sampling_frequency: float,
    code_length: int,
    nominal_code_frequency: float | None,
    max_chips_per_sample: float | None,
    halo_rows: int = 1,
) -> tuple[int, int, int]:
    """Static geometry of the per-row bank kernel: ``(tile_rows, num_j, crt)``.

    ``num_j`` = max distinct chips one 128-sample row can touch (+1 safety);
    ``crt`` = rows of the tiled per-channel code table, provisioned so every
    flat read ``code[c + j]`` for any in-tile chip ``c`` stays in valid rows
    (the last table row is `_flat_shift` halo garbage and is never selected).
    ``halo_rows`` = replica lookahead rows past the tile (``span // 128 + 1``
    for the scenario's tap span — wide spans at L1 fs >= 131 MHz need > 1).
    """
    tile_rows = min(tile_rows, pl.cdiv(num_samples, LANES))
    tile_rows = max(8, tile_rows // 8 * 8)
    if max_chips_per_sample is None:
        max_chips_per_sample = (
            float(nominal_code_frequency) / float(sampling_frequency) * 1.001
            if nominal_code_frequency is not None
            else 0.65
        )
    if max_chips_per_sample >= 1.0:
        raise ValueError("rows kernel requires < 1 chip per sample")
    # Distinct chips a 128-sample row can touch: floor(127*rho) + 2 (partial
    # chips at both ends); num_j = that count (boundary MACs run j=1..num_j-1).
    num_j = int(math.floor(max_chips_per_sample * (LANES - 1))) + 2
    e8 = (tile_rows + halo_rows + 7) // 8 * 8
    chips_max = int(math.ceil(max_chips_per_sample * e8 * LANES)) + 2
    crt = (code_length - 1 + chips_max + num_j + 2 * LANES) // LANES + 1
    if num_j > 24:
        raise ValueError(
            f"rows kernel needs num_j={num_j} chips/row; use pallas_bank for"
            " chip rates above ~0.17 chips/sample"
        )
    return tile_rows, num_j, crt


def prepare_bank_code_tiles_rows(
    codes: jax.Array,
    prn: jax.Array,
    *,
    code_length: int,
    num_samples: int,
    sampling_frequency: float,
    tile_rows: int = 256,
    nominal_code_frequency: float | None = None,
    max_chips_per_sample: float | None = None,
    tap_span: int = 0,
) -> jax.Array:
    """Per-channel tiled code tables ``[K, crt, 128]`` for the rows kernel.

    Hoist out of `lax.scan` tracking loops like `prepare_bank_code_tiles`.
    ``tap_span`` = ``max(sample_shifts) - min(sample_shifts)`` of the kernel
    call the tiles feed (affects the table size for wide spans).
    """
    _, _, crt = _rows_geometry(
        num_samples, tile_rows, float(sampling_frequency), code_length,
        nominal_code_frequency, max_chips_per_sample,
        halo_rows=_halo_rows_for_span(tap_span),
    )
    code_cols = jnp.take(codes.T, jnp.asarray(prn), axis=0)       # [K, Lc]
    reps_needed = math.ceil(crt * LANES / code_length)
    codecol = jnp.tile(code_cols, (1, reps_needed))[:, : crt * LANES]
    return codecol.reshape(prn.shape[0], crt, LANES)


def _group_lanes_vec(vals) -> jax.Array:
    """Pack per-channel scalars into a lane vector ``[1, G]``."""
    return jnp.concatenate(
        [jnp.full((1, 1), v, jnp.float32) for v in vals], axis=1
    )


def _row_chip_setup(
    params_ref, base_ref, k, i, n0, n_row, *, num_g: int, num_j: int,
    crt: int, lc, rho_nom: float,
):
    """Lane-packed per-row chip indices + boundary lanes for a channel group.

    Shared by the rows and composite bank kernels. Per-channel scalars ride
    the scalar unit; all row/boundary vectors are lane-packed so the vector
    cost amortizes over the group: returns ``(q_all, l_all, b_all)`` — the
    ``[e8, G]`` row/lane digits of each row's first chip and the
    ``[e8, (J-1)*G]`` in-row boundary lanes (j-major blocks) where chip
    ``c_r + j`` begins (exact ceil arithmetic, the TPU re-derivation of the
    reference's texture wrap + nearest-neighbour fetch,
    `/root/reference/src/algorithms.jl:72`).
    """
    p_list, rho_list, inv_list = [], [], []
    for g in range(num_g):
        ch = k * num_g + g
        rho_s = params_ref[ch, 2]
        p_s = (
            params_ref[ch, 3]
            + base_ref[i, 1]
            + (rho_s - jnp.float32(rho_nom)) * n0
        )
        p_s = p_s - lc * jnp.floor(p_s / lc)          # [0, Lc) scalar
        p_list.append(p_s)
        rho_list.append(rho_s)
        inv_list.append(1.0 / rho_s)

    p_v = _group_lanes_vec(p_list)                    # [1, G]
    rho_v = _group_lanes_vec(rho_list)
    inv_v = _group_lanes_vec(inv_list)
    c_all = jnp.floor(n_row * rho_v + p_v)            # [e8, G] f32
    ci_all = jnp.minimum(
        c_all.astype(jnp.int32), jnp.int32((crt - 1) * LANES - 1)
    )
    q_all = jax.lax.div(ci_all, LANES)                # [e8, G]
    l_all = jax.lax.rem(ci_all, LANES)
    nj1 = num_j - 1
    c_t = pltpu.repeat(c_all, nj1, axis=1)            # [e8, (J-1)G]
    p_t = pltpu.repeat(p_v, nj1, axis=1)
    inv_t = pltpu.repeat(inv_v, nj1, axis=1)
    j_t = (
        jax.lax.broadcasted_iota(jnp.int32, (1, nj1 * num_g), 1)
        // num_g
        + 1
    ).astype(jnp.float32)
    b_all = jnp.ceil((c_t + j_t - p_t) * inv_t) - n_row  # [e8, (J-1)G]
    return q_all, l_all, b_all


def _group_lane_phasors(params_ref, k, *, num_g: int):
    """In-kernel carrier lane phasors ``[G, 128]`` cos/sin for a group.

    ``lane_phasor[g, l] = exp(2 pi i frac(f_cyc_g * l))``. Unlike row phasors
    (a ``[TR, 1]`` column), the lane phasor is a full 128-lane vector, so the
    in-kernel transcendental runs at full lane utilization — and computing it
    here removes the per-block XLA rebuild + per-step DMA of hoisted
    ``[K, 8, 128]`` phasor planes from the closed-loop scan (Doppler changes
    every block, so those planes can never be hoisted out of the loop).
    """
    fc_col = jnp.concatenate(
        [
            jnp.full((1, 1), params_ref[k * num_g + g, 0], jnp.float32)
            for g in range(num_g)
        ],
        axis=0,
    )                                                     # [G, 1]
    lane = jax.lax.broadcasted_iota(
        jnp.int32, (num_g, LANES), 1
    ).astype(jnp.float32)
    cyc = fc_col * lane
    theta = jnp.float32(_TWO_PI) * (cyc - jnp.floor(cyc))
    return jnp.cos(theta), jnp.sin(theta)                 # [G, 128]


def _group_row_phasors(
    params_ref, base_ref, k, i, n0, n_row, *, num_g: int,
    fcar_nom_cyc: float, rows: int,
):
    """In-kernel carrier row phasors for a channel group: ``[rows, G]``
    cos/sin, one transcendental pass covering the whole group. Hoisting
    through HBM is ruled out: ``[*, TR, 1]`` arrays get padded 128x by XLA's
    minor-dim tiling (measured as the dominant kernel cost in round 2)."""
    fc_list, ph_list = [], []
    for g in range(num_g):
        ch = k * num_g + g
        f_cyc = params_ref[ch, 0]
        fc_list.append(f_cyc)
        ph_list.append(
            params_ref[ch, 1] + base_ref[i, 0] + (
                f_cyc - jnp.float32(fcar_nom_cyc)
            ) * n0
        )
    fc_v = _group_lanes_vec(fc_list)                  # [1, G]
    ph_v = _group_lanes_vec(ph_list)
    cyc_all = n_row[:rows] * fc_v + ph_v              # [rows, G]
    cyc_all = cyc_all - jnp.floor(cyc_all)
    theta_all = jnp.float32(_TWO_PI) * cyc_all
    return jnp.cos(theta_all), jnp.sin(theta_all)


def _row_replica(
    codecol_ref, g, q_all, l_all, b_all, lane_i, lane_f, qio, *,
    num_g: int, num_j: int, crt: int, e8: int, mm_dtype,
) -> jax.Array:
    """Per-row boundary replica of one group channel: ``[e8, 128]`` f32.

    Two-level one-hot gather of chips ``c_r .. c_r + J-1`` per row: lane
    digit via one MXU matmul against J statically-shifted code planes, row
    digit via a ``[e8, crt]`` compare-mask + a second (constant) matmul that
    also folds the j-differencing: column 0 of ``vsdv`` = V_0, column j =
    V_j - V_{j-1}; then J-1 boundary compare-adds on the VPU.
    """
    onehot = (l_all[:, g : g + 1] == lane_i).astype(mm_dtype)
    code2d = codecol_ref[g]                               # [crt, 128]
    planes = [code2d] + [
        _flat_shift(code2d, j) for j in range(1, num_j)
    ]
    stack = jnp.concatenate(planes, axis=0).astype(mm_dtype)
    gath = jax.lax.dot_general(
        onehot, stack, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )                                                     # [e8, J*crt]
    qmask = (qio == q_all[:, g : g + 1]).astype(mm_dtype)
    masked = gath.astype(mm_dtype) * pltpu.repeat(
        qmask, num_j, axis=1
    )                                                     # [e8, J*crt]
    ncol = (num_j + 7) // 8 * 8
    blk = (
        jax.lax.broadcasted_iota(jnp.int32, (num_j * crt, ncol), 0)
        // crt
    )
    col = jax.lax.broadcasted_iota(jnp.int32, (num_j * crt, ncol), 1)
    diff = ((blk == col).astype(mm_dtype)
            - (blk + 1 == col).astype(mm_dtype))
    vsdv = jax.lax.dot_general(
        masked, diff, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )                                                 # [e8, ncol] f32
    # Per-row boundary reconstruction in f32 (this Mosaic target has
    # no bf16 vector compare, and an f32 mask selecting bf16 values
    # trips an i1-relayout bug).
    rep = jnp.broadcast_to(vsdv[:, 0:1], (e8, LANES))
    for j in range(1, num_j):
        bj = b_all[:, (j - 1) * num_g + g : (j - 1) * num_g + g + 1]
        rep = rep + jnp.where(
            lane_f >= bj, vsdv[:, j : j + 1], 0.0
        )
    return rep


def _bank_rows_kernel(
    params_ref, base_ref, *refs,
    deltas: tuple, code_length: int, tile_rows: int, crt: int, num_j: int,
    rho_nom: float, fcar_nom_cyc: float, chans_per_step: int,
    mm_dtype=jnp.bfloat16, tap_mac: str = "sum2d", ablate: str = "none",
    lane_src: str = "kernel", halo_rows: int = 1,
):
    """One (channel-group, tile) step of the per-row boundary bank correlator.

    The transition kernel (`_bank_transition_kernel`) scatters per-CHIP deltas
    over the whole tile with ``[E, C]``-sized one-hot matmuls (~47 MMAC per
    1024-chip tile). This kernel exploits that one 128-lane ROW spans only
    ``~128 * rho`` chips (4 at GPS L1 / 32.768 MHz): per row it gathers the
    ``num_j`` consecutive chip values starting at the row's first chip
    ``c_r = floor(rho * 128 r + phi)`` with ONE small one-hot MXU matmul
    (``[E8, 128] x [J*CRT, 128]^T``, ~4.6 MMAC), then reconstructs

        rep[r, l] = V[r, 0] + sum_j (V[r, j] - V[r, j-1]) * (l >= l_j[r])

    with ``J-1`` boundary MACs on the VPU, where ``l_j = ceil((c_r + j -
    phi)/rho) - 128 r`` is the in-row sample where chip ``c_r + j`` begins —
    the same exact ceil/floor arithmetic as the transition kernel (itself the
    TPU re-derivation of the reference's texture wrap + nearest-neighbour
    fetch, `/root/reference/src/algorithms.jl:72`). Carrier wipe-off and the
    tap MAC (one MXU contraction ``[A, T] x [L, T]``) are unchanged.
    """
    if lane_src == "hoisted":
        (lanecos_ref, lanesin_ref,
         sre_ref, sim_ref, codecol_ref, outre_ref, outim_ref) = refs
    else:
        sre_ref, sim_ref, codecol_ref, outre_ref, outim_ref = refs
    k = pl.program_id(0)
    i = pl.program_id(1)
    tile = tile_rows * LANES
    ext = tile_rows + halo_rows
    e8 = (ext + 7) // 8 * 8
    lc = jnp.float32(code_length)

    @pl.when(i == 0)
    def _():
        outre_ref[...] = jnp.zeros_like(outre_ref)
        outim_ref[...] = jnp.zeros_like(outim_ref)

    sre = sre_ref[...]
    sim = sim_ref[...]
    num_ants = sre.shape[0]

    lane_i = jax.lax.broadcasted_iota(jnp.int32, (e8, LANES), 1)
    lane_f = lane_i.astype(jnp.float32)
    n_row = (
        jax.lax.broadcasted_iota(jnp.int32, (e8, 1), 0).astype(jnp.float32)
        * jnp.float32(LANES)
    )                                             # [e8, 1] lane-0 sample index
    qio = jax.lax.broadcasted_iota(jnp.int32, (e8, crt), 1)
    num_g = chans_per_step
    n0 = (i * tile).astype(jnp.float32)

    # --- per-row chip indices + boundaries, ALL group channels at once ---
    # The naive per-channel formulation does ~10 vector ops per boundary on
    # [e8, 1]-shaped columns — 1/128 lane utilization, measured as the
    # dominant kernel cost. Here the per-channel scalars ride the scalar
    # unit, and all row/boundary vectors are lane-packed: [e8, G] chip
    # indices and [e8, (J-1)*G] boundaries (j-major blocks), so the vector
    # cost is amortized over the whole channel group.
    if ablate not in ("const_replica", "floor"):
        q_all, l_all, b_all = _row_chip_setup(
            params_ref, base_ref, k, i, n0, n_row, num_g=num_g,
            num_j=num_j, crt=crt, lc=lc, rho_nom=rho_nom,
        )

    # In-kernel row phasors for ALL group channels at once: cos/sin run on a
    # lane-packed [TR, G] tile (one transcendental pass covers the whole
    # group; per-channel [TR, 1] columns are free slices).
    if ablate not in ("no_carrier", "floor"):
        rowcos_all, rowsin_all = _group_row_phasors(
            params_ref, base_ref, k, i, n0, n_row, num_g=num_g,
            fcar_nom_cyc=fcar_nom_cyc, rows=tile_rows,
        )                                                 # [TR, G]
        if lane_src != "hoisted":
            lcos_all, lsin_all = _group_lane_phasors(
                params_ref, k, num_g=num_g
            )                                             # [G, 128]

    def row_phasors(g):
        return rowcos_all[:, g : g + 1], rowsin_all[:, g : g + 1]

    def lane_phasors(g):
        if lane_src == "hoisted":
            return lanecos_ref[g, 0:1, :], lanesin_ref[g, 0:1, :]
        return lcos_all[g : g + 1, :], lsin_all[g : g + 1, :]

    if ablate == "empty":
        # Nothing per channel: isolates grid sequencing + block DMA cost.
        outre_ref[...] += 1.0
        outim_ref[...] += 1.0
        return

    for g in range(chans_per_step):
        if ablate == "writes":
            # Only the per-channel output read-modify-writes.
            outre_ref[g] += jnp.float32(g + 1)
            outim_ref[g] += jnp.float32(g + 2)
            continue
        if ablate in ("const_replica", "floor"):
            rep = jnp.broadcast_to(codecol_ref[g][0:1, :], (e8, LANES))
        else:
            rep = _row_replica(
                codecol_ref, g, q_all, l_all, b_all, lane_i, lane_f, qio,
                num_g=num_g, num_j=num_j, crt=crt, e8=e8, mm_dtype=mm_dtype,
            )

        # Carrier wipe-off: in-kernel row phasors x lane phasors.
        if ablate in ("no_carrier", "floor"):
            dw_re, dw_im = sre, sim
        else:
            rc, rs = row_phasors(g)                               # [TR, 1]
            lcos, lsin = lane_phasors(g)                          # [1, 128]
            cos = rc * lcos - rs * lsin
            sin = rs * lcos + rc * lsin
            dw_re = sre * cos + sim * sin
            dw_im = sim * cos - sre * sin

        if ablate in ("no_mac", "floor"):
            # Keep rep and dw live with a token-sized reduction.
            acc = jnp.sum(
                rep[:8, :] * dw_re[:, :8, :], axis=(-2, -1), keepdims=True
            )[:, :, 0]                                            # [A, 1]
            outre_ref[g] += acc
            outim_ref[g] += acc
            continue

        if tap_mac == "mxu":
            # One [A, T] x [L, T] contraction. NOTE: the T-axis accumulation
            # is a serial chain of T/128 MXU passes with a tiny [A, L] output
            # — latency-bound at ~8 cycles/pass (measured ~4.5 ms/block at
            # K=1024, N=32768: 2*256 passes/channel).
            taps = jnp.stack(
                [_flat_shift(rep, delta)[:tile_rows] for delta in deltas],
                axis=0,
            ).reshape(len(deltas), tile)                          # [L, T]
            acc_re = jax.lax.dot_general(
                dw_re.reshape(num_ants, tile), taps, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )                                                     # [A, L]
            acc_im = jax.lax.dot_general(
                dw_im.reshape(num_ants, tile), taps, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            outre_ref[g] += acc_re
            outim_ref[g] += acc_im
            continue

        if tap_mac == "rowmm":
            # Elementwise product on the VPU, but BOTH reduction stages ride
            # the MXU (lane reduce via a ones contraction, row reduce via a
            # per-antenna selector contraction): saves the ~40-issue full VPU
            # reduce tree per tap x I/Q. f32 operands keep the sum
            # bit-comparable with sum2d (bf16 z would break the
            # variant-exactness parity tests).
            atr = num_ants * tile_rows
            ones_l = jnp.ones((LANES, 8), jnp.float32)
            # sel[a, j] = 1 where row j belongs to antenna a (j // TR == a).
            sel = (
                jax.lax.broadcasted_iota(jnp.int32, (8, atr), 1)
                // tile_rows
                == jax.lax.broadcasted_iota(jnp.int32, (8, atr), 0)
            ).astype(jnp.float32)
            for l, delta in enumerate(deltas):
                tap = _flat_shift(rep, delta)[:tile_rows]     # [TR, 128]
                for out_ref, dw in ((outre_ref, dw_re), (outim_ref, dw_im)):
                    z = (dw * tap).reshape(atr, LANES)
                    part = jax.lax.dot_general(
                        z, ones_l, (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )                                         # [A*TR, 8]
                    s2 = jax.lax.dot_general(
                        sel, part, (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )                                         # [8, 8]
                    out_ref[g, :, l : l + 1] += s2[:num_ants, 0:1]
            continue

        # "sum2d": per-tap elementwise product reduced in native [R, 128]
        # layout — full 8x128 vregs on both axes of the reduction (a flat
        # [1, T] jnp.sum uses 1/8 of every vreg and a serial lane tree; the
        # [A, tile] reshape is what made the old VPU path slow). Sums stay
        # 2-D into [:, l:l+1] slices (rank-1 writes crash libtpu layout
        # inference for A > 1).
        for l, delta in enumerate(deltas):
            tap = _flat_shift(rep, delta)[:tile_rows]             # [TR, 128]
            s_re = jnp.sum(
                dw_re * tap, axis=(-2, -1), keepdims=True
            )[:, :, 0]                                            # [A, 1]
            s_im = jnp.sum(
                dw_im * tap, axis=(-2, -1), keepdims=True
            )[:, :, 0]
            outre_ref[g, :, l : l + 1] += s_re
            outim_ref[g, :, l : l + 1] += s_im


def correlate_pallas_bank_rows(
    signal_re: jax.Array,
    signal_im: jax.Array,
    codes: jax.Array,
    prn: jax.Array,
    carrier_frequency: jax.Array,
    sampling_frequency,
    carrier_phase: jax.Array,
    code_frequency: jax.Array,
    code_phase: jax.Array,
    sample_shifts: Sequence[int],
    code_length: int,
    tile_rows: int = 256,
    nominal_code_frequency: float | None = None,
    nominal_carrier_frequency: float = 0.0,
    max_chips_per_sample: float | None = None,
    code_tiles: jax.Array | None = None,
    chans_per_step: int = 1,
    matmul_dtype=jnp.bfloat16,
    tap_mac: str = "sum2d",
    ablate: str = "none",
    pin_dma: str = "",
    lane_src: str = "kernel",
) -> tuple[jax.Array, jax.Array]:
    """Per-row boundary fused EPL bank correlator (high-sample-rate flagship).

    Same contract as `correlate_pallas_bank` (one shared ``[N]`` / ``[A, N]``
    front-end block against ``[K]`` channels, ``[K, (A,) L]`` accumulators).
    Any tap span: the replica halo carries ``span // 128 + 1`` rows, so the
    reference envelope's wide-span cells (L1 at fs >= 131 MHz, where one chip
    spans >= 128 samples) run at bank speed — there the per-row replica gets
    *cheaper* (``num_j`` ~ 2: at most one chip boundary per 128-lane row).
    Restricted to chip rates where a 128-sample row touches few chips
    (``< ~0.17`` chips/sample — GPS L1 above ~6 MHz; use
    `correlate_pallas_bank` below that or for L5-class chip rates).
    """
    span = int(max(sample_shifts)) - int(min(sample_shifts))
    halo_rows = _halo_rows_for_span(span)
    squeeze = signal_re.ndim == 1
    if squeeze:
        signal_re, signal_im = signal_re[None], signal_im[None]
    num_ants, num_samples = signal_re.shape
    num_taps = len(sample_shifts)
    d_min = int(min(sample_shifts))
    deltas = tuple(int(d) - d_min for d in sample_shifts)
    num_k = prn.shape[0]
    fs = float(sampling_frequency)

    tile_rows, num_j, crt = _rows_geometry(
        num_samples, tile_rows, fs, code_length,
        nominal_code_frequency, max_chips_per_sample, halo_rows=halo_rows,
    )
    tile = tile_rows * LANES
    if code_tiles is None:
        code_tiles = prepare_bank_code_tiles_rows(
            codes, prn, code_length=code_length, num_samples=num_samples,
            sampling_frequency=fs, tile_rows=tile_rows,
            nominal_code_frequency=nominal_code_frequency,
            max_chips_per_sample=max_chips_per_sample, tap_span=span,
        )
    elif code_tiles.shape[1] != crt:
        raise ValueError(
            f"code_tiles rows {code_tiles.shape[1]} != expected {crt}; "
            "prepare_bank_code_tiles_rows geometry must match the kernel call"
        )
    codecol = code_tiles

    num_tiles = pl.cdiv(num_samples, tile)
    n_pad = num_tiles * tile
    sre = _pad_to(signal_re, n_pad).reshape(num_ants, -1, LANES)
    sim = _pad_to(signal_im, n_pad).reshape(num_ants, -1, LANES)

    rho_nom = (
        float(nominal_code_frequency) / fs
        if nominal_code_frequency is not None
        else 0.0
    )
    fcar_nom_cyc = float(nominal_carrier_frequency) / fs
    import numpy as _np

    t_idx = _np.arange(num_tiles, dtype=_np.float64) * tile
    base = jnp.asarray(
        _np.stack(
            [
                _np.mod(fcar_nom_cyc * t_idx, 1.0),
                _np.mod(rho_nom * t_idx, float(code_length)),
            ],
            axis=-1,
        ),
        jnp.float32,
    )                                                            # [tiles, 2]

    rho = replica_ops.precise_div(code_frequency, fs)
    params = jnp.stack(
        [
            jnp.asarray(carrier_frequency, jnp.float32) / jnp.float32(fs),
            jnp.asarray(carrier_phase, jnp.float32) / jnp.float32(_TWO_PI),
            rho,
            jnp.asarray(code_phase, jnp.float32) + rho * jnp.float32(d_min),
        ],
        axis=-1,
    )                                                            # [K, 4]

    g = max(int(chans_per_step), 1)
    num_kp = pl.cdiv(num_k, g) * g
    if num_kp != num_k:
        pad = ((0, num_kp - num_k),)
        params = jnp.pad(params, pad + ((0, 0),), mode="edge")
        codecol = jnp.pad(codecol, pad + ((0, 0), (0, 0)), mode="edge")

    if lane_src == "hoisted":
        extra_inputs, extra_specs = _hoisted_lane_phasors(params, g)
    else:
        extra_inputs, extra_specs = [], []
    # DMA-ablation probes (perf diagnosis only — results become wrong): pin a
    # block family's index map to block 0 so it is fetched once, isolating
    # that family's per-step DMA cost.
    if "phasors" in pin_dma and extra_specs:
        lane_spec = pl.BlockSpec(
            (g, 8, LANES), lambda k, i: (0, 0, 0), memory_space=pltpu.VMEM
        )
        extra_specs = [lane_spec, lane_spec]
    code_spec = pl.BlockSpec(
        (g, crt, LANES),
        (lambda k, i: (0, 0, 0)) if "code" in pin_dma else
        (lambda k, i: (k, 0, 0)),
        memory_space=pltpu.VMEM,
    )

    grid_spec = pl.GridSpec(
        grid=(num_kp // g, num_tiles),
        in_specs=[
            pl.BlockSpec((num_kp, 4), lambda k, i: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((num_tiles, 2), lambda k, i: (0, 0),
                         memory_space=pltpu.SMEM),
            *extra_specs,
            pl.BlockSpec((num_ants, tile_rows, LANES), lambda k, i: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((num_ants, tile_rows, LANES), lambda k, i: (0, i, 0),
                         memory_space=pltpu.VMEM),
            code_spec,
        ],
        out_specs=(
            pl.BlockSpec((g, num_ants, num_taps), lambda k, i: (k, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((g, num_ants, num_taps), lambda k, i: (k, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
    )
    out_shape = (
        jax.ShapeDtypeStruct((num_kp, num_ants, num_taps), jnp.float32),
        jax.ShapeDtypeStruct((num_kp, num_ants, num_taps), jnp.float32),
    )
    kernel = functools.partial(
        _bank_rows_kernel,
        deltas=deltas, code_length=int(code_length),
        tile_rows=int(tile_rows), crt=int(crt), num_j=int(num_j),
        rho_nom=rho_nom, fcar_nom_cyc=fcar_nom_cyc, chans_per_step=g,
        mm_dtype=matmul_dtype, tap_mac=tap_mac, ablate=ablate,
        lane_src=lane_src, halo_rows=halo_rows,
    )
    acc_re, acc_im = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shape,
        interpret=_interpret(),
    )(params, base, *extra_inputs, sre, sim, codecol)
    acc_re, acc_im = acc_re[:num_k], acc_im[:num_k]
    if squeeze:
        acc_re, acc_im = acc_re[:, 0], acc_im[:, 0]
    return acc_re, acc_im


# ---------------------------------------------------------------------------
# Kernel F: composite bank — conj(carrier)*code folded into one plane per
# channel; taps + antennas + I/Q ride ONE wide MXU contraction per group
# ---------------------------------------------------------------------------


def _comp_geometry(
    num_samples: int,
    tile_rows: int,
    sampling_frequency: float,
    code_length: int,
    nominal_code_frequency: float | None,
    max_chips_per_sample: float | None,
    num_ants: int,
    num_taps: int,
    halo_rows: int = 1,
) -> tuple[int, int, int, int]:
    """Static geometry of the composite bank kernel.

    Returns ``(tile_rows, num_j, crt, al2p)`` — rows geometry plus the padded
    row count of the shifted-signal operand (``2 * A * L`` planes padded to a
    sublane multiple). The tile is additionally capped so the per-step
    shifted-signal block stays <= ~4 MB of VMEM (M=4 L=7 would otherwise blow
    the scoped limit at 256-row tiles).
    """
    al2p = (2 * num_ants * num_taps + 7) // 8 * 8
    tr = tile_rows
    while True:
        tr_eff, num_j, crt = _rows_geometry(
            num_samples, tr, sampling_frequency, code_length,
            nominal_code_frequency, max_chips_per_sample,
            halo_rows=halo_rows,
        )
        if al2p * tr_eff * LANES * 4 <= 4 * 2**20 or tr_eff <= 8:
            return tr_eff, num_j, crt, al2p
        tr = max(8, tr_eff // 2)


def prepare_bank_code_tiles_comp(
    codes: jax.Array,
    prn: jax.Array,
    *,
    code_length: int,
    num_samples: int,
    sampling_frequency: float,
    tile_rows: int = 256,
    nominal_code_frequency: float | None = None,
    max_chips_per_sample: float | None = None,
    num_ants: int = 1,
    num_taps: int = 3,
    tap_span: int = 0,
) -> jax.Array:
    """Per-channel tiled code tables ``[K, crt, 128]`` for the comp kernel."""
    _, _, crt, _ = _comp_geometry(
        num_samples, tile_rows, float(sampling_frequency), code_length,
        nominal_code_frequency, max_chips_per_sample, num_ants, num_taps,
        halo_rows=_halo_rows_for_span(tap_span),
    )
    code_cols = jnp.take(codes.T, jnp.asarray(prn), axis=0)       # [K, Lc]
    reps_needed = math.ceil(crt * LANES / code_length)
    codecol = jnp.tile(code_cols, (1, reps_needed))[:, : crt * LANES]
    return codecol.reshape(prn.shape[0], crt, LANES)


def _bank_comp_kernel(
    params_ref, base_ref, *refs,
    code_length: int, tile_rows: int, crt: int, num_j: int,
    rho_nom: float, fcar_nom_cyc: float, chans_per_step: int,
    num_tiles: int, mm_dtype=jnp.bfloat16, contract: str = "flatz",
    mac_precision=jax.lax.Precision.HIGHEST, z_dtype=jnp.float32,
    ablate: str = "none", lane_src: str = "kernel", halo_rows: int = 1,
):
    """One (channel-group, tile) step of the composite bank correlator.

    The rows kernel's tap MAC is per-channel: ``[A, T] x [L, T]`` with a tiny
    ``[A, L]`` output — a serial chain of T/128 MXU passes per channel whose
    measured marginal cost (1.69 ms/block at K=1024) dominated round 2. This
    kernel restructures the whole MAC around one WIDE contraction per channel
    group, using the exact tone identity

        carrier[u - d] = carrier[u] * e^{-2*pi*i*f*d}

    so the EPL tap shifts move off the per-channel replica onto the SHARED
    signal: with ``Z_k[u] = conj(carrier_k[u]) * code_k[u]`` (ONE composite
    plane per channel — tap-independent) and ``S_{a,l}[u] = sig_a[u - d_l]``
    (shifted signal planes, shared by every channel and built once per block
    by XLA),

        accum[k, a, l] = e^{+2*pi*i*f_k*d_l} * sum_u S_{a,l}[u] * Z_k[u].

    The sum over u is ONE MXU contraction ``[2G, T] x [2AL, T]^T -> [2G,
    2AL]`` per grid step: the T/128 accumulation passes amortize over all G
    channels of the group AND all antennas/taps/IQ components ride the output
    lanes — the reference's per-thread NANT x NCOR MAC loops
    (`/root/reference/src/algorithms.jl:571-605`) become MXU output columns.
    The kernel accumulates the raw ``[2G, 2AL]`` products; the complex
    recombination and the per-(k, l) phase rotation run in XLA on the tiny
    ``[K, A, L]`` result (`correlate_pallas_bank_comp` epilogue).

    Output row layout: rows ``0..G-1`` hold ``cos_k * rep_k`` products, rows
    ``G..2G-1`` hold ``sin_k * rep_k`` (the conj minus sign is folded into
    the epilogue). Column layout: ``[S_re-block | S_im-block]``, each block
    (a, l)-major. The last tile adds a halo correction: the terms
    ``u in [n_pad, n_pad + d_l)`` fall off the padded grid exactly when N is
    a tile multiple; their S values ride a dedicated ``[2AL, H*128]`` input
    (``H = halo_rows``; zero whenever N < n_pad, so the correction is
    universally safe), contracted one 128-lane slice per halo row.
    """
    if lane_src == "hoisted":
        (lanecos_ref, lanesin_ref,
         s_ref, shalo_ref, codecol_ref, out_ref, z_ref) = refs
    else:
        s_ref, shalo_ref, codecol_ref, out_ref, z_ref = refs
    k = pl.program_id(0)
    i = pl.program_id(1)
    tile = tile_rows * LANES
    ext = tile_rows + halo_rows
    e8 = (ext + 7) // 8 * 8
    lc = jnp.float32(code_length)
    num_g = chans_per_step

    @pl.when(i == 0)
    def _():
        out_ref[...] = jnp.zeros_like(out_ref)

    lane_i = jax.lax.broadcasted_iota(jnp.int32, (e8, LANES), 1)
    lane_f = lane_i.astype(jnp.float32)
    n_row = (
        jax.lax.broadcasted_iota(jnp.int32, (e8, 1), 0).astype(jnp.float32)
        * jnp.float32(LANES)
    )
    qio = jax.lax.broadcasted_iota(jnp.int32, (e8, crt), 1)
    n0 = (i * tile).astype(jnp.float32)

    q_all, l_all, b_all = _row_chip_setup(
        params_ref, base_ref, k, i, n0, n_row, num_g=num_g, num_j=num_j,
        crt=crt, lc=lc, rho_nom=rho_nom,
    )
    # Carrier row phasors on all e8 rows — the halo row participates in the
    # last tile's correction pass.
    rowcos_all, rowsin_all = _group_row_phasors(
        params_ref, base_ref, k, i, n0, n_row, num_g=num_g,
        fcar_nom_cyc=fcar_nom_cyc, rows=e8,
    )                                                     # [e8, G]
    if lane_src != "hoisted":
        lcos_all, lsin_all = _group_lane_phasors(
            params_ref, k, num_g=num_g
        )                                                 # [G, 128]

    if contract == "diag":
        # Constants of the transpose-free two-stage contraction, shared by
        # the whole group. Stage 1 contracts the ROW dim of the natural-
        # layout composite against S2[r, (p, l')] (arranged by XLA), giving
        # C[l, (p, l')] on the MXU; the wanted values are the block
        # diagonals C[l, p*128 + l], selected by one mask multiply and
        # summed by two constant matmuls (ones / block-selector) — no
        # [row -> lane-chunk] relayout of Z anywhere.
        al2pl = s_ref.shape[1]
        dmask = (
            jax.lax.rem(
                jax.lax.broadcasted_iota(jnp.int32, (2 * LANES, al2pl), 0),
                LANES,
            )
            == jax.lax.rem(
                jax.lax.broadcasted_iota(jnp.int32, (2 * LANES, al2pl), 1),
                LANES,
            )
        ).astype(jnp.float32)
        ones8 = jnp.ones((8, LANES), jnp.float32)
        bsel = (
            jax.lax.broadcasted_iota(jnp.int32, (al2pl, out_ref.shape[1]), 0)
            // LANES
            == jax.lax.broadcasted_iota(
                jnp.int32, (al2pl, out_ref.shape[1]), 1
            )
        ).astype(jnp.float32)

    # Composite planes stream into the z scratch so each channel's [e8, 128]
    # temporaries (rep, cos, sin) die per loop iteration — holding all 2G
    # planes live through the contraction blew the 16 MB scoped-VMEM limit.
    # Halo rows are captured as [1, 128] slices (tiny) for the last tile.
    hcos, hsin = [], []
    for g in range(num_g):
        rep = _row_replica(
            codecol_ref, g, q_all, l_all, b_all, lane_i, lane_f, qio,
            num_g=num_g, num_j=num_j, crt=crt, e8=e8, mm_dtype=mm_dtype,
        )
        rc = rowcos_all[:, g : g + 1]                     # [e8, 1]
        rs = rowsin_all[:, g : g + 1]
        if lane_src == "hoisted":
            lcos = lanecos_ref[g, 0:1, :]                 # [1, 128]
            lsin = lanesin_ref[g, 0:1, :]
        else:
            lcos = lcos_all[g : g + 1, :]
            lsin = lsin_all[g : g + 1, :]
        cos = rc * lcos - rs * lsin                       # [e8, 128]
        sin = rs * lcos + rc * lsin
        zc = (cos * rep).astype(z_dtype)
        zs = (sin * rep).astype(z_dtype)
        hcos.append(zc[tile_rows : tile_rows + halo_rows].astype(jnp.float32))
        hsin.append(zs[tile_rows : tile_rows + halo_rows].astype(jnp.float32))
        if ablate == "nomac":
            continue
        if contract == "diag":
            # [TR, 256]: zc on lanes 0..127, zs on 128..255 — a lane-concat,
            # layout-preserving (rows stay on sublanes).
            zcs = jnp.concatenate(
                [zc[:tile_rows], zs[:tile_rows]], axis=1
            ).astype(jnp.float32)
            c_all = jax.lax.dot_general(
                zcs, s_ref[...], (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=mac_precision,
            )                                             # [256, al2pl]
            d = c_all * dmask
            r1c = jax.lax.dot_general(
                ones8, d[:LANES], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )                                             # [8, al2pl]
            r1s = jax.lax.dot_general(
                ones8, d[LANES:], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )
            oc = jax.lax.dot_general(
                r1c, bsel, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )                                             # [8, 2ALp]
            osn = jax.lax.dot_general(
                r1s, bsel, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )
            out_ref[g : g + 1, :] += oc[0:1]
            out_ref[num_g + g : num_g + g + 1, :] += osn[0:1]
        elif contract == "flatz":
            # Per-channel relayout at write time: the (row -> lane-chunk,
            # channel -> sublane) transpose interleaves with the next
            # channel's replica/carrier chains instead of serializing after
            # the loop.
            z_ref[g : g + 1, :] = zc[:tile_rows].reshape(1, tile)
            z_ref[num_g + g : num_g + g + 1, :] = (
                zs[:tile_rows].reshape(1, tile)
            )
        else:
            z_ref[g] = zc[:tile_rows]
            z_ref[num_g + g] = zs[:tile_rows]

    # The wide contraction: all G channels x all (IQ, ant, tap) columns.
    # Operands are full-precision floats (carrier phasors x signal), so the
    # matmul should run above DEFAULT precision — the TPU default (one bf16
    # pass) loses ~3 decimal digits over a 32k-term sum (measured 1e-3
    # relative on chip); HIGH (bf16x3) restores ~f32 accuracy at half the
    # passes of HIGHEST.
    if ablate != "nomac" and contract != "diag":
        # NOTE "nd" (two contracting dims, no relayout) is rejected by this
        # Mosaic toolchain: 'tpu.matmul' lhs contracting dims must be size 1.
        zm = (
            z_ref[...] if contract == "flatz"
            else z_ref[...].reshape(2 * num_g, tile)
        )                                                 # [2G, T]
        sv = s_ref[...]                                   # [2ALp, T] (flat)
        out_ref[...] += jax.lax.dot_general(
            zm, sv, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=mac_precision,
        )                                                 # [2G, 2ALp]

    @pl.when(i == num_tiles - 1)
    def _():
        # One [2G, 128] x [2AL, 128]^T correction per halo row (halo rows are
        # a sublane slice per channel; merging them into lanes would be an
        # unsupported Mosaic relayout — the shalo lanes are sliced instead).
        for h in range(halo_rows):
            zh = jnp.concatenate(
                [x[h : h + 1] for x in hcos] + [x[h : h + 1] for x in hsin],
                axis=0,
            )                                             # [2G, 128]
            out_ref[...] += jax.lax.dot_general(
                zh, shalo_ref[:, h * LANES : (h + 1) * LANES],
                (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )


def correlate_pallas_bank_comp(
    signal_re: jax.Array,
    signal_im: jax.Array,
    codes: jax.Array,
    prn: jax.Array,
    carrier_frequency: jax.Array,
    sampling_frequency,
    carrier_phase: jax.Array,
    code_frequency: jax.Array,
    code_phase: jax.Array,
    sample_shifts: Sequence[int],
    code_length: int,
    tile_rows: int = 256,
    nominal_code_frequency: float | None = None,
    nominal_carrier_frequency: float = 0.0,
    max_chips_per_sample: float | None = None,
    code_tiles: jax.Array | None = None,
    chans_per_step: int = 8,
    matmul_dtype=jnp.bfloat16,
    contract: str = "flatz",
    mac_precision=jax.lax.Precision.HIGHEST,
    z_dtype=jnp.float32,
    ablate: str = "none",
    lane_src: str = "kernel",
) -> tuple[jax.Array, jax.Array]:
    """Composite-plane fused EPL bank correlator (wide-MXU flagship).

    Same contract and chip-rate envelope as `correlate_pallas_bank_rows`
    (shared ``[N]`` / ``[A, N]`` front end, ``[K]`` channel arrays,
    ``[K, (A,) L]`` accumulators, any tap span, < ~0.17
    chips/sample). Differs only in accumulator rounding: the carrier-shift
    identity moves the tap shifts onto the signal, so sums are mathematically
    identical but f32-rounded in a different order, and the per-(k, l) phase
    rotation adds one complex multiply of rounding (~1e-7 relative — far
    inside the tracking noise floor; see `_bank_comp_kernel`).
    """
    span = int(max(sample_shifts)) - int(min(sample_shifts))
    halo_rows = _halo_rows_for_span(span)
    squeeze = signal_re.ndim == 1
    if squeeze:
        signal_re, signal_im = signal_re[None], signal_im[None]
    num_ants, num_samples = signal_re.shape
    num_taps = len(sample_shifts)
    d_min = int(min(sample_shifts))
    deltas = tuple(int(d) - d_min for d in sample_shifts)
    num_k = prn.shape[0]
    fs = float(sampling_frequency)
    al2 = 2 * num_ants * num_taps

    tile_rows, num_j, crt, al2p = _comp_geometry(
        num_samples, tile_rows, fs, code_length,
        nominal_code_frequency, max_chips_per_sample, num_ants, num_taps,
        halo_rows=halo_rows,
    )
    tile = tile_rows * LANES
    if code_tiles is None:
        code_tiles = prepare_bank_code_tiles_comp(
            codes, prn, code_length=code_length, num_samples=num_samples,
            sampling_frequency=fs, tile_rows=tile_rows,
            nominal_code_frequency=nominal_code_frequency,
            max_chips_per_sample=max_chips_per_sample, num_ants=num_ants,
            num_taps=num_taps, tap_span=span,
        )
    elif code_tiles.shape[1] != crt:
        raise ValueError(
            f"code_tiles rows {code_tiles.shape[1]} != expected {crt}; "
            "prepare_bank_code_tiles_comp geometry must match the kernel call"
        )
    codecol = code_tiles

    num_tiles = pl.cdiv(num_samples, tile)
    n_pad = num_tiles * tile
    sig_re_p = _pad_to(signal_re, n_pad)                  # [A, n_pad]
    sig_im_p = _pad_to(signal_im, n_pad)

    # Shifted signal planes S_{comp, a, l}[u] = sig_a[u - d_l] (comp-major,
    # then antenna, then tap) + the last-tile halo vectors S[n_pad - d_l + m]
    # for m < d_l (automatically zero while N < n_pad: the pad region holds
    # the shifted-in true samples already). Halo width = halo_rows * 128
    # lanes, covering wide tap spans (d_l >= 128).
    halo_w = halo_rows * LANES
    s_rows, halo_planes = [], []
    for sig in (sig_re_p, sig_im_p):
        for a in range(num_ants):
            for dl in deltas:
                s_rows.append(jnp.pad(sig[a], (dl, 0))[:n_pad])
                halo_planes.append(
                    jnp.pad(sig[a, n_pad - dl :] if dl else sig[a, :0],
                            (0, halo_w - dl))
                )
    # Flat [al2p, n_pad]: the (a, l)-planes stay T-major so the kernel
    # consumes them without any in-kernel reshape (an HBM reshape is free).
    # z_dtype=bf16 also halves the S stream and the z-scratch relayout.
    s_planes = _pad_to(jnp.stack(s_rows, axis=0), al2p, axis=0).astype(z_dtype)
    if contract == "diag":
        # S2[r, p*128 + l] = S_p[128 r + l]: the stage-1 rows-contraction
        # operand (arranged once per block in XLA, where relayouts are free).
        s_planes = (
            s_planes.astype(jnp.float32)
            .reshape(al2p, num_tiles * tile_rows, LANES)
            .transpose(1, 0, 2)
            .reshape(num_tiles * tile_rows, al2p * LANES)
        )
    s_halo = _pad_to(jnp.stack(halo_planes, axis=0), al2p, axis=0)

    rho_nom = (
        float(nominal_code_frequency) / fs
        if nominal_code_frequency is not None
        else 0.0
    )
    fcar_nom_cyc = float(nominal_carrier_frequency) / fs
    t_idx = np.arange(num_tiles, dtype=np.float64) * tile
    base = jnp.asarray(
        np.stack(
            [
                np.mod(fcar_nom_cyc * t_idx, 1.0),
                np.mod(rho_nom * t_idx, float(code_length)),
            ],
            axis=-1,
        ),
        jnp.float32,
    )                                                     # [tiles, 2]

    rho = replica_ops.precise_div(code_frequency, fs)
    f_cyc = (
        jnp.broadcast_to(
            jnp.asarray(carrier_frequency, jnp.float32), (num_k,)
        )
        / jnp.float32(fs)
    )
    params = jnp.stack(
        [
            f_cyc,
            jnp.asarray(carrier_phase, jnp.float32) / jnp.float32(_TWO_PI),
            rho,
            jnp.asarray(code_phase, jnp.float32) + rho * jnp.float32(d_min),
        ],
        axis=-1,
    )                                                     # [K, 4]

    # Output blocks are [2G, 2ALp]: Pallas requires the sublane block dim
    # divisible by 8, so the group size is rounded up to a multiple of 4
    # (padded channels are sliced off like padded K).
    g = max(int(chans_per_step), 1)
    g = (g + 3) // 4 * 4
    num_kp = pl.cdiv(num_k, g) * g
    if num_kp != num_k:
        pad = ((0, num_kp - num_k),)
        params = jnp.pad(params, pad + ((0, 0),), mode="edge")
        codecol = jnp.pad(codecol, pad + ((0, 0), (0, 0)), mode="edge")

    if lane_src == "hoisted":
        extra_inputs, extra_specs = _hoisted_lane_phasors(params, g)
    else:
        extra_inputs, extra_specs = [], []

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(num_kp // g, num_tiles),
        in_specs=[
            pl.BlockSpec((num_kp, 4), lambda k, i: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((num_tiles, 2), lambda k, i: (0, 0),
                         memory_space=pltpu.SMEM),
            *extra_specs,
            (
                pl.BlockSpec((tile_rows, al2p * LANES), lambda k, i: (i, 0),
                             memory_space=pltpu.VMEM)
                if contract == "diag"
                else pl.BlockSpec((al2p, tile), lambda k, i: (0, i),
                                  memory_space=pltpu.VMEM)
            ),
            pl.BlockSpec((al2p, halo_w), lambda k, i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((g, crt, LANES), lambda k, i: (k, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((2 * g, al2p), lambda k, i: (k, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM(
                (8, LANES) if contract == "diag"       # unused in diag mode
                else (2 * g, tile) if contract == "flatz"
                else (2 * g, tile_rows, LANES),
                z_dtype,
            ),
        ],
    )
    out_shape = jax.ShapeDtypeStruct((2 * num_kp, al2p), jnp.float32)
    kernel = functools.partial(
        _bank_comp_kernel,
        code_length=int(code_length), tile_rows=int(tile_rows),
        crt=int(crt), num_j=int(num_j), rho_nom=rho_nom,
        fcar_nom_cyc=fcar_nom_cyc, chans_per_step=g,
        num_tiles=int(num_tiles), mm_dtype=matmul_dtype,
        contract=contract, mac_precision=mac_precision,
        z_dtype=z_dtype, ablate=ablate, lane_src=lane_src,
        halo_rows=halo_rows,
    )
    raw = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shape,
        # The default 16 MB scoped-VMEM budget is an XLA pipelining reserve,
        # not the physical limit; the z scratch + HIGHEST-precision operand
        # decompositions of the wide matmul need more at large (G, TR).
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=_interpret(),
    )(params, base, *extra_inputs, s_planes, s_halo, codecol)

    # Epilogue (XLA, tiny [K, A, L] math): complex recombination of the raw
    # products, then the exact e^{+i 2 pi f_k d_l} tap-phase rotation.
    raw = raw.reshape(num_kp // g, 2, g, al2p)[:, :, :, :al2]
    raw = raw.reshape(num_kp // g, 2, g, 2, num_ants, num_taps)
    m_re = (raw[:, 0, :, 0] + raw[:, 1, :, 1]).reshape(
        num_kp, num_ants, num_taps
    )[:num_k]
    m_im = (raw[:, 0, :, 1] - raw[:, 1, :, 0]).reshape(
        num_kp, num_ants, num_taps
    )[:num_k]
    omega = (
        jnp.float32(_TWO_PI)
        * f_cyc[:, None, None]
        * jnp.asarray(deltas, jnp.float32)[None, None, :]
    )                                                     # [K, 1, L]
    cw, sw = jnp.cos(omega), jnp.sin(omega)
    acc_re = cw * m_re - sw * m_im
    acc_im = cw * m_im + sw * m_re
    if squeeze:
        acc_re, acc_im = acc_re[:, 0], acc_im[:, 0]
    return acc_re, acc_im


def bank_algorithm_for(
    num_samples: int,
    sampling_frequency: float,
    code_length: int,
    nominal_code_frequency: float | None = None,
    tile_rows: int = 256,
    max_chips_per_sample: float | None = None,
    num_ants: int = 1,
    z_dtype=jnp.float32,
) -> str:
    """Resolve the best bank kernel for a scenario.

    At high sampling rates (few chips per 128-sample row): the per-row
    kernel for single-antenna banks, the composite kernel for multi-antenna
    banks (antennas/taps ride MXU output columns, and the rows kernel's
    A>1 store pattern SIGABRTs this libtpu's layout inference on real
    hardware). The transition kernel covers low rates and L5-class chip
    rates.

    Routing is measurement-backed: the same-process flagship A/B
    (data/benchmarks/comp_ab.json, K=1024 N=32768 M=1) has rows 1.818 ms
    vs comp 1.902 ms — the per-channel replica reconstruction dominates
    both (see roofline.json floor_analysis_r3), so comp's wide-MXU tap MAC
    only pays off once antennas/taps widen its contraction (M > 1).

    ``z_dtype=bf16`` (tracking-grade accumulator mode) also routes to the
    composite kernel — the variant the bf16-z win was measured on
    (data/benchmarks/comp_ab.json: comp-bf16z 1.730 ms vs rows-f32 1.818 ms
    same-process; closed-loop validation data/benchmarks/bf16z_loop_ab.json).
    """
    try:
        _rows_geometry(
            num_samples, tile_rows, float(sampling_frequency), code_length,
            nominal_code_frequency, max_chips_per_sample,
        )
        if num_ants > 1 or jnp.dtype(z_dtype) == jnp.dtype(jnp.bfloat16):
            return "pallas_bank_comp"
        return "pallas_bank_rows"
    except ValueError:
        return "pallas_bank"


def correlate_pallas_bank_auto(
    signal_re: jax.Array,
    signal_im: jax.Array,
    codes: jax.Array,
    prn: jax.Array,
    carrier_frequency: jax.Array,
    sampling_frequency,
    carrier_phase: jax.Array,
    code_frequency: jax.Array,
    code_phase: jax.Array,
    sample_shifts: Sequence[int],
    code_length: int,
    tile_rows: int = 256,
    nominal_code_frequency: float | None = None,
    nominal_carrier_frequency: float = 0.0,
    max_chips_per_sample: float | None = None,
    code_tiles: jax.Array | None = None,
    chans_per_step: int = 1,
    z_dtype=jnp.float32,
    mac_precision=jax.lax.Precision.HIGHEST,
) -> tuple[jax.Array, jax.Array]:
    """Bank correlator with static per-scenario kernel selection."""
    algo = bank_algorithm_for(
        signal_re.shape[-1], float(sampling_frequency), code_length,
        nominal_code_frequency, tile_rows, max_chips_per_sample,
        num_ants=signal_re.shape[0] if signal_re.ndim == 2 else 1,
        z_dtype=z_dtype,
    )
    fn = {
        "pallas_bank_rows": correlate_pallas_bank_rows,
        "pallas_bank_comp": correlate_pallas_bank_comp,
        "pallas_bank": correlate_pallas_bank,
    }[algo]
    if (
        jnp.dtype(z_dtype) == jnp.dtype(jnp.bfloat16)
        and algo != "pallas_bank_comp"
    ):
        # bank_algorithm_for routes bf16-z to the comp kernel whenever the
        # geometry allows; landing elsewhere means the scenario cannot honor
        # the requested tracking-grade mode — say so instead of silently
        # computing in f32.
        import warnings

        warnings.warn(
            f"z_dtype=bfloat16 requested but the resolved kernel {algo!r} "
            "does not support bf16 accumulator planes; running in f32",
            stacklevel=2,
        )
    extra = (
        {"z_dtype": z_dtype, "mac_precision": mac_precision}
        if algo == "pallas_bank_comp"
        else {}
    )
    return fn(
        signal_re, signal_im, codes, prn, carrier_frequency,
        sampling_frequency, carrier_phase, code_frequency, code_phase,
        sample_shifts, code_length, tile_rows=tile_rows,
        nominal_code_frequency=nominal_code_frequency,
        nominal_carrier_frequency=nominal_carrier_frequency,
        max_chips_per_sample=max_chips_per_sample, code_tiles=code_tiles,
        chans_per_step=chans_per_step, **extra,
    )


registry.register("pallas_taps", correlate_pallas_taps)
registry.register("pallas_fused", correlate_pallas_fused)
registry.register("pallas_bank", correlate_pallas_bank)
registry.register("pallas_bank_onehot", correlate_pallas_bank_onehot)
registry.register("pallas_bank_rows", correlate_pallas_bank_rows)
registry.register("pallas_bank_comp", correlate_pallas_bank_comp)
registry.register("pallas_bank_auto", correlate_pallas_bank_auto)
