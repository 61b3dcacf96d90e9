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


def _interpret() -> bool:
    return jax.default_backend() == "cpu"


def _pad_to(x: jax.Array, size: int, axis: int = -1) -> jax.Array:
    pad = size - x.shape[axis]
    if pad == 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths)


def _carrier_tile(tile_idx, rows, f_cyc, phi_cyc, row_offset=0.0):
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
    cyc_row = f_cyc * ((tile_idx * TILE).astype(jnp.float32) + (row + row_offset) * LANES) + phi_cyc
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
    """View ``arr [R+1, 128]`` as flat samples and shift left by ``delta`` < 128:
    ``out[r, l] = flat[r*128 + l + delta]`` for the first R rows (last row is
    halo). Implemented with lane/sublane rolls + a lane-position select."""
    if delta == 0:
        return arr
    # pltpu.roll takes non-negative shifts (out[i] = in[(i - shift) % n]);
    # a left-roll by delta is a right-roll by n - delta.
    rolled = pltpu.roll(arr, LANES - delta, axis=1)          # [r, (l+delta) % 128]
    next_row = pltpu.roll(rolled, arr.shape[0] - 1, axis=0)  # [r+1, (l+delta) % 128]
    lane = jax.lax.broadcasted_iota(jnp.int32, arr.shape, 1)
    return jnp.where(lane < LANES - delta, rolled, next_row)


def _fused_kernel(
    params_ref, sre_ref, sim_ref, code2d_ref, outre_ref, outim_ref,
    *, deltas: tuple, code_length: int, num_hi: int,
):
    i = pl.program_id(0)
    f_cyc = params_ref[0, 0]
    phi_cyc = params_ref[0, 1]
    rho = params_ref[0, 2]          # chips per sample
    phi_code = params_ref[0, 3]     # chips (already offset by d_min)
    ext_rows = TILE_ROWS + 1        # one halo row covers max tap span < 128

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
    for l, delta in enumerate(deltas):
        tap = _flat_shift(rep, delta)[:TILE_ROWS]   # [TR, 128]
        outre_ref[:, l] += jnp.sum(dw_re * tap, axis=(1, 2))
        outim_ref[:, l] += jnp.sum(dw_im * tap, axis=(1, 2))


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

    The one kernel = the reference's 5431 mega-kernel. The code table column for
    ``prn`` rides in VMEM as ``[ceil(Lc/128), 128]``; chip lookup is a one-hot
    lane matmul (exact in f32). Tap span must stay below 128 samples (one halo
    row); wider spans fall back to `correlate_pallas_taps`.
    """
    span = int(max(sample_shifts)) - int(min(sample_shifts))
    if span >= LANES:
        return correlate_pallas_taps(
            signal_re, signal_im, codes, prn, carrier_frequency,
            sampling_frequency, carrier_phase, code_frequency, code_phase,
            sample_shifts, code_length,
        )
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

    rho = code_frequency / sampling_frequency
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
        num_hi=int(num_hi),
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
    *, deltas: tuple, code_length: int, num_hi: int,
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
    # Whole [K, 4] params table rides in SMEM (TPU SMEM blocks cannot be
    # split per grid step); each channel reads its own row.
    f_cyc = params_ref[k, 0]
    phi_cyc = params_ref[k, 1]
    rho = params_ref[k, 2]
    phi_code = params_ref[k, 3]
    ext_rows = TILE_ROWS + 1

    row = jax.lax.broadcasted_iota(jnp.int32, (ext_rows, LANES), 0).astype(jnp.float32)
    lane = jax.lax.broadcasted_iota(jnp.int32, (ext_rows, LANES), 1).astype(jnp.float32)
    m = (i * TILE).astype(jnp.float32) + row * LANES + lane
    p = rho * m + phi_code
    lc = jnp.float32(code_length)
    p = p - lc * jnp.floor(p / lc)
    idx = jnp.clip(p.astype(jnp.int32), 0, code_length - 1)
    hi = jax.lax.div(idx, LANES)
    lo = jax.lax.rem(idx, LANES)

    onehot = (
        lo[:, :, None]
        == jax.lax.broadcasted_iota(jnp.int32, (ext_rows, LANES, LANES), 2)
    ).astype(jnp.float32)
    w = jax.lax.dot_general(
        onehot,
        code2d_ref[0],
        (((2,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    sel = (
        hi[:, :, None]
        == jax.lax.broadcasted_iota(jnp.int32, (ext_rows, LANES, num_hi), 2)
    )
    rep = jnp.sum(jnp.where(sel, w, 0.0), axis=2)

    cos, sin = _carrier_tile(i, TILE_ROWS, f_cyc, phi_cyc)
    sre = sre_ref[...]
    sim = sim_ref[...]
    dw_re = sre * cos + sim * sin
    dw_im = sim * cos - sre * sin

    @pl.when(i == 0)
    def _():
        outre_ref[...] = jnp.zeros_like(outre_ref)
        outim_ref[...] = jnp.zeros_like(outim_ref)

    for l, delta in enumerate(deltas):
        tap = _flat_shift(rep, delta)[:TILE_ROWS]
        outre_ref[0, :, l] += jnp.sum(dw_re * tap, axis=(1, 2))
        outim_ref[0, :, l] += jnp.sum(dw_im * tap, axis=(1, 2))


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
) -> tuple[jax.Array, jax.Array]:
    """Fused EPL correlation of one shared front-end block against K channels.

    ``prn / carrier_frequency / carrier_phase / code_frequency / code_phase``
    are ``[K]`` arrays (one satellite channel each); ``signal_*`` is ``[N]`` or
    ``[A, N]`` shared by all channels. Returns ``[K, A, L]`` (or ``[K, L]``)
    accumulators. Requires tap span < 128 samples.
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

    num_hi = pl.cdiv(code_length, LANES)
    code_cols = jnp.take(codes.T, jnp.asarray(prn), axis=0)        # [K, Lc]
    code2d = _pad_to(code_cols, num_hi * LANES).reshape(num_k, num_hi, LANES)

    num_tiles = pl.cdiv(num_samples, TILE)
    n_pad = num_tiles * TILE
    sre = _pad_to(signal_re, n_pad).reshape(num_ants, -1, LANES)
    sim = _pad_to(signal_im, n_pad).reshape(num_ants, -1, LANES)

    rho = jnp.asarray(code_frequency, jnp.float32) / jnp.float32(sampling_frequency)
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
            pl.BlockSpec((num_ants, TILE_ROWS, LANES), lambda k, i: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((num_ants, TILE_ROWS, LANES), lambda k, i: (0, i, 0),
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
        num_hi=int(num_hi),
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


registry.register("pallas_taps", correlate_pallas_taps)
registry.register("pallas_fused", correlate_pallas_fused)
registry.register("pallas_bank", correlate_pallas_bank)
