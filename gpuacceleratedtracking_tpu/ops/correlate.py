"""XLA correlation paths: downconvert (carrier wipe-off) + EPL accumulation.

These are the compiler-scheduled reference implementations — the oracle for the
Pallas kernels and the TPU equivalent of the reference's CUDA pipeline zoo
(`/root/reference/src/algorithms.jl:142-866` and the dispatchers at
`:869-1545`). Where CUDA forced ten hand-fused variants, XLA fusion collapses
the design space to two shapes:

- ``correlate_fused``  — one jitted graph: carrier NCO, wipe-off, code replica
  and tap MACs fused by XLA (the 1330/1331/1431 "fully fused" family).
- ``correlate_unfused`` — materializes carrier replica, downconverted signal and
  per-sample products in HBM (the 2330..2431 family), kept for benchmarking the
  fusion win, exactly like the reference keeps its algorithm-2 pipelines.

The tap MAC is expressed as a ``[L, N] x [N, A]`` contraction so XLA places it on
the MXU; accumulation is forced to f32 (``preferred_element_type`` +
``Precision.HIGHEST``) to preserve accumulator SNR — the role of the Harris
shared-memory f32 trees (`/root/reference/src/reduction.jl`).
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp

from . import replica as replica_ops


def downconvert(
    signal_re: jax.Array,
    signal_im: jax.Array,
    carrier_cos: jax.Array,
    carrier_sin: jax.Array,
) -> tuple[jax.Array, jax.Array]:
    """Carrier wipe-off: ``dw = signal * conj(carrier)``, SoA planes.

    Matches `/root/reference/src/algorithms.jl:577-578`:
    ``dw_re = s_re*c + s_im*s;  dw_im = s_im*c - s_re*s``.
    Broadcasts carrier ``[N]`` over any leading antenna axes of the signal.
    """
    dw_re = signal_re * carrier_cos + signal_im * carrier_sin
    dw_im = signal_im * carrier_cos - signal_re * carrier_sin
    return dw_re, dw_im


def _tap_matrix(code_replica: jax.Array, sample_shifts: Sequence[int], num_samples: int):
    """Stack tap views of the haloed replica into ``[L, N]`` (static slices)."""
    d0 = int(min(sample_shifts))
    return jnp.stack(
        [
            jax.lax.dynamic_slice_in_dim(
                code_replica, int(d) - d0, num_samples, axis=-1
            )
            for d in sample_shifts
        ],
        axis=-2,
    )


def epl_accumulate(
    dw_re: jax.Array,
    dw_im: jax.Array,
    code_replica: jax.Array,
    sample_shifts: Sequence[int],
) -> tuple[jax.Array, jax.Array]:
    """Tap-shifted MAC: ``accum[a, l] = sum_n dw[a, n] * replica[n + d_l - d_min]``.

    ``dw_*``: ``[..., A, N]`` or ``[..., N]``; returns ``[..., A, L]`` /
    ``[..., L]``. The contraction runs on the MXU with f32 accumulation.
    """
    num_samples = dw_re.shape[-1]
    taps = _tap_matrix(code_replica, sample_shifts, num_samples)  # [..., L, N]

    def contract(x):
        if taps.ndim == 2 and x.ndim == 1:
            lhs, out_squeeze = x[None, :], True
        else:
            lhs, out_squeeze = x, False
        acc = jnp.einsum(
            "...an,...ln->...al",
            lhs,
            taps,
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32,
        )
        return acc[0] if out_squeeze else acc

    return contract(dw_re), contract(dw_im)


def correlate_fused(
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
    """Single-channel fused downconvert+correlate (XLA-fused 1330-family analog).

    ``signal_*``: ``[N]`` or ``[A, N]``. Returns ``(accum_re, accum_im)`` of shape
    ``[L]`` / ``[A, L]``. All replica generation happens inside the graph — no
    HBM round-trips; XLA fuses the elementwise chain into the MXU contraction.
    """
    num_samples = signal_re.shape[-1]
    cos, sin = replica_ops.gen_carrier_replica(
        carrier_frequency, sampling_frequency, carrier_phase, num_samples
    )
    dw_re, dw_im = downconvert(signal_re, signal_im, cos, sin)
    code_rep = replica_ops.gen_code_replica(
        codes,
        prn,
        code_frequency,
        sampling_frequency,
        code_phase,
        num_samples,
        int(min(sample_shifts)),
        int(max(sample_shifts)),
        code_length,
    )
    return epl_accumulate(dw_re, dw_im, code_rep, sample_shifts)


def correlate_xla_bank(
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
    **_unused,
) -> tuple[jax.Array, jax.Array]:
    """Bank-signature XLA correlator: ``[K]`` channel params, shared signal.

    The `vmap` fallback for configurations the fused Pallas bank rejects
    (tap span >= 128 samples, or >= 1 chip/sample). vmap of XLA ops is cheap
    to compile, unlike vmap of a `pallas_call`.
    """

    def one(p, f_car, phi_car, f_code, phi_code):
        return correlate_fused(
            signal_re, signal_im, codes, p, f_car, sampling_frequency,
            phi_car, f_code, phi_code, sample_shifts, code_length,
        )

    return jax.vmap(one)(
        jnp.asarray(prn), jnp.asarray(carrier_frequency),
        jnp.asarray(carrier_phase), jnp.asarray(code_frequency),
        jnp.asarray(code_phase),
    )


def correlate_unfused(
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
    """Unfused pipeline with materialized intermediates (2330-family analog).

    Stage boundaries are pinned with `jax.lax.optimization_barrier` so XLA cannot
    re-fuse them — each stage round-trips HBM like the reference's
    `downconvert_and_accumulate_strided_kernel!` writing carrier, downconverted
    signal and per-sample products to global memory
    (`/root/reference/src/algorithms.jl:828-866`).
    """
    num_samples = signal_re.shape[-1]
    cos, sin = replica_ops.gen_carrier_replica(
        carrier_frequency, sampling_frequency, carrier_phase, num_samples
    )
    cos, sin = jax.lax.optimization_barrier((cos, sin))
    code_rep = replica_ops.gen_code_replica(
        codes, prn, code_frequency, sampling_frequency, code_phase,
        num_samples, int(min(sample_shifts)), int(max(sample_shifts)), code_length,
    )
    code_rep = jax.lax.optimization_barrier(code_rep)
    dw_re, dw_im = downconvert(signal_re, signal_im, cos, sin)
    dw_re, dw_im = jax.lax.optimization_barrier((dw_re, dw_im))
    taps = _tap_matrix(code_rep, sample_shifts, num_samples)
    # Materialized per-sample products [..., L, N] (the reference's `accum` array),
    # then a separate reduction pass.
    prod_re = dw_re[..., None, :] * taps
    prod_im = dw_im[..., None, :] * taps
    prod_re, prod_im = jax.lax.optimization_barrier((prod_re, prod_im))
    return jnp.sum(prod_re, axis=-1), jnp.sum(prod_im, axis=-1)
