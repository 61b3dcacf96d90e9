"""Matmul DFT (four-step / two-factor Cooley-Tukey) on split re/im f32 planes.

The axon TPU plugin has no FFT lowering, and complex64 host transfers are
unimplemented (CLAUDE.md) — so on-chip PCPS acquisition runs its DFTs as MXU
matmuls over split f32 planes. Factoring ``N = n1 * n2`` turns the ``N^2``
DFT matrix into two small VMEM-resident factors plus a twiddle plane:

    X[k1 + n1 k2] = sum_b W2[b, k2] * T[k1, b] * sum_a M[a, b] * W1[a, k1]

with ``M[a, b] = x[a n2 + b]``, ``W1[a, k1] = e^{s 2 pi i a k1 / n1}``,
``T[k1, b] = e^{s 2 pi i b k1 / N}``, ``W2[b, k2] = e^{s 2 pi i b k2 / n2}``
(s = -1 forward) — ``N (n1 + n2)`` MACs instead of ``N^2``, both contractions
batched MXU einsums. This is the TPU-first re-derivation of the capability
the reference ecosystem gets from cuFFT via Acquisition.jl (role:
`/root/reference/src/benchmarks.jl:54`); the tracking hot loop never needs
it — acquisition is rare, tracking is continuous.

Works on any backend (the CPU tests compare it against ``jnp.fft``).
"""

from __future__ import annotations

import functools
import math

import numpy as np
import jax
import jax.numpy as jnp

_PREC = jax.lax.Precision.HIGHEST


@functools.lru_cache(maxsize=64)
def factor(n: int) -> tuple[int, int]:
    """Factor ``n = n1 * n2`` with ``n1`` the divisor closest to sqrt(n)
    from below (``(1, n)`` for primes — the plain DFT-matrix fallback)."""
    best = (1, n)
    for n1 in range(2, int(math.isqrt(n)) + 1):
        if n % n1 == 0:
            best = (n1, n // n1)
    return best


@functools.lru_cache(maxsize=64)
def _tables(n: int, sign: int):
    """Numpy f32 cos/sin factor tables ``(W1, T, W2)`` for one direction.

    Angles reduce their integer products mod the period in f64 BEFORE the
    2-pi multiply, so table phases stay exact at any N.
    """
    n1, n2 = factor(n)
    a = np.arange(n1, dtype=np.float64)
    k1 = np.arange(n1, dtype=np.float64)
    b = np.arange(n2, dtype=np.float64)
    k2 = np.arange(n2, dtype=np.float64)
    th1 = sign * 2.0 * np.pi * (np.outer(a, k1) % n1) / n1      # [n1, n1]
    tht = sign * 2.0 * np.pi * (np.outer(k1, b) % n) / n        # [n1, n2]
    th2 = sign * 2.0 * np.pi * (np.outer(b, k2) % n2) / n2      # [n2, n2]

    def cs(th):
        return (np.cos(th).astype(np.float32), np.sin(th).astype(np.float32))

    return cs(th1), cs(tht), cs(th2)


def _cmm(ar, ai, br, bi, spec):
    """Complex einsum on split planes with f32 HIGHEST accumulation."""
    mm = functools.partial(
        jnp.einsum, precision=_PREC, preferred_element_type=jnp.float32
    )
    return (
        mm(spec, ar, br) - mm(spec, ai, bi),
        mm(spec, ar, bi) + mm(spec, ai, br),
    )


def dft(
    x_re: jax.Array, x_im: jax.Array, *, inverse: bool = False
) -> tuple[jax.Array, jax.Array]:
    """DFT over the last axis of split re/im planes; natural output order.

    Forward: ``X[k] = sum_n x[n] e^{-2 pi i n k / N}``; inverse uses the
    conjugated factors and the ``1/N`` scale, so
    ``dft(*dft(re, im), inverse=True) == (re, im)`` up to f32 rounding.
    """
    n = x_re.shape[-1]
    n1, n2 = factor(n)
    sign = 1 if inverse else -1
    (w1c, w1s), (tc, ts), (w2c, w2s) = (
        (jnp.asarray(c), jnp.asarray(s)) for c, s in _tables(n, sign)
    )
    lead = x_re.shape[:-1]
    mr = x_re.reshape(*lead, n1, n2)
    mi = x_im.reshape(*lead, n1, n2)
    # Stage 1: n1-point DFT down the a axis -> A[k1, b].
    ar, ai = _cmm(mr, mi, w1c, w1s, "...ab,ak->...kb")
    # Stage 2: twiddle (elementwise complex multiply).
    br = ar * tc - ai * ts
    bi = ar * ts + ai * tc
    # Stage 3: n2-point DFT along b -> C[k1, k2]; flat index k = k1 + n1 k2.
    cr, ci = _cmm(br, bi, w2c, w2s, "...kb,bc->...kc")
    out_re = jnp.swapaxes(cr, -1, -2).reshape(*lead, n)
    out_im = jnp.swapaxes(ci, -1, -2).reshape(*lead, n)
    if inverse:
        scale = jnp.float32(1.0 / n)
        out_re = out_re * scale
        out_im = out_im * scale
    return out_re, out_im
