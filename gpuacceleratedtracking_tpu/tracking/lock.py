"""Carrier phase-lock detection and data-bit synchronization.

The Tracking.jl ecosystem pairs its loops with lock detectors and a
`SecondaryCodeOrBitDetector` (the reference builds `TrackingState` through
that stack for its CPU baseline, `/root/reference/src/benchmarks.jl:54`).
These are the framework-native equivalents, written as stateless [K]-vector
math over windows of prompt accumulators so they run on-device for a whole
channel bank at once:

- `phase_lock_metric`: the classic narrowband I/Q power-ratio detector
  ``(sum I)^2 - (sum Q)^2) / ((sum I)^2 + (sum Q)^2)`` per window — an
  estimate of ``cos(2 dphi)``: +1 in phase lock, ~0 unlocked, data-bit
  insensitive (the square kills BPSK sign flips).
- `detect_bit_boundary`: GPS L1 C/A 20 ms data-bit synchronization by the
  sign-transition histogram method: prompt-sign changes between consecutive
  1 ms blocks can only happen at bit edges, so the transition counts folded
  mod 20 vote for the boundary phase. (The L5 overlay case, where the flip
  PATTERN is known, is `tracking.secondary.detect_secondary_offset`.)
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def phase_lock_metric(
    prompt_re: jax.Array,
    prompt_im: jax.Array,
    window: int = 20,
) -> jax.Array:
    """Phase-lock indicator in [-1, 1] from ``[B]`` (or ``[B, K]``) prompts.

    Sliding non-overlapping windows of ``window`` blocks each produce one
    ``cos(2 dphi)`` estimate; returns the per-window series ``[B//window,
    (K)]``. Decide lock with a threshold (~0.85 is a common choice; in-phase
    noise-free prompts give exactly +1, quadrature noise drives it to 0).
    Data-bit sign flips inside a window cancel in the squares, so the metric
    works before bit sync.
    """
    p_re = jnp.asarray(prompt_re, jnp.float32)
    p_im = jnp.asarray(prompt_im, jnp.float32)
    num_w = p_re.shape[0] // window
    shape = (num_w, window) + p_re.shape[1:]
    # Squares first: BPSK flips within a window must not cancel the power.
    i2 = jnp.sum(p_re[: num_w * window].reshape(shape) ** 2, axis=1)
    q2 = jnp.sum(p_im[: num_w * window].reshape(shape) ** 2, axis=1)
    return (i2 - q2) / jnp.maximum(i2 + q2, 1e-20)


def detect_bit_boundary(
    prompt_re: jax.Array,
    bit_length: int = 20,
) -> tuple[jax.Array, jax.Array]:
    """Find the data-bit edge phase from ``[B]`` / ``[B, K]`` locked prompts.

    Returns ``(offset, confidence)``: block ``b`` starts a new bit iff
    ``(b + offset) % bit_length == 0`` — i.e. blocks ``[b, b + bit_length)``
    with ``(b + offset) % bit_length == 0`` share one nav bit, so coherent
    integration windows aligned via ``init_state(ms_elapsed=offset)`` (and
    ``TrackConfig.coherent_blocks = bit_length``) never straddle a bit edge.
    ``confidence`` is the fraction of observed sign transitions that fell in
    the winning histogram bin (1.0 = all transitions agree; ~1/bit_length =
    no bit structure). Needs enough bits in the window to see transitions
    (~20 bits, i.e. 400 ms, is comfortable at nominal data entropy).
    """
    p = jnp.asarray(prompt_re, jnp.float32)
    sign_flip = (p[1:] * p[:-1] < 0.0).astype(jnp.float32)   # [B-1, (K)]
    # A flip between blocks b and b+1 means b+1 is a bit start.
    phase = jnp.mod(jnp.arange(1, p.shape[0]), bit_length)   # [B-1]
    onehot = (
        phase[:, None] == jnp.arange(bit_length)[None, :]
    ).astype(jnp.float32)                                     # [B-1, S]
    # votes[s, (K)] = number of flips at phase s
    votes = jnp.tensordot(onehot, sign_flip, axes=((0,), (0,)))
    start = jnp.argmax(votes, axis=0).astype(jnp.int32)       # [(K)]
    total = jnp.maximum(jnp.sum(votes, axis=0), 1e-20)
    confidence = jnp.take_along_axis(
        votes, start[None, ...], axis=0
    )[0] / total
    offset = jnp.mod(-start, bit_length)
    return offset, confidence
