"""Secondary-code synchronization — the Tracking.jl `SecondaryCodeOrBitDetector` role.

Overlay codes (L5 Neuman-Hofman NH10/NH20; GPS L1 C/A's 20 ms data bits are the
degenerate all-ones + unknown-sign case) flip the prompt accumulator sign once
per primary code period. Before coherent integration beyond one period, the
receiver must find the overlay phase: which overlay bit the first tracked block
fell on. This module detects it from a window of prompt accumulators by cyclic
sign correlation — pure JAX, runs on device over a whole channel bank at once.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def detect_secondary_offset(
    prompt_re: jax.Array,
    secondary_code,
) -> tuple[jax.Array, jax.Array]:
    """Find the overlay phase from tracked prompts.

    Args:
      prompt_re: ``[B]`` (or ``[B, K]``) in-phase prompt accumulators from ``B``
        consecutive locked blocks (one per primary code period).
      secondary_code: ``[S]`` +/-1 overlay signs.

    Returns:
      (offset, confidence): ``offset`` (int32, per channel) such that block ``b``
      carries overlay sign ``secondary_code[(b + offset) % S]``; feed
      ``init_state(ms_elapsed=offset)`` (or add to the block counter) so
      `TrackConfig.secondary_code` wipe-off is aligned. ``confidence`` is the
      normalized correlation magnitude of the best offset in [0, 1]
      (1 = perfect sign match over the window).
    """
    sc = jnp.asarray(secondary_code, jnp.float32)
    s = sc.shape[0]
    p = jnp.asarray(prompt_re, jnp.float32)
    b = p.shape[0]
    # sign pattern expected at offset o: sc[(arange(B) + o) % S]
    idx = (jnp.arange(b)[None, :] + jnp.arange(s)[:, None]) % s   # [S, B]
    patterns = sc[idx]                                            # [S, B]
    # Correlate each candidate pattern against the prompt signs.
    corr = jnp.tensordot(patterns, p, axes=((1,), (0,)))          # [S, ...]
    offset = jnp.argmax(jnp.abs(corr), axis=0).astype(jnp.int32)
    norm = jnp.sum(jnp.abs(p), axis=0)
    best = jnp.max(jnp.abs(corr), axis=0)
    confidence = jnp.where(norm > 0, best / norm, 0.0)
    return offset, confidence


def detect_secondary_offset_windowed(
    prompt_re: jax.Array,
    secondary_code,
) -> tuple[jax.Array, jax.Array]:
    """Data-robust overlay sync for signals with nav bits but no pilot.

    `detect_secondary_offset` correlates over the whole window, so a nav-bit
    sign flip inside the window (e.g. BeiDou B1I D1: one 50 bps bit per NH20
    cycle; there is no dataless pilot like L5's Q5) decorrelates it. When
    bit edges are aligned to overlay-cycle boundaries (the D1 structure per
    the BDS ICD), at least one of the ``S`` single-cycle window phases is
    bit-clean: correlate each phase's length-``S`` window independently and
    take, per channel, the phase with the highest confidence.

    Args:
      prompt_re: ``[B]`` or ``[B, K]`` prompts from consecutive locked
        blocks, ``B >= 2 S - 1`` so every window phase has a full window.
      secondary_code: ``[S]`` +/-1 overlay signs.

    Returns:
      (offset, confidence) with the same convention as
      `detect_secondary_offset`: block ``b`` (index into ``prompt_re``)
      carries sign ``secondary_code[(b + offset) % S]``.
    """
    sc = jnp.asarray(secondary_code, jnp.float32)
    s = sc.shape[0]
    p = jnp.asarray(prompt_re, jnp.float32)
    if p.shape[0] < 2 * s - 1:
        raise ValueError(
            f"need >= {2 * s - 1} blocks for S={s} window phases, got "
            f"{p.shape[0]}"
        )
    windows = jnp.stack([p[w: w + s] for w in range(s)])     # [S, S, ...]
    offs, confs = jax.vmap(
        lambda win: detect_secondary_offset(win, sc)
    )(windows)                                               # [S, ...] each
    # Window phase w sees local offset o_w; globally sign(b) =
    # sc[(b - w + o_w) % S].
    offs = (offs - jnp.arange(s).reshape((s,) + (1,) * (offs.ndim - 1))) % s
    best_w = jnp.argmax(confs, axis=0)                       # per channel
    offset = jnp.take_along_axis(
        offs, best_w[None], axis=0
    )[0].astype(jnp.int32)
    confidence = jnp.take_along_axis(confs, best_w[None], axis=0)[0]
    return offset, confidence
