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
