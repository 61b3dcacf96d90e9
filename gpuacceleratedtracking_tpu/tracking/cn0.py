"""Carrier-to-noise-density estimation from prompt accumulators.

Moments-based (M2M4) estimator over a sliding window of prompts — the
Tracking.jl `MomentsCN0Estimator` capability, implemented as a fixed-length
ring buffer so it lives inside `lax.scan` without dynamic shapes.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp


class CN0State(NamedTuple):
    prompts_re: jnp.ndarray  # [window]
    prompts_im: jnp.ndarray  # [window]
    index: jnp.ndarray       # scalar int32, count of prompts seen


def init(window: int = 20) -> CN0State:
    return CN0State(
        jnp.zeros(window, jnp.float32),
        jnp.zeros(window, jnp.float32),
        jnp.int32(0),
    )


def update(state: CN0State, prompt_re, prompt_im) -> CN0State:
    window = state.prompts_re.shape[0]
    slot = jnp.mod(state.index, window)
    return CN0State(
        state.prompts_re.at[slot].set(prompt_re),
        state.prompts_im.at[slot].set(prompt_im),
        state.index + 1,
    )


def estimate(state: CN0State, integration_time) -> jnp.ndarray:
    """C/N0 in dB-Hz via the second/fourth-moment method.

    M2 = E[|P|^2], M4 = E[|P|^4];  Pd = sqrt(2 M2^2 - M4)  (signal power),
    Pn = M2 - Pd;  C/N0 = Pd / (Pn * T).
    """
    p2 = state.prompts_re**2 + state.prompts_im**2
    m2 = jnp.mean(p2)
    m4 = jnp.mean(p2**2)
    pd = jnp.sqrt(jnp.maximum(2.0 * m2**2 - m4, 1e-20))
    pn = jnp.maximum(m2 - pd, 1e-20)
    cn0 = pd / (pn * integration_time)
    return 10.0 * jnp.log10(jnp.maximum(cn0, 1e-20))
