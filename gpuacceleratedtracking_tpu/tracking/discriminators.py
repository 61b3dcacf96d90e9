"""DLL/PLL/FLL discriminators (jittable, batched-friendly).

The reference delegates loop closure to its Tracking.jl fork (SURVEY.md §0); a
complete framework needs it natively. Formulas follow the standard GNSS
literature (Kaplan & Hegarty ch. 8, same family Tracking.jl implements):

- PLL: Costas ``atan(Q_P / I_P)`` — insensitive to data-bit flips.
- DLL: normalized noncoherent early-minus-late envelope with spacing-dependent
  gain correction.
- FLL: two-sample cross/dot product frequency discriminator.
"""

from __future__ import annotations

import jax.numpy as jnp


def pll_costas(prompt_re, prompt_im):
    """Costas phase error in **cycles** (range [-1/4, 1/4])."""
    safe_re = jnp.where(prompt_re == 0, 1e-12, prompt_re)
    return jnp.arctan(prompt_im / safe_re) / (2 * jnp.pi)


def pll_atan2(prompt_re, prompt_im):
    """Full-range four-quadrant phase error in **cycles** ([-1/2, 1/2]).

    For dataless (pilot) components after overlay wipe-off — twice the pull-in
    range and ~6 dB better tracking threshold than the Costas discriminator,
    which is insensitive to (here absent) data-bit flips.
    """
    return jnp.arctan2(prompt_im, prompt_re) / (2 * jnp.pi)


def dll_emle(early_re, early_im, late_re, late_im, spacing_chips):
    """Code error in **chips**: normalized early-minus-late envelope.

    ``spacing_chips`` = distance ``d`` between the early and late taps in chips.
    For a triangular correlation peak sampled at +/- d/2 around a replica offset
    ``eps``: ``E - L = 2 eps``, ``E + L = 2 - d``, so the unity-gain estimate is
    ``eps = (E-L)/(E+L) * (2-d)/2``.
    """
    e = jnp.sqrt(early_re**2 + early_im**2)
    l = jnp.sqrt(late_re**2 + late_im**2)
    return (e - l) / jnp.maximum(e + l, 1e-12) * (2.0 - spacing_chips) / 2.0


def fll_atan2(prev_re, prev_im, curr_re, curr_im, dt):
    """Frequency error in **Hz** from two consecutive prompts ``dt`` apart.

    Full-range (+-1/(2 dt)) four-quadrant variant — for dataless (pilot)
    components only: a data-bit flip between the prompts reads as a pi phase
    jump, i.e. a huge spurious frequency error.
    """
    cross = prev_re * curr_im - prev_im * curr_re
    dot = prev_re * curr_re + prev_im * curr_im
    return jnp.arctan2(cross, dot) / (2 * jnp.pi * dt)


def fll_atan(prev_re, prev_im, curr_re, curr_im, dt):
    """Data-insensitive frequency error in **Hz** (range +-1/(4 dt)).

    ``atan(cross/dot)``: a simultaneous sign flip of both prompts (a data
    bit edge between the pair) cancels in the ratio — the standard FLL for
    data-bearing components (Kaplan & Hegarty ch. 8).
    """
    cross = prev_re * curr_im - prev_im * curr_re
    dot = prev_re * curr_re + prev_im * curr_im
    safe = jnp.where(jnp.abs(dot) < 1e-12, 1e-12, dot)
    return jnp.arctan(cross / safe) / (2 * jnp.pi * dt)
