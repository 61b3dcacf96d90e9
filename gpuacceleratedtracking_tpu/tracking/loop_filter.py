"""Loop filters: 1st/2nd/3rd-order with trapezoidal (bilinear) integrators.

Functional state-space form so filters scan/vmap cleanly on device. Constants
follow Kaplan & Hegarty Table 8.23 (the same family as Tracking.jl's bilinear
loop filters, which the reference's CPU baseline uses through
`Tracking.downconvert_and_correlate!`'s enclosing track loop):

- 1st order: ``out = 4 * Bn * err``                      (omega0 = 4Bn)
- 2nd order: ``omega0 = Bn / 0.53``,  a2 = sqrt(2)
- 3rd order: ``omega0 = Bn / 0.7845``, a3 = 1.1, b3 = 2.4

State is a ``(x1, x2)`` tuple of f32 scalars (unused entries zero), making every
order the same pytree shape — essential for `lax.scan`/`vmap` over channel banks
with per-channel filter configs.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp


class LoopFilterState(NamedTuple):
    x1: jnp.ndarray  # velocity integrator
    x2: jnp.ndarray  # acceleration integrator (3rd order only)


def init(value: float = 0.0) -> LoopFilterState:
    """Initial state; ``value`` seeds the velocity integrator so a loop can be
    opened at a known Doppler rate."""
    value = jnp.asarray(value, jnp.float32)
    return LoopFilterState(value, jnp.zeros_like(value))


def step(
    state: LoopFilterState,
    error,
    integration_time,
    bandwidth,
    order: int = 2,
    fll_error=None,
    fll_bandwidth: float = 0.0,
) -> tuple[LoopFilterState, jnp.ndarray]:
    """One filter update. Returns ``(new_state, control_output)``.

    ``error`` in the discriminator's units; ``control_output`` in units/s
    (e.g. cycles error -> Hz command). When ``fll_error`` (Hz) is given with a
    nonzero ``fll_bandwidth`` the velocity integrator is frequency-aided
    (FLL-assisted PLL, Kaplan & Hegarty §8.5): the FLL path drives the
    integrators directly so large pull-in frequency errors converge without
    Costas cycle slipping.
    """
    t = jnp.float32(integration_time)
    err = jnp.asarray(error, jnp.float32)
    fll = None
    if fll_error is not None and fll_bandwidth > 0.0:
        fll = jnp.asarray(fll_error, jnp.float32)
    if order == 1:
        omega0 = 4.0 * bandwidth
        return state, omega0 * err
    if order == 2:
        omega0 = bandwidth / 0.53
        dx1 = omega0**2 * err * t
        if fll is not None:
            omega0f = 4.0 * fll_bandwidth
            dx1 = dx1 + omega0f * fll * t
        x1 = state.x1 + dx1
        out = 0.5 * (state.x1 + x1) + jnp.sqrt(2.0) * omega0 * err
        return LoopFilterState(x1, state.x2), out
    if order == 3:
        omega0 = bandwidth / 0.7845
        x2 = state.x2 + omega0**3 * err * t
        dx1 = (0.5 * (state.x2 + x2) + 1.1 * omega0**2 * err) * t
        if fll is not None:
            # 2nd-order FLL assist on the velocity integrator.
            omega0f = fll_bandwidth / 0.53
            x2 = x2 + omega0f**2 * fll * t
            dx1 = dx1 + jnp.sqrt(2.0) * omega0f * fll * t
        x1 = state.x1 + dx1
        out = 0.5 * (state.x1 + x1) + 2.4 * omega0 * err
        return LoopFilterState(x1, x2), out
    raise ValueError(f"order must be 1, 2 or 3, got {order}")
