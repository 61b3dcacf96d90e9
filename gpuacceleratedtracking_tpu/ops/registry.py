"""Correlator-algorithm registry — the `ALGODICT` equivalent.

The reference names its kernel variants through string->ID->value-type
dictionaries (`/root/reference/src/GPUAcceleratedTracking.jl:44-91`) so the
harness and tests can sweep algorithms by name. Here every implementation is a
callable with one uniform signature::

    fn(signal_re, signal_im, codes, prn,
       carrier_frequency, sampling_frequency, carrier_phase,
       code_frequency, code_phase,
       sample_shifts, code_length) -> (accum_re, accum_im)

Pallas kernels self-register on import of ``ops.pallas_epl``.
"""

from __future__ import annotations

from typing import Callable, Dict

from . import correlate

ALGORITHMS: Dict[str, Callable] = {}


def register(name: str, fn: Callable) -> None:
    ALGORITHMS[name] = fn


def get(name: str) -> Callable:
    # Import kernels lazily so listing/registering doesn't pay Pallas import cost.
    if name not in ALGORITHMS and name.startswith("pallas"):
        from . import pallas_epl  # noqa: F401  (registers itself)
    try:
        return ALGORITHMS[name]
    except KeyError:
        raise KeyError(
            f"Unknown correlator algorithm {name!r}; known: {sorted(ALGORITHMS)}"
        ) from None


def names() -> list[str]:
    from . import pallas_epl  # noqa: F401

    return sorted(ALGORITHMS)


register("fused_xla", correlate.correlate_fused)
register("unfused_xla", correlate.correlate_unfused)
register("xla_bank", correlate.correlate_xla_bank)

# Algorithms with the bank signature ([K]-array channel parameters and a
# shared front-end signal) -- the 3-D multi-satellite family.
BANK_ALGORITHMS = {
    "xla_bank", "pallas_bank", "pallas_bank_onehot", "pallas_bank_rows",
    "pallas_bank_comp", "pallas_bank_auto",
}
