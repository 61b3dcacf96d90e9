"""Compute ops: replica generation, correlation paths, reductions, kernels."""

from .replica import (
    gen_code_replica,
    gen_code_replica_quantized,
    gen_carrier_replica,
    code_phase_steps,
)
from .correlate import (
    downconvert,
    epl_accumulate,
    correlate_fused,
    correlate_unfused,
)

__all__ = [
    "gen_code_replica",
    "gen_code_replica_quantized",
    "gen_carrier_replica",
    "code_phase_steps",
    "downconvert",
    "epl_accumulate",
    "correlate_fused",
    "correlate_unfused",
]
