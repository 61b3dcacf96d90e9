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
from .reduce import get_reduction, reduce_cplx, reduce_cplx_multi, reduce_pure

__all__ = [
    "gen_code_replica",
    "gen_code_replica_quantized",
    "gen_carrier_replica",
    "code_phase_steps",
    "downconvert",
    "epl_accumulate",
    "correlate_fused",
    "correlate_unfused",
    "get_reduction",
    "reduce_pure",
    "reduce_cplx",
    "reduce_cplx_multi",
]
