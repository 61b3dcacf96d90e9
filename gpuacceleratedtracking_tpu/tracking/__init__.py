"""Closed-loop tracking: discriminators, loop filters, C/N0, scan-based loops."""

from . import cn0, discriminators, lock, loop_filter, secondary
from .lock import detect_bit_boundary, phase_lock_metric
from .secondary import (
    detect_secondary_offset,
    detect_secondary_offset_windowed,
)
from .state import TrackConfig, TrackOutput, TrackState, init_state
from .track import loop_update, track, track_bank, track_step
from .dual import DualTrackOutput, dual_config, track_bank_dual

__all__ = [
    "cn0",
    "discriminators",
    "lock",
    "loop_filter",
    "secondary",
    "detect_bit_boundary",
    "detect_secondary_offset",
    "detect_secondary_offset_windowed",
    "phase_lock_metric",
    "TrackConfig",
    "TrackOutput",
    "TrackState",
    "init_state",
    "loop_update",
    "track",
    "track_bank",
    "track_step",
]
