"""Closed-loop tracking: discriminators, loop filters, C/N0, scan-based loops."""

from . import cn0, discriminators, loop_filter, secondary
from .secondary import detect_secondary_offset
from .state import TrackConfig, TrackOutput, TrackState, init_state
from .track import loop_update, track, track_bank, track_step
from .dual import DualTrackOutput, dual_config, track_bank_dual

__all__ = [
    "cn0",
    "discriminators",
    "loop_filter",
    "secondary",
    "detect_secondary_offset",
    "TrackConfig",
    "TrackOutput",
    "TrackState",
    "init_state",
    "loop_update",
    "track",
    "track_bank",
    "track_step",
]
