"""Verification ladder + benchmark harness (reference parity: H4, H5, P1)."""

from .verify import RungResult, run_ladder
from .benchmark import run_high_occupancy, run_sweep

__all__ = ["RungResult", "run_ladder", "run_high_occupancy", "run_sweep"]
