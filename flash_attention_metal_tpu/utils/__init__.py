"""Utilities: roofline accounting, timing, plotting."""

from .roofline import (
    attention_bytes,
    attention_flops,
    detect_chip,
    roofline_fraction,
    roofline_time,
)
from .timing import measure

__all__ = [
    "attention_bytes",
    "attention_flops",
    "detect_chip",
    "roofline_fraction",
    "roofline_time",
    "measure",
]
