"""Distribution layer: mesh helpers, ring/context/Ulysses attention."""

from .mesh import AXIS_DATA, AXIS_SEQUENCE, AXIS_TENSOR, attention_shardings, make_mesh
from .ring import (
    make_ring_attention,
    merge_partials,
    ring_flash_attention,
    ring_flash_attention_diff,
)
from .context import allgather_attention, lse_combine_attention
from .ulysses import ulysses_attention

__all__ = [
    "AXIS_DATA",
    "AXIS_SEQUENCE",
    "AXIS_TENSOR",
    "attention_shardings",
    "make_mesh",
    "make_ring_attention",
    "merge_partials",
    "ring_flash_attention",
    "ring_flash_attention_diff",
    "allgather_attention",
    "lse_combine_attention",
    "ulysses_attention",
]
