"""Public ops."""

from .attention import flash_attention, mha

__all__ = ["flash_attention", "mha"]
