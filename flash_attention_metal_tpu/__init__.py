"""TPU-native flash-attention framework.

A brand-new JAX/Pallas re-design of the capabilities of
``2thleZ/flash_attention_metal`` (see SURVEY.md): the full kernel ladder
(naive -> tiled V1 -> tuned V2 -> MXU half-precision with causal/LSE ->
FA-2 backward -> quantized KV), a golden-oracle verification ladder, a
roofline-aware benchmark harness, and — beyond the reference's single-chip
scope — ring/sequence-parallel attention over device meshes and a
continuous-batching decode runtime.
"""

from .config import AttentionConfig, BlockSizes
from .ops.attention import flash_attention, mha

__version__ = "0.1.0"

__all__ = [
    "AttentionConfig",
    "BlockSizes",
    "flash_attention",
    "mha",
    "__version__",
]
