"""K4+K5 — the MXU half-precision production rung.

Capability parity with the reference's ``flash_attention_simd_kernel``
(V3, ``kernels.metal:173-455``) and ``flash_attention_v4_half_kernel``
(V4, ``kernels.metal:597-883``), re-designed for the TPU matrix unit:

* simdgroup_half8x8 MMA tiles       -> 128x128 MXU ``dot_general`` in
                                       bf16/fp16 with fp32 accumulation
* Spill-Scale-Reload / diag-matmul
  accumulator correction            -> direct multiplicative rescale of the
                                       fp32 VMEM accumulator (TPU scratch is
                                       addressable; no spill needed)
* batch/head 3-D dispatch grid
  (``main.mm:1001-1005``)           -> leading (batch, head) grid axes
* ``is_causal`` whole-block skip +
  fine masking (``kernels.metal:
  682,737-754``)                    -> pruned grid steps + iota masks
* logsumexp output L = m + log(l)
  (``kernels.metal:861-864``)       -> optional lane-replicated LSE output
                                       consumed by ``flash_bwd.py``

bf16 is the TPU-native half type (fp16 inputs are accepted and fed to the
MXU as-is); all softmax statistics are fp32.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple, Union

import jax

from ..config import BlockSizes
from .flash_fwd import flash_attention_fwd


@functools.partial(
    jax.jit,
    static_argnames=(
        "sm_scale",
        "causal",
        "window",
        "block_sizes",
        "save_lse",
        "interpret",
    ),
)
def flash_attention_mxu(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    *,
    sm_scale: Optional[float] = None,
    causal: bool = False,
    window: Optional[int] = None,
    block_sizes: Optional[BlockSizes] = None,
    save_lse: bool = False,
    interpret: bool = False,
) -> Union[jax.Array, Tuple[jax.Array, jax.Array]]:
    """Half-precision MXU flash attention over ``[B, H, N, D]`` inputs.

    Returns ``o`` or ``(o, lse)``; ``lse`` is lane-replicated
    ``[B, H, N, 128]`` fp32 (see ``flash_fwd.flash_attention_fwd``).
    """
    return flash_attention_fwd(
        q,
        k,
        v,
        sm_scale=sm_scale,
        causal=causal,
        window=window,
        block_sizes=block_sizes,
        save_lse=save_lse,
        interpret=interpret,
    )
