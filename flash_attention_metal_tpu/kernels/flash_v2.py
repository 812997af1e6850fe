"""K3 — FlashAttention V2 rung: the tuned fp32 kernel.

Capability parity with the reference's top-performing
``flash_attention_v2_kernel`` (``kernels.metal:457-596``): fp32 in/out,
double-buffered K/V staging (Pallas grid pipelining + two-level KV tiling
in the shared engine, see ``flash_fwd.py``), vector-lane-aligned loads,
and sweepable block sizes mirroring the reference's 24KB-budget tile
calculation (``kernels.metal:478-481``) and 16x16-vs-32x32 occupancy study
(``README.md:25-28``).  The engine itself lives in ``flash_fwd.py``; this
rung pins the V2 precision policy (fp32 everywhere, no LSE output).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp

from ..config import BlockSizes
from .flash_fwd import flash_attention_fwd


@functools.partial(
    jax.jit, static_argnames=("sm_scale", "causal", "block_sizes", "interpret")
)
def flash_attention_v2(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    *,
    sm_scale: Optional[float] = None,
    causal: bool = False,
    block_sizes: Optional[BlockSizes] = None,
    interpret: bool = False,
) -> jax.Array:
    """Tuned fp32 flash attention over ``[B, H, N, D]`` inputs."""
    if q.dtype != jnp.float32:
        raise ValueError(
            f"flash_attention_v2 is the fp32 rung (got {q.dtype}); use "
            "flash_attention_mxu for half-precision inputs"
        )
    return flash_attention_fwd(
        q,
        k,
        v,
        sm_scale=sm_scale,
        causal=causal,
        block_sizes=block_sizes,
        save_lse=False,
        interpret=interpret,
    )
