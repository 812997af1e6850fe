"""Ulysses-style sequence parallelism via head redistribution.

The alternative SP mode (SURVEY.md §2 parallelism table): instead of
rotating KV shards (ring), two ``all_to_all`` collectives re-shard the
activations from sequence-sharded to head-sharded, run a *completely
local* full-sequence flash attention per head group, and re-shard back.

Trade-off vs ring: Ulysses moves Q, K, V, and O once each over the
interconnect (4 tensors, all-to-all), while ring moves K and V
``n-1`` times (2 tensors, neighbor-only); Ulysses needs
``num_heads % axis_size == 0`` but keeps every flash kernel invocation
identical to the single-chip case (simplest to reason about, and the
full causal diagonal stays device-local).

Call inside ``shard_map`` with sequence sharded on ``axis_name``.
"""

from __future__ import annotations

from typing import Optional

import jax

from ..config import BlockSizes
from ..ops.attention import flash_attention


def ulysses_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    *,
    axis_name: str,
    causal: bool = False,
    sm_scale: Optional[float] = None,
    block_sizes: Optional[BlockSizes] = None,
    impl: str = "auto",
) -> jax.Array:
    """Ulysses attention over ``[B, H, n_local, D]`` sequence shards.

    Differentiable: built from two ``all_to_all`` (self-transposing) and
    the custom-vjp flash op.
    """
    heads = q.shape[1]
    axis_size = jax.lax.psum(1, axis_name)

    def seq_to_heads(x):
        # [B, H, n_loc, D] -> [B, H/n_dev, N_full, D]
        return jax.lax.all_to_all(
            x, axis_name, split_axis=1, concat_axis=2, tiled=True
        )

    def heads_to_seq(x):
        return jax.lax.all_to_all(
            x, axis_name, split_axis=2, concat_axis=1, tiled=True
        )

    q_h = seq_to_heads(q)
    k_h = seq_to_heads(k)
    v_h = seq_to_heads(v)
    o_h = flash_attention(
        q_h,
        k_h,
        v_h,
        causal=causal,
        sm_scale=sm_scale,
        block_sizes=block_sizes,
        impl=impl,
    )
    del heads, axis_size  # shapes already validated by all_to_all
    return heads_to_seq(o_h)
