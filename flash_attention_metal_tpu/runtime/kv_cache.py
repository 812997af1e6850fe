"""Dense per-slot KV cache for autoregressive decode.

The reference's only cross-invocation state is the logsumexp tensor its
forward persists for backward (``kernels.metal:861-864``); the decode
runtime generalizes that idea into real state management: a fixed-capacity
``[L, B, H_kv, max_len, D]`` cache with per-slot valid lengths.  Ragged
lengths never touch the kernels as dynamic shapes — they ride the
per-batch causal offset (``flash_fwd.py``), so one compiled program
serves every batch composition (continuous batching stays jit-friendly).
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class KVCache:
    """k/v: ``[n_layers, B, H_kv, max_len, head_dim]``; lengths: ``[B]``."""

    k: jax.Array
    v: jax.Array
    lengths: jax.Array  # int32 valid token count per slot

    def tree_flatten(self):
        return (self.k, self.v, self.lengths), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)

    @property
    def max_len(self) -> int:
        return self.k.shape[3]

    @property
    def batch(self) -> int:
        return self.k.shape[1]


def init_cache(
    n_layers: int,
    batch: int,
    n_kv_heads: int,
    max_len: int,
    head_dim: int,
    dtype=jnp.bfloat16,
) -> KVCache:
    if max_len % 128:
        raise ValueError(f"max_len={max_len} must be a multiple of 128")
    shape = (n_layers, batch, n_kv_heads, max_len, head_dim)
    return KVCache(
        k=jnp.zeros(shape, dtype),
        v=jnp.zeros(shape, dtype),
        lengths=jnp.zeros((batch,), jnp.int32),
    )


def append_tokens(
    cache: KVCache,
    layer: int,
    k_new: jax.Array,
    v_new: jax.Array,
) -> KVCache:
    """Insert ``[B, H_kv, T, D]`` keys/values at each slot's write head.

    Does NOT bump ``lengths`` (the caller bumps once after all layers).
    """

    def put(buf, new, start):
        return jax.lax.dynamic_update_slice(buf, new, (0, start, 0))

    k_l = jax.vmap(put)(cache.k[layer], k_new, cache.lengths)
    v_l = jax.vmap(put)(cache.v[layer], v_new, cache.lengths)
    return KVCache(
        k=cache.k.at[layer].set(k_l),
        v=cache.v.at[layer].set(v_l),
        lengths=cache.lengths,
    )


def bump_lengths(cache: KVCache, n: int, mask: jax.Array) -> KVCache:
    """Advance write heads by ``n`` for slots where ``mask`` is True."""
    return KVCache(
        k=cache.k,
        v=cache.v,
        lengths=cache.lengths + jnp.where(mask, n, 0).astype(jnp.int32),
    )


def reset_slot(cache: KVCache, slot: int) -> KVCache:
    """Free a slot for reuse (stale KV is masked out by lengths=0)."""
    return KVCache(
        k=cache.k, v=cache.v, lengths=cache.lengths.at[slot].set(0)
    )
