"""Serving runtime: KV cache, decode steps, continuous batching engine."""

from .kv_cache import KVCache, append_tokens, bump_lengths, init_cache, reset_slot
from .paged_kv import (
    PagedKVCache,
    PagedQuantKVCache,
    PageAllocator,
    append_tokens_paged,
    append_tokens_paged_quant,
    init_paged_cache,
    init_paged_quant_cache,
)
from .decode import decode_step, prefill_slot, sample
from .engine import DecodeEngine, Request
from .beam import beam_search_generate
from .speculative import speculative_generate, speculative_step

__all__ = [
    "KVCache",
    "PagedKVCache",
    "PagedQuantKVCache",
    "PageAllocator",
    "append_tokens_paged",
    "append_tokens_paged_quant",
    "init_paged_cache",
    "init_paged_quant_cache",
    "append_tokens",
    "bump_lengths",
    "init_cache",
    "reset_slot",
    "decode_step",
    "prefill_slot",
    "sample",
    "DecodeEngine",
    "Request",
    "speculative_generate",
    "speculative_step",
    "beam_search_generate",
]
