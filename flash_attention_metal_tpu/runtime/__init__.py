"""Serving runtime: KV cache, decode steps, continuous batching engine."""

from .kv_cache import KVCache, append_tokens, bump_lengths, init_cache, reset_slot
from .decode import decode_step, prefill_slot, sample
from .engine import DecodeEngine, Request

__all__ = [
    "KVCache",
    "append_tokens",
    "bump_lengths",
    "init_cache",
    "reset_slot",
    "decode_step",
    "prefill_slot",
    "sample",
    "DecodeEngine",
    "Request",
]
