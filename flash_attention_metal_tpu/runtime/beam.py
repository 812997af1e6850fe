"""Beam-search decoding on the slot-cache primitives.

The continuous-batching engine covers sampling/greedy serving; this
module adds the classic highest-probability search for quality-first
decoding (translation-style workloads).  Beams live in the batch
dimension of an ordinary dense ``KVCache`` — one ``decode_step`` per
round scores all beams at once on the MXU, and beam reordering is a
single gather on the cache's slot axis (cheap: [L, B, Hk, N, D] with
B = beam_width).

Finished beams (EOS) are frozen with the standard mask trick: their row
proposes exactly one zero-logprob continuation, so they survive the
top-k unchanged and fixed shapes are preserved under jit.
"""

from __future__ import annotations

import functools
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp

from ..models.transformer import ModelConfig, Params
from .decode import decode_step, prefill_slot
from .kv_cache import KVCache, init_cache


def _reorder_slots(cache: KVCache, parents: jax.Array) -> KVCache:
    """Gather cache slots by parent beam index (dense cache layout:
    rank-1 leaves are per-slot lengths, others are [L, B, ...])."""

    def pick(leaf):
        if leaf.ndim == 1:
            return leaf[parents]
        return leaf[:, parents]

    return jax.tree_util.tree_map(pick, cache)


@functools.partial(
    jax.jit, static_argnames=("cfg", "beam_width", "eos_id")
)
def _beam_step(
    params, cfg, cache, tokens, cum_logp, finished, out_tokens, step,
    *, beam_width: int, eos_id: int,
):
    logits, cache = _bs_decode(params, cfg, cache, tokens, finished)
    logp = jax.nn.log_softmax(logits, axis=-1)  # [B, V]
    v = logp.shape[-1]
    # Finished beams propose a single frozen continuation (token 0 at
    # logprob 0); live beams propose the full vocab.
    frozen = jnp.full_like(logp, -jnp.inf).at[:, 0].set(0.0)
    logp = jnp.where(finished[:, None], frozen, logp)
    total = cum_logp[:, None] + logp  # [B, V]
    flat = total.reshape(-1)
    top, idx = jax.lax.top_k(flat, beam_width)
    parents = idx // v
    toks = (idx % v).astype(jnp.int32)

    cache = _reorder_slots(cache, parents)
    was_finished = finished[parents]
    # Frozen beams' dummy continuation must not pollute their history.
    write = jnp.where(was_finished, jnp.int32(-1), toks)
    out_tokens = out_tokens[parents].at[:, step].set(write)
    now_finished = was_finished | (toks == eos_id)
    return cache, toks, top, now_finished, out_tokens


def _bs_decode(params, cfg, cache, tokens, finished):
    # decode_step bumps lengths only for active slots; frozen beams stay
    # put so their KV history remains exactly their finished sequence.
    return decode_step(params, cfg, cache, tokens, jnp.logical_not(finished))


def beam_search_generate(
    params: Params,
    cfg: ModelConfig,
    prompt: List[int],
    *,
    beam_width: int = 4,
    max_new_tokens: int = 32,
    max_len: int = 1024,
    eos_id: int = -1,
    length_penalty: float = 0.0,
    return_all: bool = False,
) -> Tuple[List[int], float]:
    """Highest-probability continuation of ``prompt``.

    Returns ``(tokens, score)`` where score is the total log-probability
    normalized by ``len ** length_penalty`` (0.0 = raw sum).  With
    ``return_all=True`` returns the full beam lists instead.
    Dense KV caches only (beam reordering gathers slot axes).
    """
    if beam_width < 1:
        raise ValueError(f"beam_width must be >= 1, got {beam_width}")
    cache = init_cache(
        cfg.n_layers, beam_width, cfg.n_kv_heads, max_len, cfg.head_dim,
        dtype=cfg.dtype,
    )
    n_pad = max(((len(prompt) + 127) // 128) * 128, 128)
    padded = jnp.zeros((n_pad,), jnp.int32).at[: len(prompt)].set(
        jnp.asarray(prompt, jnp.int32)
    )
    logits0, cache = prefill_slot(
        params, cfg, cache, padded, jnp.int32(len(prompt)), slot=0
    )

    # Broadcast slot 0's prefilled KV (and length) to every beam.
    def bcast(leaf):
        if leaf.ndim == 1:
            return jnp.broadcast_to(leaf[:1], leaf.shape)
        return jnp.broadcast_to(leaf[:, :1], leaf.shape)

    cache = jax.tree_util.tree_map(bcast, cache)

    # First expansion: top beam_width tokens of the prompt's next-token
    # distribution seed the beams.
    logp0 = jax.nn.log_softmax(logits0.astype(jnp.float32))
    cum_logp, first = jax.lax.top_k(logp0.reshape(-1), beam_width)
    first = first.astype(jnp.int32)
    out_tokens = jnp.full((beam_width, max_new_tokens), -1, jnp.int32)
    out_tokens = out_tokens.at[:, 0].set(first)
    finished = first == eos_id
    tokens = first

    for step in range(1, max_new_tokens):
        if bool(jnp.all(finished)):
            break
        cache, tokens, cum_logp, finished, out_tokens = _beam_step(
            params, cfg, cache, tokens, cum_logp, finished, out_tokens,
            jnp.int32(step), beam_width=beam_width, eos_id=eos_id,
        )

    outs = []
    for b in range(beam_width):
        seq = [int(t) for t in out_tokens[b] if int(t) >= 0]
        # Trim at EOS (inclusive end — EOS itself is not returned).
        if eos_id >= 0 and eos_id in seq:
            seq = seq[: seq.index(eos_id)]
        n = max(len(seq), 1)
        score = float(cum_logp[b]) / (n**length_penalty if length_penalty else 1.0)
        outs.append((seq, score))
    outs.sort(key=lambda t: -t[1])
    if return_all:
        return outs
    return outs[0]
