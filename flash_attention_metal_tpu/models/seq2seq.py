"""FlashSeq2Seq: encoder-decoder family with cross-attention.

Third model family on the kernel stack (after the FlashLM decoder and
FlashEncoder): a T5-shaped encoder-decoder for translation/summarization
workloads.  Every attention call is the framework's flash kernel:

* encoder self-attention — the non-causal path with pad masking via
  ``SegmentIds`` (reuses ``models/encoder.py``'s stack wholesale);
* decoder self-attention — the causal path, incremental decode through
  the same ``q_offset`` convention as FlashLM serving;
* cross-attention — the non-causal path with ``n_q != n_kv`` and
  source-pad masking through segment ids; per-layer K/V projections of
  the encoder memory are computed ONCE at decode time and reused every
  step (the seq2seq analog of a prefilled KV cache).

Positions: RoPE on both self-attentions; cross-attention runs without
positional rotation (queries address the memory content-wise, the
standard choice for rotary encoder-decoders).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp

from ..config import SegmentIds
from ..ops.attention import flash_attention
from .encoder import EncoderConfig, encode
from .encoder import init_params as init_encoder_params
from .transformer import (
    _merge_heads,
    _split_heads,
    mlp_block,
    rms_norm,
    rope,
    weight,
)

Params = Dict[str, Any]


@dataclasses.dataclass(frozen=True)
class Seq2SeqConfig:
    vocab_size: int = 32768
    d_model: int = 512
    enc_layers: int = 4
    dec_layers: int = 4
    n_heads: int = 8
    n_kv_heads: int = 8
    head_dim: int = 64
    d_ff: int = 1408
    max_src_len: int = 512
    max_tgt_len: int = 512
    rope_theta: float = 10000.0
    dtype: Any = jnp.bfloat16
    attn_impl: str = "auto"

    @property
    def encoder_cfg(self) -> EncoderConfig:
        return EncoderConfig(
            vocab_size=self.vocab_size,
            d_model=self.d_model,
            n_layers=self.enc_layers,
            n_heads=self.n_heads,
            n_kv_heads=self.n_kv_heads,
            head_dim=self.head_dim,
            d_ff=self.d_ff,
            max_seq_len=self.max_src_len,
            rope_theta=self.rope_theta,
            dtype=self.dtype,
            attn_impl=self.attn_impl,
        )


def init_params(key: jax.Array, cfg: Seq2SeqConfig) -> Params:
    ke, kd = jax.random.split(key)
    keys = jax.random.split(kd, cfg.dec_layers + 2)

    def dense(k, fan_in, shape):
        return jax.random.normal(k, shape, jnp.float32) * (fan_in**-0.5)

    d, h, hk, hd, f = (
        cfg.d_model, cfg.n_heads, cfg.n_kv_heads, cfg.head_dim, cfg.d_ff,
    )
    layers = []
    for i in range(cfg.dec_layers):
        lk = jax.random.split(keys[i], 12)
        layers.append(
            {
                "attn_norm": jnp.ones((d,), jnp.float32),
                "wq": dense(lk[0], d, (d, h * hd)),
                "wk": dense(lk[1], d, (d, hk * hd)),
                "wv": dense(lk[2], d, (d, hk * hd)),
                "wo": dense(lk[3], h * hd, (h * hd, d)),
                "cross_norm": jnp.ones((d,), jnp.float32),
                "cwq": dense(lk[4], d, (d, h * hd)),
                "cwk": dense(lk[5], d, (d, hk * hd)),
                "cwv": dense(lk[6], d, (d, hk * hd)),
                "cwo": dense(lk[7], h * hd, (h * hd, d)),
                "mlp_norm": jnp.ones((d,), jnp.float32),
                "w_gate": dense(lk[8], d, (d, f)),
                "w_up": dense(lk[9], d, (d, f)),
                "w_down": dense(lk[10], f, (f, d)),
            }
        )
    return {
        "encoder": init_encoder_params(ke, cfg.encoder_cfg),
        "embed": jax.random.normal(keys[-2], (cfg.vocab_size, d), jnp.float32)
        * 0.02,
        "layers": layers,
        "final_norm": jnp.ones((d,), jnp.float32),
        "lm_head": dense(keys[-1], d, (d, cfg.vocab_size)),
    }


def encode_src(
    params: Params,
    src_tokens: jax.Array,
    src_mask: Optional[jax.Array],
    cfg: Seq2SeqConfig,
) -> jax.Array:
    """Encoder memory ``[B, S, d]`` (pads provably inert via segments)."""
    return encode(
        params["encoder"], src_tokens, src_mask, cfg=cfg.encoder_cfg
    )


def _cross_attention(
    layer: Params,
    x: jax.Array,
    memory_kv: Tuple[jax.Array, jax.Array],
    src_mask: jax.Array,
    cfg: Seq2SeqConfig,
) -> jax.Array:
    """q from the decoder stream, K/V precomputed from encoder memory."""
    dt = cfg.dtype
    h = rms_norm(x, layer["cross_norm"])
    q = _split_heads(h @ weight(layer["cwq"], dt), cfg.n_heads, cfg.head_dim)
    ck, cv = memory_kv
    b, t = x.shape[0], x.shape[1]
    sids = SegmentIds(
        q=jnp.ones((b, t), jnp.int32), kv=src_mask.astype(jnp.int32)
    )
    o = flash_attention(
        q, ck, cv, causal=False, segment_ids=sids, impl=cfg.attn_impl
    )
    return x + _merge_heads(o) @ weight(layer["cwo"], dt)


def _memory_kv(layer: Params, memory: jax.Array, cfg: Seq2SeqConfig):
    """Per-layer cross K/V of the encoder memory (compute once, reuse
    every decode step — the cross-attention 'prefill')."""
    dt = cfg.dtype
    ck = _split_heads(
        memory @ weight(layer["cwk"], dt), cfg.n_kv_heads, cfg.head_dim
    )
    cv = _split_heads(
        memory @ weight(layer["cwv"], dt), cfg.n_kv_heads, cfg.head_dim
    )
    return ck, cv


def decoder_forward(
    params: Params,
    memory: jax.Array,
    src_mask: jax.Array,
    tgt_tokens: jax.Array,
    cfg: Seq2SeqConfig,
) -> jax.Array:
    """Teacher-forced decoder: ``[B, T]`` targets -> ``[B, T, V]`` logits."""
    dt = cfg.dtype
    b, t = tgt_tokens.shape
    positions = jnp.broadcast_to(jnp.arange(t), (b, t))
    x = params["embed"][tgt_tokens].astype(dt)
    for layer in params["layers"]:
        # Causal self-attention (FlashLM block shape).
        h = rms_norm(x, layer["attn_norm"])
        q = _split_heads(h @ weight(layer["wq"], dt), cfg.n_heads, cfg.head_dim)
        k = _split_heads(h @ weight(layer["wk"], dt), cfg.n_kv_heads, cfg.head_dim)
        v = _split_heads(h @ weight(layer["wv"], dt), cfg.n_kv_heads, cfg.head_dim)
        q = rope(q, positions, cfg.rope_theta)
        k = rope(k, positions, cfg.rope_theta)
        o = flash_attention(q, k, v, causal=True, impl=cfg.attn_impl)
        x = x + _merge_heads(o) @ weight(layer["wo"], dt)
        x = _cross_attention(
            layer, x, _memory_kv(layer, memory, cfg), src_mask, cfg
        )
        x = mlp_block(layer, x, cfg)
    x = rms_norm(x, params["final_norm"])
    return (x @ weight(params["lm_head"], dt)).astype(jnp.float32)


def forward(
    params: Params,
    src_tokens: jax.Array,
    tgt_tokens: jax.Array,
    cfg: Seq2SeqConfig,
    src_mask: Optional[jax.Array] = None,
) -> jax.Array:
    """Full seq2seq forward: source batch + shifted targets -> logits."""
    if src_mask is None:
        src_mask = jnp.ones(src_tokens.shape, jnp.int32)
    memory = encode_src(params, src_tokens, src_mask, cfg)
    return decoder_forward(params, memory, src_mask, tgt_tokens, cfg)


def loss_fn(
    params: Params,
    src_tokens: jax.Array,
    tgt_tokens: jax.Array,
    cfg: Seq2SeqConfig,
    src_mask: Optional[jax.Array] = None,
    tgt_mask: Optional[jax.Array] = None,
) -> jax.Array:
    """Next-token CE on the target side (optionally pad-masked)."""
    logits = forward(params, src_tokens, tgt_tokens, cfg, src_mask)[:, :-1]
    targets = tgt_tokens[:, 1:]
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, targets[..., None], axis=-1)[..., 0]
    if tgt_mask is not None:
        m = tgt_mask[:, 1:].astype(nll.dtype)
        return jnp.sum(nll * m) / jnp.maximum(jnp.sum(m), 1.0)
    return jnp.mean(nll)


def greedy_generate(
    params: Params,
    cfg: Seq2SeqConfig,
    src_tokens: List[int],
    *,
    bos_id: int = 1,
    eos_id: int = -1,
    max_new_tokens: int = 32,
) -> List[int]:
    """Incremental greedy decode for one source sequence.

    Encoder memory and the per-layer cross K/V are computed once; each
    step runs one causal self-attention against the growing target KV
    cache (``q_offset`` = current length, the FlashLM decode convention)
    plus one cross-attention against the fixed memory.
    """
    dt = cfg.dtype
    s_pad = max(((len(src_tokens) + 127) // 128) * 128, 128)
    src = jnp.zeros((1, s_pad), jnp.int32).at[0, : len(src_tokens)].set(
        jnp.asarray(src_tokens, jnp.int32)
    )
    src_mask = (jnp.arange(s_pad) < len(src_tokens)).astype(jnp.int32)[None]
    memory = encode_src(params, src, src_mask, cfg)
    mem_kv = [_memory_kv(layer, memory, cfg) for layer in params["layers"]]

    t_cap = max(((max_new_tokens + 1 + 127) // 128) * 128, 128)
    kc = jnp.zeros(
        (cfg.dec_layers, 1, cfg.n_kv_heads, t_cap, cfg.head_dim), dt
    )
    vc = jnp.zeros_like(kc)

    @jax.jit
    def step(kc, vc, tok, length):
        pos = length[None, None]
        x = params["embed"][tok[None, None]].astype(dt)
        for i, layer in enumerate(params["layers"]):
            h = rms_norm(x, layer["attn_norm"])
            q = _split_heads(
                h @ weight(layer["wq"], dt), cfg.n_heads, cfg.head_dim
            )
            k = _split_heads(
                h @ weight(layer["wk"], dt), cfg.n_kv_heads, cfg.head_dim
            )
            v = _split_heads(
                h @ weight(layer["wv"], dt), cfg.n_kv_heads, cfg.head_dim
            )
            q = rope(q, pos, cfg.rope_theta)
            k = rope(k, pos, cfg.rope_theta)
            kc = jax.lax.dynamic_update_slice(kc, k[None], (i, 0, 0, length, 0))
            vc = jax.lax.dynamic_update_slice(vc, v[None], (i, 0, 0, length, 0))
            o = flash_attention(
                q, kc[i], vc[i], q_offset=length, causal=True,
                impl=cfg.attn_impl,
            )
            x = x + _merge_heads(o) @ weight(layer["wo"], dt)
            x = _cross_attention(layer, x, mem_kv[i], src_mask, cfg)
            x = mlp_block(layer, x, cfg)
        x = rms_norm(x, params["final_norm"])
        logits = (x @ weight(params["lm_head"], dt)).astype(jnp.float32)
        return kc, vc, jnp.argmax(logits[0, 0]).astype(jnp.int32)

    out: List[int] = []
    tok = jnp.int32(bos_id)
    for n in range(max_new_tokens):
        kc, vc, tok = step(kc, vc, tok, jnp.int32(n))
        if int(tok) == eos_id:
            break
        out.append(int(tok))
    return out


def beam_generate(
    params: Params,
    cfg: Seq2SeqConfig,
    src_tokens: List[int],
    *,
    beam_width: int = 4,
    bos_id: int = 1,
    eos_id: int = -1,
    max_new_tokens: int = 32,
    length_penalty: float = 0.0,
    return_all: bool = False,
):
    """Beam-search decode for one source sequence.

    Shares the generic loop with the FlashLM beam search
    (``runtime/beam.py``): beams ride the batch axis of the decoder's
    self-KV cache, the cross-attention memory K/V are broadcast once per
    source, and one batched step scores every beam per round.
    """
    from ..runtime.beam import beam_search_loop

    dt = cfg.dtype
    s_pad = max(((len(src_tokens) + 127) // 128) * 128, 128)
    src = jnp.zeros((1, s_pad), jnp.int32).at[0, : len(src_tokens)].set(
        jnp.asarray(src_tokens, jnp.int32)
    )
    src_mask1 = (jnp.arange(s_pad) < len(src_tokens)).astype(jnp.int32)[None]
    memory = encode_src(params, src, src_mask1, cfg)
    src_mask = jnp.broadcast_to(src_mask1, (beam_width, s_pad))
    mem_kv = [
        jax.tree_util.tree_map(
            lambda x: jnp.broadcast_to(
                x, (beam_width,) + x.shape[1:]
            ),
            _memory_kv(layer, memory, cfg),
        )
        for layer in params["layers"]
    ]

    t_cap = max(((max_new_tokens + 1 + 127) // 128) * 128, 128)
    kc = jnp.zeros(
        (cfg.dec_layers, beam_width, cfg.n_kv_heads, t_cap, cfg.head_dim),
        dt,
    )
    vc = jnp.zeros_like(kc)
    lengths = jnp.zeros((beam_width,), jnp.int32)

    def step_fn(state, tokens, finished):
        kc, vc, lengths = state
        active = jnp.logical_not(finished)
        pos = lengths[:, None]
        x = params["embed"][tokens[:, None]].astype(dt)
        for i, layer in enumerate(params["layers"]):
            h = rms_norm(x, layer["attn_norm"])
            q = _split_heads(
                h @ weight(layer["wq"], dt), cfg.n_heads, cfg.head_dim
            )
            k = _split_heads(
                h @ weight(layer["wk"], dt), cfg.n_kv_heads, cfg.head_dim
            )
            v = _split_heads(
                h @ weight(layer["wv"], dt), cfg.n_kv_heads, cfg.head_dim
            )
            q = rope(q, pos, cfg.rope_theta)
            k = rope(k, pos, cfg.rope_theta)

            def put(buf, new, ln):
                return jax.lax.dynamic_update_slice(buf, new, (0, ln, 0))

            kc = kc.at[i].set(jax.vmap(put)(kc[i], k, lengths))
            vc = vc.at[i].set(jax.vmap(put)(vc[i], v, lengths))
            o = flash_attention(
                q, kc[i], vc[i], q_offset=lengths, causal=True,
                impl=cfg.attn_impl,
            )
            x = x + _merge_heads(o) @ weight(layer["wo"], dt)
            x = _cross_attention(layer, x, mem_kv[i], src_mask, cfg)
            x = mlp_block(layer, x, cfg)
        x = rms_norm(x, params["final_norm"])
        logits = (x @ weight(params["lm_head"], dt)).astype(jnp.float32)
        lengths = lengths + active.astype(jnp.int32)
        return logits[:, 0], (kc, vc, lengths)

    # Seed: the BOS step run over all (identical) beams gives the first
    # expansion distribution; the loop then starts from those states.
    logits0, state = step_fn(
        (kc, vc, lengths),
        jnp.full((beam_width,), bos_id, jnp.int32),
        jnp.zeros((beam_width,), bool),
    )
    return beam_search_loop(
        step_fn,
        state,
        logits0[0],
        beam_width=beam_width,
        max_new_tokens=max_new_tokens,
        eos_id=eos_id,
        length_penalty=length_penalty,
        return_all=return_all,
    )
