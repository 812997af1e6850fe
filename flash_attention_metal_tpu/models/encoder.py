"""FlashEncoder: bidirectional transformer on the same kernel stack.

Second model family beside the FlashLM decoder (the reference has no
model layer at all — both families are framework extensions on top of
the kernel ladder).  Bidirectional attention is the kernels' non-causal
path; ragged/padded batches ride the packed-sequence ``SegmentIds``
machinery (pad tokens get segment 0, real tokens segment 1, so pads
neither attend nor are attended — no [B, N, N] mask materialization
anywhere).  Heads: masked-LM loss and mean-pooled embeddings.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

from ..config import SegmentIds
from ..ops.attention import flash_attention
from .transformer import (
    _merge_heads,
    _split_heads,
    mlp_block,
    rms_norm,
    rope,
)

Params = Dict[str, Any]


@dataclasses.dataclass(frozen=True)
class EncoderConfig:
    vocab_size: int = 32768
    d_model: int = 512
    n_layers: int = 4
    n_heads: int = 8
    n_kv_heads: int = 8
    head_dim: int = 64
    d_ff: int = 1408
    max_seq_len: int = 512
    rope_theta: float = 10000.0
    dtype: Any = jnp.bfloat16
    attn_impl: str = "auto"
    # Attention-probability dropout (train mode: pass dropout_key).
    attn_dropout: float = 0.0

    def __post_init__(self):
        if self.n_heads % self.n_kv_heads:
            raise ValueError("n_heads must be a multiple of n_kv_heads")


def init_params(key: jax.Array, cfg: EncoderConfig) -> Params:
    keys = jax.random.split(key, cfg.n_layers + 2)

    def dense(k, fan_in, shape):
        return jax.random.normal(k, shape, jnp.float32) * (fan_in**-0.5)

    d, h, hk, hd, f = (
        cfg.d_model,
        cfg.n_heads,
        cfg.n_kv_heads,
        cfg.head_dim,
        cfg.d_ff,
    )
    layers = []
    for i in range(cfg.n_layers):
        lk = jax.random.split(keys[i], 8)
        layers.append(
            {
                "attn_norm": jnp.ones((d,), jnp.float32),
                "wq": dense(lk[0], d, (d, h * hd)),
                "wk": dense(lk[1], d, (d, hk * hd)),
                "wv": dense(lk[2], d, (d, hk * hd)),
                "wo": dense(lk[3], h * hd, (h * hd, d)),
                "mlp_norm": jnp.ones((d,), jnp.float32),
                "w_gate": dense(lk[4], d, (d, f)),
                "w_up": dense(lk[5], d, (d, f)),
                "w_down": dense(lk[6], f, (f, d)),
            }
        )
    return {
        "embed": jax.random.normal(keys[-2], (cfg.vocab_size, d), jnp.float32)
        * 0.02,
        "layers": layers,
        "final_norm": jnp.ones((d,), jnp.float32),
        "mlm_head": dense(keys[-1], d, (d, cfg.vocab_size)),
    }


def _encoder_block(layer, x, cfg, positions, segment_ids, dropout_seed=None):
    dt = cfg.dtype
    h = rms_norm(x, layer["attn_norm"])
    q = _split_heads(h @ layer["wq"].astype(dt), cfg.n_heads, cfg.head_dim)
    k = _split_heads(h @ layer["wk"].astype(dt), cfg.n_kv_heads, cfg.head_dim)
    v = _split_heads(h @ layer["wv"].astype(dt), cfg.n_kv_heads, cfg.head_dim)
    q = rope(q, positions, cfg.rope_theta)
    k = rope(k, positions, cfg.rope_theta)
    use_drop = cfg.attn_dropout > 0.0 and dropout_seed is not None
    o = flash_attention(
        q,
        k,
        v,
        causal=False,
        segment_ids=segment_ids,
        dropout_rate=cfg.attn_dropout if use_drop else 0.0,
        dropout_seed=dropout_seed if use_drop else None,
        impl=cfg.attn_impl,
    )
    x = x + _merge_heads(o) @ layer["wo"].astype(dt)
    return mlp_block(layer, x, cfg)  # residual included (x + mlp)


def encode(
    params: Params,
    tokens: jax.Array,
    attn_mask: Optional[jax.Array] = None,
    *,
    cfg: EncoderConfig,
    dropout_key: Optional[jax.Array] = None,
) -> jax.Array:
    """Hidden states ``[B, N, d_model]`` for padded token batches.

    ``attn_mask``: bool/int ``[B, N]``, 1 = real token (default: all).
    Padding is enforced through segment ids — no dense mask is built.
    """
    b, n = tokens.shape
    if attn_mask is None:
        attn_mask = jnp.ones((b, n), jnp.int32)
    seg = attn_mask.astype(jnp.int32)  # pads: 0, real: 1
    sids = SegmentIds(q=seg, kv=seg)
    positions = jnp.broadcast_to(jnp.arange(n), (b, n))
    x = params["embed"][tokens].astype(cfg.dtype)
    seeds = None
    if dropout_key is not None and cfg.attn_dropout > 0.0:
        seeds = jax.random.randint(
            dropout_key, (len(params["layers"]),), 0,
            jnp.iinfo(jnp.int32).max, dtype=jnp.int32,
        )
    for i, layer in enumerate(params["layers"]):
        x = _encoder_block(
            layer, x, cfg, positions, sids,
            None if seeds is None else seeds[i],
        )
    return rms_norm(x, params["final_norm"])


def mean_pool(hidden: jax.Array, attn_mask: jax.Array) -> jax.Array:
    """Mask-aware mean pooling -> ``[B, d_model]`` embeddings."""
    m = attn_mask.astype(hidden.dtype)[..., None]
    return jnp.sum(hidden * m, axis=1) / jnp.maximum(
        jnp.sum(m, axis=1), 1.0
    )


def mlm_loss(
    params: Params,
    tokens: jax.Array,
    labels: jax.Array,
    loss_mask: jax.Array,
    attn_mask: Optional[jax.Array] = None,
    *,
    cfg: EncoderConfig,
    dropout_key: Optional[jax.Array] = None,
) -> jax.Array:
    """Masked-LM cross entropy over positions where ``loss_mask`` is 1.

    ``tokens`` holds the corrupted input (e.g. mask-token ids at the
    selected positions), ``labels`` the originals.
    """
    hidden = encode(params, tokens, attn_mask, cfg=cfg, dropout_key=dropout_key)
    logits = (hidden @ params["mlm_head"].astype(cfg.dtype)).astype(
        jnp.float32
    )
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, labels[..., None], axis=-1)[..., 0]
    m = loss_mask.astype(jnp.float32)
    return jnp.sum(nll * m) / jnp.maximum(jnp.sum(m), 1.0)
