"""HuggingFace Llama checkpoint -> FlashLM parameter conversion.

The reference is a kernel study with no model zoo; a production serving
framework needs to load real weights.  This module maps any
``transformers`` Llama-family checkpoint (Llama/TinyLlama/etc.: RMSNorm
+ SwiGLU + RoPE + GQA, no biases) onto FlashLM's pytree so the whole
stack — flash kernels, KV caches, continuous-batching engine, sharded
training — runs the converted model unchanged.

The one real transform is the RoPE basis: HF rotates half-split channel
pairs ``(j, j + D/2)`` (``rotate_half``) while FlashLM rotates
interleaved pairs ``(2j, 2j+1)``.  Both are the same rotary embedding
under a per-head channel permutation, so the converter bakes that
permutation into the q/k projection output channels — after which the
two models are bit-for-bit the same math (verified against HF logits in
``tests/test_convert.py``).

Torch/transformers are imported lazily: conversion is a host-side,
one-time operation; nothing in the serving or training path depends on
torch.
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import jax.numpy as jnp
import numpy as np

from .transformer import ModelConfig, Params


def _to_np(t) -> np.ndarray:
    return np.asarray(t.detach().to("cpu").float().numpy())


def _interleave_rope_channels(w: np.ndarray, n_heads: int, head_dim: int):
    """Permute projection output channels from HF's half-split RoPE
    layout to FlashLM's interleaved layout.

    ``w``: ``[d_in, n_heads*head_dim]`` (already transposed to
    input-major).  HF pairs channel ``j`` with ``j + head_dim/2``;
    FlashLM pairs ``2j`` with ``2j+1`` — move HF channel ``j`` to
    ``2j`` and ``j + head_dim/2`` to ``2j+1`` within each head.
    """
    d_in = w.shape[0]
    half = head_dim // 2
    w = w.reshape(d_in, n_heads, head_dim)
    out = np.empty_like(w)
    out[..., 0::2] = w[..., :half]
    out[..., 1::2] = w[..., half:]
    return out.reshape(d_in, n_heads * head_dim)


def config_from_hf_llama(hf_config, **overrides) -> ModelConfig:
    """Build a ModelConfig from a ``transformers.LlamaConfig``."""
    head_dim = getattr(hf_config, "head_dim", None) or (
        hf_config.hidden_size // hf_config.num_attention_heads
    )
    kw: Dict[str, Any] = dict(
        vocab_size=hf_config.vocab_size,
        d_model=hf_config.hidden_size,
        n_layers=hf_config.num_hidden_layers,
        n_heads=hf_config.num_attention_heads,
        n_kv_heads=hf_config.num_key_value_heads,
        head_dim=head_dim,
        d_ff=hf_config.intermediate_size,
        max_seq_len=hf_config.max_position_embeddings,
        rope_theta=float(getattr(hf_config, "rope_theta", 10000.0)),
        dtype=jnp.bfloat16,
    )
    kw.update(overrides)
    return ModelConfig(**kw)


def params_from_hf_llama(model, cfg: ModelConfig) -> Params:
    """Convert a ``transformers.LlamaForCausalLM`` to FlashLM params.

    Weights come out fp32 (FlashLM's master-weight convention; the
    forward casts to ``cfg.dtype`` at use sites).
    """
    sd = model.state_dict()
    h, hk, hd = cfg.n_heads, cfg.n_kv_heads, cfg.head_dim

    def w(name):  # HF Linear stores [out, in]; FlashLM matmuls [in, out]
        return _to_np(sd[name]).T

    layers = []
    for i in range(cfg.n_layers):
        pre = f"model.layers.{i}."
        layers.append(
            {
                "attn_norm": _to_np(sd[pre + "input_layernorm.weight"]),
                "wq": _interleave_rope_channels(
                    w(pre + "self_attn.q_proj.weight"), h, hd
                ),
                "wk": _interleave_rope_channels(
                    w(pre + "self_attn.k_proj.weight"), hk, hd
                ),
                "wv": w(pre + "self_attn.v_proj.weight"),
                "wo": w(pre + "self_attn.o_proj.weight"),
                "mlp_norm": _to_np(
                    sd[pre + "post_attention_layernorm.weight"]
                ),
                "w_gate": w(pre + "mlp.gate_proj.weight"),
                "w_up": w(pre + "mlp.up_proj.weight"),
                "w_down": w(pre + "mlp.down_proj.weight"),
            }
        )

    embed = _to_np(sd["model.embed_tokens.weight"])
    if "lm_head.weight" in sd:
        lm_head = w("lm_head.weight")
    else:  # tied embeddings
        lm_head = embed.T.copy()
    import jax

    params = {
        "embed": embed,
        "layers": layers,
        "final_norm": _to_np(sd["model.norm.weight"]),
        "lm_head": lm_head,
    }
    # Materialize as fp32 jax arrays (contiguous copies of the permuted
    # views; torch buffers can then be freed).
    return jax.tree_util.tree_map(
        lambda a: jnp.asarray(a, jnp.float32), params
    )


def convert_hf_llama(model, **cfg_overrides) -> Tuple[ModelConfig, Params]:
    """One-call conversion: ``(cfg, params)`` from a HF Llama model."""
    cfg = config_from_hf_llama(model.config, **cfg_overrides)
    return cfg, params_from_hf_llama(model, cfg)
