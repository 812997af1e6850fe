"""Attention-dropout tests.

The dropout mask is a stateless hash of (seed, batch*head, row, col), so
the Pallas kernels and the jnp oracle produce the IDENTICAL mask — the
tests verify dropout exactly (fp tolerance), not just statistically.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from flash_attention_metal_tpu.config import BlockSizes
from flash_attention_metal_tpu.kernels._common import dropout_keep
from flash_attention_metal_tpu.ops import flash_attention
from flash_attention_metal_tpu.reference import (
    attention_reference,
    make_qkv,
)

RATE = 0.2
SEED = jnp.int32(1234)
# Multi-block tiles so the streaming (online-softmax) path is exercised.
BS = BlockSizes(
    block_q=128, block_k_major=128, block_k=128,
    block_q_dkv=128, block_kv_dkv=128, block_q_dq=128, block_kv_dq=128,
)


@pytest.mark.parametrize("causal", [False, True])
def test_dropout_fwd_matches_oracle(causal):
    q, k, v = make_qkv(jax.random.PRNGKey(0), (2, 3, 256, 64))
    o = flash_attention(
        q, k, v, causal=causal, dropout_rate=RATE, dropout_seed=SEED,
        block_sizes=BS,
    )
    o_ref = attention_reference(
        q, k, v, causal=causal, dropout_rate=RATE, dropout_seed=SEED
    )
    np.testing.assert_allclose(np.asarray(o), np.asarray(o_ref), atol=5e-5)


@pytest.mark.parametrize("causal", [False, True])
def test_dropout_grads_match_oracle(causal):
    q, k, v = make_qkv(jax.random.PRNGKey(1), (1, 2, 256, 64))

    def f_pallas(q_, k_, v_):
        o = flash_attention(
            q_, k_, v_, causal=causal, dropout_rate=RATE, dropout_seed=SEED,
            block_sizes=BS,
        )
        return jnp.sum(o * jnp.cos(jnp.arange(o.size).reshape(o.shape)))

    def f_oracle(q_, k_, v_):
        o = attention_reference(
            q_, k_, v_, causal=causal, dropout_rate=RATE, dropout_seed=SEED
        )
        return jnp.sum(o * jnp.cos(jnp.arange(o.size).reshape(o.shape)))

    g = jax.grad(f_pallas, argnums=(0, 1, 2))(q, k, v)
    g_ref = jax.grad(f_oracle, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-5)


def test_dropout_gqa_grads_match_oracle():
    # 4 q heads over 2 kv heads: the fwd runs GQA natively, the bwd
    # broadcasts + group-reduces; the per-q-head mask must line up.
    q, _, _ = make_qkv(jax.random.PRNGKey(2), (1, 4, 128, 64))
    _, k, v = make_qkv(jax.random.PRNGKey(3), (1, 2, 128, 64))

    def f(attn):
        def g(q_, k_, v_):
            return jnp.sum(attn(q_, k_, v_) ** 2)
        return g

    pallas = f(lambda q_, k_, v_: flash_attention(
        q_, k_, v_, causal=True, dropout_rate=RATE, dropout_seed=SEED,
        block_sizes=BS,
    ))
    kb, vb = jnp.repeat(k, 2, axis=1), jnp.repeat(v, 2, axis=1)
    o = flash_attention(
        q, k, v, causal=True, dropout_rate=RATE, dropout_seed=SEED,
        block_sizes=BS,
    )
    o_ref = attention_reference(
        q, kb, vb, causal=True, dropout_rate=RATE, dropout_seed=SEED
    )
    np.testing.assert_allclose(np.asarray(o), np.asarray(o_ref), atol=5e-5)

    oracle = f(lambda q_, k_, v_: attention_reference(
        jnp.asarray(q_),
        jnp.repeat(k_, 2, axis=1),
        jnp.repeat(v_, 2, axis=1),
        causal=True, dropout_rate=RATE, dropout_seed=SEED,
    ))
    g = jax.grad(pallas, argnums=(0, 1, 2))(q, k, v)
    g_ref = jax.grad(oracle, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g, g_ref):
        # Squared-sum loss on GQA grads gives O(10) values; tolerance is
        # relative-dominated fp32 accumulation noise.
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=5e-4, rtol=1e-4
        )


def test_mask_statistics_and_determinism():
    bh = jnp.arange(8).reshape(8, 1, 1)
    rows = jnp.arange(256).reshape(1, 256, 1)
    cols = jnp.arange(256).reshape(1, 1, 256)
    m = dropout_keep(SEED, bh, rows, cols, RATE)
    frac = float((np.asarray(m) > 0).mean())
    assert abs(frac - (1 - RATE)) < 0.01, frac
    # Survivors are scaled by exactly 1/(1-rate).
    vals = np.unique(np.asarray(m))
    np.testing.assert_allclose(vals, [0.0, 1.0 / (1 - RATE)], rtol=1e-6)
    # Deterministic in the seed; different seeds give different masks.
    m2 = dropout_keep(SEED, bh, rows, cols, RATE)
    np.testing.assert_array_equal(np.asarray(m), np.asarray(m2))
    m3 = dropout_keep(jnp.int32(4321), bh, rows, cols, RATE)
    assert (np.asarray(m) != np.asarray(m3)).mean() > 0.1


def test_dropout_validation_errors():
    q, k, v = make_qkv(jax.random.PRNGKey(0), (1, 1, 128, 64))
    with pytest.raises(ValueError, match="dropout_seed"):
        flash_attention(q, k, v, causal=True, dropout_rate=0.1)
    with pytest.raises(NotImplementedError):
        flash_attention(
            q, k, v, causal=True, dropout_rate=0.1, dropout_seed=SEED,
            save_lse=True,
        )


def test_model_dropout_train_and_eval():
    from flash_attention_metal_tpu.models import (
        ModelConfig, forward, init_params,
    )

    cfg = ModelConfig(
        vocab_size=64, d_model=128, n_layers=2, n_heads=2, n_kv_heads=2,
        head_dim=64, d_ff=128, max_seq_len=128, dtype=jnp.float32,
        attn_dropout=0.3,
    )
    params = init_params(jax.random.PRNGKey(0), cfg)
    tokens = jax.random.randint(jax.random.PRNGKey(1), (2, 128), 0, 64)
    # Eval (no key): deterministic, dropout off.
    a = forward(params, tokens, cfg)
    b = forward(params, tokens, cfg)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # Train (key): output differs from eval and across keys.
    c = forward(params, tokens, cfg, dropout_key=jax.random.PRNGKey(2))
    d = forward(params, tokens, cfg, dropout_key=jax.random.PRNGKey(3))
    assert float(jnp.max(jnp.abs(a - c))) > 0
    assert float(jnp.max(jnp.abs(c - d))) > 0
    # Gradients flow through the dropout path.
    from flash_attention_metal_tpu.models import loss_fn

    g = jax.grad(loss_fn)(params, tokens, cfg, jax.random.PRNGKey(2))
    gn = jax.tree_util.tree_reduce(
        lambda s, x: s + float(jnp.sum(jnp.abs(x))), g, 0.0
    )
    assert np.isfinite(gn) and gn > 0
