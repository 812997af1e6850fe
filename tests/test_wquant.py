"""Weight-only int8 serving quantization tests.

Invariants: per-channel round-trip error is bounded by scale/2; the
quantized tree halves weight bytes; forward logits stay close to the
fp32 model; and the quantized tree drops into the decode engine with
decode == teacher-forced forward (the framework's core serving
invariant) holding *within the quantized model itself*.
"""

import numpy as np
import jax
import jax.numpy as jnp

from flash_attention_metal_tpu.models import (
    ModelConfig,
    forward,
    init_params,
    quantize_weights,
)
from flash_attention_metal_tpu.models.wquant import (
    quantize_weight,
    weight_bytes,
)

CFG = ModelConfig(
    vocab_size=256,
    d_model=128,
    n_layers=2,
    n_heads=2,
    n_kv_heads=2,
    head_dim=64,
    d_ff=128,
    max_seq_len=256,
    dtype=jnp.float32,
)


def _fixtures(seed=0):
    params = init_params(jax.random.PRNGKey(seed), CFG)
    tokens = jax.random.randint(
        jax.random.PRNGKey(seed + 1), (2, 64), 0, CFG.vocab_size
    )
    return params, tokens


def test_roundtrip_error_bound_and_bytes():
    w = jax.random.normal(jax.random.PRNGKey(0), (256, 512)) * 0.07
    qd = quantize_weight(w)
    deq = qd["qw"].astype(jnp.float32) * qd["scale"]
    # Symmetric rounding: |w - deq| <= scale/2 per output channel.
    err = jnp.max(jnp.abs(w - deq), axis=0)
    assert bool(jnp.all(err <= qd["scale"][0] * 0.5 + 1e-9))
    assert qd["qw"].dtype == jnp.int8


def test_quantized_tree_memory_and_logits():
    params, tokens = _fixtures()
    qparams = quantize_weights(params)
    # All targeted weights (+ lm_head) at 1 byte instead of 4.
    assert weight_bytes(qparams) < 0.45 * weight_bytes(params)

    base = forward(params, tokens, CFG)
    quant = forward(qparams, tokens, CFG)
    # Same next-token predictions nearly everywhere and close logits.
    agree = float(
        (jnp.argmax(base, -1) == jnp.argmax(quant, -1)).mean()
    )
    # A random-init model's logits are nearly flat, so argmax is a noisy
    # metric here; the relative-norm check below is the meaningful one.
    assert agree > 0.85, agree
    rel = float(
        jnp.linalg.norm(base - quant) / jnp.linalg.norm(base)
    )
    assert rel < 0.05, rel


def test_quantized_engine_greedy_serves():
    from flash_attention_metal_tpu.runtime import DecodeEngine, Request

    params, _ = _fixtures()
    qparams = quantize_weights(params)

    def run(p):
        eng = DecodeEngine(p, CFG, max_batch=2, max_len=256)
        eng.submit(Request(uid=0, prompt=[3, 1, 4, 1, 5], max_new_tokens=8))
        eng.submit(Request(uid=1, prompt=[2, 7, 1, 8], max_new_tokens=8))
        return eng.run()

    out_q = run(qparams)
    assert len(out_q[0]) == 8 and len(out_q[1]) == 8

    # The serving invariant holds inside the quantized model: engine
    # greedy tokens == teacher-forced argmax over the same prefix.
    toks = [3, 1, 4, 1, 5] + out_q[0]
    logits = forward(qparams, jnp.asarray([toks]), CFG)
    for t in range(8):
        pred = int(jnp.argmax(logits[0, 4 + t]))
        assert pred == out_q[0][t], (t, pred, out_q[0][t])


def test_quantized_speculative_engine():
    # The wquant tree must also serve through the speculative path (its
    # chunked target-verify forward has its own lm_head matmul).
    from flash_attention_metal_tpu.runtime import DecodeEngine, Request

    params, _ = _fixtures()
    qparams = quantize_weights(params)
    eng = DecodeEngine(
        qparams, CFG, max_batch=2, max_len=256,
        draft=(qparams, CFG), spec_gamma=3,
    )
    eng.submit(Request(uid=0, prompt=[3, 1, 4, 1, 5], max_new_tokens=8))
    out = eng.run()
    assert len(out[0]) == 8

    # A perfect draft (same model) must equal plain greedy decoding.
    eng2 = DecodeEngine(qparams, CFG, max_batch=2, max_len=256)
    eng2.submit(Request(uid=0, prompt=[3, 1, 4, 1, 5], max_new_tokens=8))
    assert out[0] == eng2.run()[0]


def test_dropout_rate_validation():
    import pytest
    from flash_attention_metal_tpu.ops import flash_attention
    from flash_attention_metal_tpu.reference import make_qkv

    q, k, v = make_qkv(jax.random.PRNGKey(0), (1, 1, 128, 64))
    with pytest.raises(ValueError, match="dropout_rate"):
        flash_attention(
            q, k, v, causal=True, dropout_rate=-0.1,
            dropout_seed=jnp.int32(1),
        )


def test_quantize_is_idempotent_and_selective():
    params, _ = _fixtures()
    q1 = quantize_weights(params)
    q2 = quantize_weights(q1)  # already-quantized leaves are skipped
    assert isinstance(q2["layers"][0]["wq"], dict)
    # Norms/embedding untouched.
    np.testing.assert_array_equal(
        np.asarray(q1["embed"]), np.asarray(params["embed"])
    )
    np.testing.assert_array_equal(
        np.asarray(q1["layers"][0]["attn_norm"]),
        np.asarray(params["layers"][0]["attn_norm"]),
    )
