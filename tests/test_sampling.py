"""Top-k / nucleus (top-p) sampling: filter math + serving integration."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from flash_attention_metal_tpu.models import ModelConfig, init_params
from flash_attention_metal_tpu.runtime import DecodeEngine, Request
from flash_attention_metal_tpu.runtime.decode import (
    _filter_top_kp,
    sample,
    sample_batch,
)


def test_filter_topk_keeps_k_largest():
    logits = jnp.asarray([[1.0, 5.0, 3.0, 4.0, 2.0]])
    out = _filter_top_kp(
        logits, jnp.asarray([2], jnp.int32), jnp.asarray([1.0])
    )
    assert np.isfinite(np.asarray(out[0, [1, 3]])).all()
    assert np.isneginf(np.asarray(out[0, [0, 2, 4]])).all()


def test_filter_disabled_is_identity():
    logits = jax.random.normal(jax.random.PRNGKey(0), (3, 17))
    out = _filter_top_kp(
        logits, jnp.zeros((3,), jnp.int32), jnp.ones((3,))
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(logits), rtol=1e-6)


def test_filter_topp_smallest_nucleus():
    # probs ~ [0.6, 0.3, 0.1]: top_p=0.5 keeps only the first (0.6 >= p
    # reached at the first candidate); top_p=0.7 keeps the first two.
    logits = jnp.log(jnp.asarray([[0.6, 0.3, 0.1]]))
    one = _filter_top_kp(logits, jnp.zeros((1,), jnp.int32), jnp.asarray([0.5]))
    assert np.isneginf(np.asarray(one[0, 1:])).all()
    two = _filter_top_kp(logits, jnp.zeros((1,), jnp.int32), jnp.asarray([0.7]))
    assert np.isfinite(np.asarray(two[0, :2])).all()
    assert np.isneginf(np.asarray(two[0, 2]))


def test_topp_always_keeps_top1():
    logits = jax.random.normal(jax.random.PRNGKey(1), (4, 33))
    out = _filter_top_kp(
        logits, jnp.zeros((4,), jnp.int32), jnp.full((4,), 1e-9)
    )
    assert (
        np.asarray(jnp.argmax(out, -1)) == np.asarray(jnp.argmax(logits, -1))
    ).all()


def test_sample_topk1_is_greedy():
    logits = jax.random.normal(jax.random.PRNGKey(2), (257,))
    got = sample(logits, jax.random.PRNGKey(3), temperature=5.0, top_k=1)
    assert int(got) == int(jnp.argmax(logits))


def test_sample_batch_mixed_slots():
    logits = jax.random.normal(jax.random.PRNGKey(4), (3, 64))
    toks = sample_batch(
        logits,
        jax.random.PRNGKey(5),
        jnp.asarray([0.0, 9.0, 9.0]),  # greedy / top-k=1 / free
        jnp.asarray([0, 1, 0], jnp.int32),
        jnp.asarray([1.0, 1.0, 1.0]),
    )
    greedy = np.asarray(jnp.argmax(logits, -1))
    assert int(toks[0]) == greedy[0]
    assert int(toks[1]) == greedy[1]
    assert 0 <= int(toks[2]) < 64


def test_sample_batch_respects_topk_support():
    logits = jax.random.normal(jax.random.PRNGKey(6), (2, 128))
    top8 = set(np.asarray(jax.lax.top_k(logits[0], 8)[1]).tolist())
    for seed in range(20):
        toks = sample_batch(
            logits,
            jax.random.PRNGKey(seed),
            jnp.asarray([3.0, 3.0]),
            jnp.asarray([8, 0], jnp.int32),
            jnp.asarray([1.0, 1.0]),
        )
        assert int(toks[0]) in top8


CFG = ModelConfig(
    vocab_size=256,
    d_model=128,
    n_layers=2,
    n_heads=4,
    n_kv_heads=2,
    head_dim=64,
    d_ff=256,
    max_seq_len=256,
    dtype=jnp.float32,
)


def test_engine_topk1_matches_greedy_request():
    """End-to-end: a hot-temperature top_k=1 request generates exactly
    the greedy request's tokens (prefill first-token sampling included)."""
    params = init_params(jax.random.PRNGKey(0), CFG)
    outs = {}
    for name, kw in (
        ("greedy", dict(temperature=0.0)),
        ("topk1", dict(temperature=7.0, top_k=1)),
    ):
        eng = DecodeEngine(params, CFG, max_batch=2, max_len=256)
        eng.submit(
            Request(uid=0, prompt=[5, 9, 17], max_new_tokens=12, **kw)
        )
        while eng.pending():
            eng.step()
        outs[name] = eng.finished[0].generated
    assert outs["topk1"] == outs["greedy"]
