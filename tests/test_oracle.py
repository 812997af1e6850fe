"""Oracle self-consistency tests (reference parity: H3, main.mm:121-159)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from flash_attention_metal_tpu.reference import (
    attention_reference,
    attention_reference_bwd,
    attention_reference_with_lse,
    make_qkv,
)


def _softmax_attention_numpy(q, k, v, causal=False):
    q, k, v = np.asarray(q, np.float64), np.asarray(k, np.float64), np.asarray(v, np.float64)
    scale = 1.0 / np.sqrt(q.shape[-1])
    s = np.einsum("...qd,...kd->...qk", q, k) * scale
    if causal:
        nq, nk = s.shape[-2:]
        mask = np.tril(np.ones((nq, nk), bool), k=nk - nq)
        s = np.where(mask, s, -np.inf)
    s = s - s.max(-1, keepdims=True)
    p = np.exp(s)
    p = p / p.sum(-1, keepdims=True)
    return np.einsum("...qk,...kd->...qd", p, v)


@pytest.mark.parametrize("causal", [False, True])
def test_oracle_matches_float64_numpy(rng_key, causal):
    q, k, v = make_qkv(rng_key, (2, 3, 128, 64))
    got = attention_reference(q, k, v, causal=causal)
    want = _softmax_attention_numpy(q, k, v, causal=causal)
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-5)


def test_oracle_lse_definition(rng_key):
    q, k, v = make_qkv(rng_key, (1, 2, 128, 64))
    o, lse = attention_reference_with_lse(q, k, v)
    scale = 1.0 / np.sqrt(64)
    s = np.einsum("...qd,...kd->...qk", np.asarray(q, np.float64), np.asarray(k)) * scale
    want_lse = np.log(np.exp(s).sum(-1))
    np.testing.assert_allclose(np.asarray(lse), want_lse, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(o), _softmax_attention_numpy(q, k, v), atol=1e-5
    )


@pytest.mark.parametrize("causal", [False, True])
def test_oracle_bwd_matches_autodiff(rng_key, causal):
    q, k, v = make_qkv(rng_key, (1, 2, 128, 64))
    do = jax.random.normal(jax.random.PRNGKey(7), q.shape, jnp.float32)
    dq, dk, dv = attention_reference_bwd(q, k, v, do, causal=causal)

    f = lambda q_, k_, v_: attention_reference(q_, k_, v_, causal=causal)
    _, vjp = jax.vjp(f, q, k, v)
    dq2, dk2, dv2 = vjp(do)
    np.testing.assert_allclose(np.asarray(dq), np.asarray(dq2), atol=1e-6)
    np.testing.assert_allclose(np.asarray(dk), np.asarray(dk2), atol=1e-6)
    np.testing.assert_allclose(np.asarray(dv), np.asarray(dv2), atol=1e-6)


def test_cross_attention_shapes(rng_key):
    kq, kk = jax.random.split(rng_key)
    q = jax.random.uniform(kq, (1, 2, 128, 64), jnp.float32, -1, 1)
    k = jax.random.uniform(kk, (1, 2, 256, 64), jnp.float32, -1, 1)
    v = jnp.ones((1, 2, 256, 64), jnp.float32)
    o = attention_reference(q, k, v)
    assert o.shape == q.shape
    # With constant V the attention output is exactly V's constant.
    np.testing.assert_allclose(np.asarray(o), 1.0, atol=1e-6)
