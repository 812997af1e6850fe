"""Arbitrary block-sparse masks (kernels/flash_mask.py) vs masked oracle.

The mask compiler turns any jnp-traceable predicate into per-block skip
lists (compute AND DMA skipped); these tests exercise EMPTY/PARTIAL/FULL
blocks, dead rows, GQA, and gradients.
"""

import jax
import jax.numpy as jnp
import pytest

from flash_attention_metal_tpu.kernels import (
    BlockMask,
    flash_attention_block_sparse,
)
from flash_attention_metal_tpu.reference import make_qkv

INTERPRET = jax.default_backend() != "tpu"
N = 512


def masked_oracle(q, k, v, mask_fn):
    n_q, n_kv = q.shape[2], k.shape[2]
    s = jnp.einsum(
        "bhqd,bhkd->bhqk", q, k, precision=jax.lax.Precision.HIGHEST
    ) * (q.shape[-1] ** -0.5)
    r = jnp.arange(n_q)[:, None]
    c = jnp.arange(n_kv)[None, :]
    s = jnp.where(mask_fn(r, c), s, -jnp.inf)
    m = jnp.max(s, -1, keepdims=True)
    m = jnp.where(jnp.isneginf(m), 0.0, m)
    p = jnp.exp(s - m)
    l = jnp.sum(p, -1, keepdims=True)
    return jnp.einsum(
        "bhqk,bhkd->bhqd",
        p / jnp.where(l == 0, 1.0, l),
        v,
        precision=jax.lax.Precision.HIGHEST,
    )


def diff(a, b):
    return float(jnp.max(jnp.abs(a.astype(jnp.float32) - b.astype(jnp.float32))))


MASKS = {
    # causal AND (band OR dilated stripes): EMPTY + PARTIAL + FULL blocks
    "banded-stripes": lambda r, c: (c <= r) & (
        ((r - c) < 96) | ((c % 192) < 64)
    ),
    # block-diagonal chunks of 160 (not block-aligned -> partial edges)
    "chunked-local": lambda r, c: (r // 160) == (c // 160),
    # dead rows: rows 0-63 see nothing at all
    "dead-rows": lambda r, c: (r >= 64) & (c <= r),
}


@pytest.mark.parametrize("name", sorted(MASKS))
def test_block_sparse_fwd_matches_masked_oracle(rng_key, name):
    mask_fn = MASKS[name]
    q, k, v = make_qkv(rng_key, (1, 2, N, 64))
    bm = BlockMask(mask_fn, N, N, 128, 128)
    o = flash_attention_block_sparse(q, k, v, bm, None, INTERPRET)
    want = masked_oracle(q, k, v, mask_fn)
    assert diff(o, want) < 1e-3, name
    assert 0.0 < bm.density <= 1.0


def test_block_sparse_grads_match_masked_oracle(rng_key):
    mask_fn = MASKS["banded-stripes"]
    q, k, v = make_qkv(rng_key, (1, 2, N, 64))
    bm = BlockMask(mask_fn, N, N, 128, 128)
    co = jax.random.normal(jax.random.PRNGKey(2), q.shape) * 0.1

    got = jax.grad(
        lambda *a: jnp.sum(
            flash_attention_block_sparse(*a, bm, None, INTERPRET) * co
        ),
        argnums=(0, 1, 2),
    )(q, k, v)
    want = jax.grad(
        lambda *a: jnp.sum(masked_oracle(*a, mask_fn) * co), argnums=(0, 1, 2)
    )(q, k, v)
    for name, a, b in zip("qkv", got, want):
        assert diff(a, b) < 1e-3, name


def test_block_sparse_gqa(rng_key):
    mask_fn = MASKS["banded-stripes"]
    q, _, _ = make_qkv(rng_key, (1, 4, N, 64))
    _, k, v = make_qkv(jax.random.PRNGKey(5), (1, 2, N, 64))
    bm = BlockMask(mask_fn, N, N, 128, 128)
    o = flash_attention_block_sparse(q, k, v, bm, None, INTERPRET)
    want = masked_oracle(
        q, jnp.repeat(k, 2, axis=1), jnp.repeat(v, 2, axis=1), mask_fn
    )
    assert diff(o, want) < 1e-3
    g = jax.grad(
        lambda k_: jnp.sum(
            flash_attention_block_sparse(q, k_, v, bm, None, INTERPRET) ** 2
        )
    )(k)
    assert g.shape == k.shape and not bool(jnp.any(jnp.isnan(g)))


def test_block_sparse_skip_lists_prune_blocks():
    bm = BlockMask(MASKS["chunked-local"], N, N, 128, 128)
    # 160-wide chunks over 128-wide blocks: each q block sees at most 3
    # kv blocks out of 4 -> real pruning happened.
    assert bm.max_kv < N // 128
    assert bm.density == 10 / 16  # 10 of 16 blocks touched
