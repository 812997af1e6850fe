"""Backward kernels vs the closed-form oracle gradient.

The reference verifies dQ against a CPU gradient at 1e-1 (main.mm:1191;
loose because of its float-atomic accumulation).  The TPU FA-2
decomposition accumulates deterministically in fp32, so we hold the fp32
path to a much tighter 1e-3 and keep the reference's 1e-1 only for the
half-precision path.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from flash_attention_metal_tpu.config import BlockSizes
from flash_attention_metal_tpu.kernels import (
    flash_attention_bwd,
    flash_attention_fwd,
)
from flash_attention_metal_tpu.ops import flash_attention
from flash_attention_metal_tpu.reference import (
    attention_reference,
    attention_reference_bwd,
    make_qkv,
)

INTERPRET = jax.default_backend() != "tpu"


def max_abs_diff(a, b):
    return float(jnp.max(jnp.abs(a.astype(jnp.float32) - b.astype(jnp.float32))))


@pytest.mark.parametrize("causal", [False, True])
@pytest.mark.parametrize("n", [128, 256])
def test_bwd_fp32_vs_oracle(rng_key, n, causal):
    q, k, v = make_qkv(rng_key, (1, 2, n, 64))
    do = jax.random.normal(jax.random.PRNGKey(3), q.shape, jnp.float32) * 0.1
    o, lse_lanes = flash_attention_fwd(
        q, k, v, causal=causal, save_lse=True, interpret=INTERPRET
    )
    dq, dk, dv = flash_attention_bwd(
        q, k, v, o, do, lse_lanes, causal=causal, interpret=INTERPRET
    )
    dq_r, dk_r, dv_r = attention_reference_bwd(q, k, v, do, causal=causal)
    assert max_abs_diff(dq, dq_r) < 1e-3
    assert max_abs_diff(dk, dk_r) < 1e-3
    assert max_abs_diff(dv, dv_r) < 1e-3


@pytest.mark.parametrize("causal", [False, True])
def test_bwd_half_vs_oracle(rng_key, causal):
    # 0.01 input downscale to avoid half-precision overflow mirrors the
    # reference's big-batch fixture (main.mm:951-954).
    q, k, v = make_qkv(rng_key, (2, 4, 256, 64), dtype=jnp.bfloat16)
    do = (
        jax.random.normal(jax.random.PRNGKey(3), q.shape, jnp.float32) * 0.01
    ).astype(jnp.bfloat16)
    o, lse_lanes = flash_attention_fwd(
        q, k, v, causal=causal, save_lse=True, interpret=INTERPRET
    )
    dq, dk, dv = flash_attention_bwd(
        q, k, v, o, do, lse_lanes, causal=causal, interpret=INTERPRET
    )
    dq_r, dk_r, dv_r = attention_reference_bwd(q, k, v, do, causal=causal)
    assert max_abs_diff(dq, dq_r) < 1e-1  # reference backward tolerance
    assert max_abs_diff(dk, dk_r) < 1e-1
    assert max_abs_diff(dv, dv_r) < 1e-1


@pytest.mark.parametrize("causal", [False, True])
def test_custom_vjp_grad(rng_key, causal):
    """jax.grad through the public op matches grad through the oracle."""
    q, k, v = make_qkv(rng_key, (1, 2, 256, 64))

    def loss_flash(q, k, v):
        return jnp.sum(flash_attention(q, k, v, causal=causal) ** 2)

    def loss_ref(q, k, v):
        return jnp.sum(attention_reference(q, k, v, causal=causal) ** 2)

    g_flash = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for gf, gr in zip(g_flash, g_ref):
        assert max_abs_diff(gf, gr) < 1e-2


def test_bwd_block_sweep(rng_key):
    q, k, v = make_qkv(rng_key, (1, 1, 512, 64))
    do = jax.random.normal(jax.random.PRNGKey(5), q.shape, jnp.float32) * 0.1
    o, lse_lanes = flash_attention_fwd(q, k, v, save_lse=True, interpret=INTERPRET)
    dq_r, dk_r, dv_r = attention_reference_bwd(q, k, v, do)
    for bs in [
        BlockSizes(
            block_q_dkv=128, block_kv_dkv=128, block_q_dq=128, block_kv_dq=128
        ),
        BlockSizes(
            block_q_dkv=256, block_kv_dkv=512, block_q_dq=512, block_kv_dq=256
        ),
    ]:
        dq, dk, dv = flash_attention_bwd(
            q, k, v, o, do, lse_lanes, block_sizes=bs, interpret=INTERPRET
        )
        assert max_abs_diff(dq, dq_r) < 1e-3
        assert max_abs_diff(dk, dk_r) < 1e-3
        assert max_abs_diff(dv, dv_r) < 1e-3


def test_gqa_forward_and_grad(rng_key):
    kq, kk, kv2 = jax.random.split(rng_key, 3)
    q = jax.random.uniform(kq, (1, 8, 256, 64), jnp.float32, -1, 1)
    k = jax.random.uniform(kk, (1, 2, 256, 64), jnp.float32, -1, 1)
    v = jax.random.uniform(kv2, (1, 2, 256, 64), jnp.float32, -1, 1)
    o = flash_attention(q, k, v, causal=True)
    want = attention_reference(q, jnp.repeat(k, 4, 1), jnp.repeat(v, 4, 1), causal=True)
    assert max_abs_diff(o, want) < 1e-3

    g = jax.grad(lambda k_: jnp.sum(flash_attention(q, k_, v, causal=True)))(k)
    assert g.shape == k.shape
    assert not bool(jnp.any(jnp.isnan(g)))


def test_sliding_window_grads(rng_key):
    """Windowed-attention grads through the public op match the oracle."""
    from flash_attention_metal_tpu.ops.attention import flash_attention
    from flash_attention_metal_tpu.reference import attention_reference

    n, w = 512, 160
    q, k, v = make_qkv(rng_key, (1, 2, n, 64))
    bs = BlockSizes(block_q=128, block_k_major=128, block_k=128)

    def loss(q_, k_, v_):
        return jnp.sum(
            flash_attention(
                q_, k_, v_, causal=True, window=w, block_sizes=bs,
                interpret=INTERPRET,
            )
            ** 2
        )

    def loss_ref(q_, k_, v_):
        return jnp.sum(
            attention_reference(q_, k_, v_, causal=True, window=w) ** 2
        )

    got = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)
    want = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for name, a, b in zip("qkv", got, want):
        assert max_abs_diff(a, b) < 5e-3, name


def test_segment_ids_grads(rng_key):
    """Packed-sequence grads through the public op match the oracle."""
    from flash_attention_metal_tpu.config import SegmentIds
    from flash_attention_metal_tpu.ops.attention import flash_attention
    from flash_attention_metal_tpu.reference import attention_reference

    n = 512
    q, k, v = make_qkv(rng_key, (1, 2, n, 64))
    seg = jnp.concatenate(
        [jnp.zeros(192), jnp.ones(192), jnp.full(128, 2)]
    ).astype(jnp.int32)[None]
    sids = SegmentIds(q=seg, kv=seg)
    bs = BlockSizes(block_q=128, block_k_major=128, block_k=128)

    def loss(q_, k_, v_):
        return jnp.sum(
            flash_attention(
                q_, k_, v_, segment_ids=sids, causal=True,
                block_sizes=bs, interpret=INTERPRET,
            )
            ** 2
        )

    def loss_ref(q_, k_, v_):
        return jnp.sum(
            attention_reference(
                q_, k_, v_, causal=True, segment_ids=sids
            )
            ** 2
        )

    got = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)
    want = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for name, a, b in zip("qkv", got, want):
        assert max_abs_diff(a, b) < 5e-3, name


def test_save_lse_grads_match_oracle(rng_key):
    """(o, lse) are BOTH differentiable; lse cotangent folds into delta.

    Regression for round-1 VERDICT item 5: save_lse=True used to bypass
    the custom VJP entirely.
    """
    from flash_attention_metal_tpu.reference.oracle import (
        attention_reference_with_lse,
    )

    q, k, v = make_qkv(rng_key, (1, 2, 256, 64))
    co = jax.random.normal(jax.random.PRNGKey(2), q.shape) * 0.1
    cl = jax.random.normal(jax.random.PRNGKey(3), q.shape[:3]) * 0.1

    def loss_flash(q_, k_, v_):
        o, lse = flash_attention(
            q_, k_, v_, causal=True, save_lse=True, interpret=INTERPRET
        )
        return jnp.sum(o * co) + jnp.sum(lse * cl)

    def loss_oracle(q_, k_, v_):
        o, lse = attention_reference_with_lse(q_, k_, v_, causal=True)
        return jnp.sum(o * co) + jnp.sum(lse * cl)

    got = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    want = jax.grad(loss_oracle, argnums=(0, 1, 2))(q, k, v)
    for name, a, b in zip("qkv", got, want):
        assert max_abs_diff(a, b) < 1e-3, name


def test_bwd_neg_inf_lse_rows_give_zero_grads(rng_key):
    """-inf lse rows (fully-masked / lazy-softmax flush sentinel) must
    produce p == 0 in the backward, not inf (round-1 ADVICE medium)."""
    q, k, v = make_qkv(rng_key, (1, 1, 512, 64))
    o, lse = flash_attention_fwd(
        q, k, v, causal=True, save_lse=True, interpret=INTERPRET
    )
    lse = lse.at[0, 0, 7, :].set(-jnp.inf)
    do = q * 0.1
    dq, dk, dv = flash_attention_bwd(
        q, k, v, o, do, lse, causal=True, interpret=INTERPRET
    )
    for g in (dq, dk, dv):
        assert bool(jnp.all(jnp.isfinite(g)))
    assert float(jnp.max(jnp.abs(dq[0, 0, 7]))) == 0.0


def test_bwd_rejects_head_mismatch(rng_key):
    """GQA inputs must be broadcast before the backward kernels; silently
    clamped KV head indices used to corrupt gradients (ADVICE high)."""
    q, _, _ = make_qkv(rng_key, (1, 4, 128, 64))
    _, k, v = make_qkv(jax.random.PRNGKey(9), (1, 2, 128, 64))
    o, lse = flash_attention_fwd(
        q, k, v, causal=True, save_lse=True, interpret=INTERPRET
    )
    with pytest.raises(ValueError, match="equal head counts"):
        flash_attention_bwd(
            q, k, v, o, q * 0.1, lse, causal=True, interpret=INTERPRET
        )


@pytest.mark.parametrize("causal", [False, True])
def test_fused_bwd_matches_oracle(rng_key, causal):
    """5-matmul fused backward (dQ partials in HBM) == closed-form
    gradients, both in the single-partial (bkv == n) and multi-partial
    (bkv < n, summed outside the kernel) regimes."""
    from flash_attention_metal_tpu.kernels import flash_attention_bwd_fused

    q, k, v = make_qkv(rng_key, (1, 2, 512, 64))
    do = jax.random.normal(jax.random.PRNGKey(3), q.shape, jnp.float32) * 0.1
    o, lse = flash_attention_fwd(
        q, k, v, causal=causal, save_lse=True, interpret=INTERPRET
    )
    dq_r, dk_r, dv_r = attention_reference_bwd(q, k, v, do, causal=causal)
    for bkv in (512, 256):
        bs = BlockSizes(block_q_fused=256, block_kv_fused=bkv)
        dq, dk, dv = flash_attention_bwd_fused(
            q, k, v, o, do, lse, causal=causal, block_sizes=bs,
            interpret=INTERPRET,
        )
        assert max_abs_diff(dq, dq_r) < 1e-3, bkv
        assert max_abs_diff(dk, dk_r) < 1e-3, bkv
        assert max_abs_diff(dv, dv_r) < 1e-3, bkv


def test_fused_bwd_window_matches_two_kernel(rng_key):
    """Windowed causal: fused and two-kernel backwards agree."""
    from flash_attention_metal_tpu.kernels import flash_attention_bwd_fused

    q, k, v = make_qkv(rng_key, (1, 2, 512, 64))
    do = jax.random.normal(jax.random.PRNGKey(3), q.shape, jnp.float32) * 0.1
    o, lse = flash_attention_fwd(
        q, k, v, causal=True, window=160, save_lse=True, interpret=INTERPRET
    )
    bs = BlockSizes(
        block_q_dkv=128, block_kv_dkv=128, block_q_dq=128, block_kv_dq=128,
        block_q_fused=128, block_kv_fused=128,
    )
    ref = flash_attention_bwd(
        q, k, v, o, do, lse, causal=True, window=160, block_sizes=bs,
        interpret=INTERPRET,
    )
    got = flash_attention_bwd_fused(
        q, k, v, o, do, lse, causal=True, window=160, block_sizes=bs,
        interpret=INTERPRET,
    )
    for name, a, b in zip("qkv", got, ref):
        assert max_abs_diff(a, b) < 1e-5, name
