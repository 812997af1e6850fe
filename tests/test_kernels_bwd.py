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


# ---------------------------------------------------------------------------
# Round 4: in-kernel softcap/ALiBi backward + native-GQA row-fold backward
# (the dS-transform site of the reference backward, kernels.metal:1160-1169,
# extended with the transforms its forward never had).
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("causal", [False, True])
def test_softcap_bwd_in_kernel(rng_key, causal):
    """softcap grads ride the FA-2 kernels (no O(N^2) oracle recompute)."""
    q, k, v = make_qkv(rng_key, (1, 2, 256, 64))
    do = jax.random.normal(jax.random.PRNGKey(3), q.shape, jnp.float32) * 0.1

    def loss(q_, k_, v_):
        return jnp.sum(
            flash_attention(q_, k_, v_, causal=causal, softcap=8.0) * do
        )

    def loss_ref(q_, k_, v_):
        return jnp.sum(
            attention_reference(q_, k_, v_, causal=causal, softcap=8.0) * do
        )

    g = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g, gr):
        assert max_abs_diff(a, b) < 1e-3


@pytest.mark.parametrize("causal", [False, True])
def test_alibi_bwd_in_kernel_with_dslopes(rng_key, causal):
    """ALiBi grads incl. d/d(slopes) (in-kernel dS*distance reduce)."""
    q, k, v = make_qkv(rng_key, (1, 2, 256, 64))
    do = jax.random.normal(jax.random.PRNGKey(3), q.shape, jnp.float32) * 0.1
    slopes = jnp.array([0.25, 0.0625], jnp.float32)

    def loss(q_, k_, v_, s_):
        return jnp.sum(
            flash_attention(q_, k_, v_, causal=causal, alibi_slopes=s_) * do
        )

    def loss_ref(q_, k_, v_, s_):
        return jnp.sum(
            attention_reference(q_, k_, v_, causal=causal, alibi_slopes=s_)
            * do
        )

    g = jax.grad(loss, argnums=(0, 1, 2, 3))(q, k, v, slopes)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(q, k, v, slopes)
    for a, b in zip(g[:3], gr[:3]):
        assert max_abs_diff(a, b) < 1e-3
    np.testing.assert_allclose(
        np.asarray(g[3]), np.asarray(gr[3]), rtol=1e-3, atol=1e-3
    )


@pytest.mark.parametrize("window", [None, 64])
@pytest.mark.parametrize("causal", [False, True])
def test_gqa_fold_bwd_vs_oracle(rng_key, causal, window):
    """Native-GQA backward: row-fold (pos_div) path == broadcast oracle.

    dK/dV come out group-summed straight from the dKdV kernel's VMEM
    accumulator — no jnp.repeat broadcast, no group-reduce pass."""
    if window is not None and not causal:
        pytest.skip("window requires causal")
    # Group 4: large enough that the measured route (ops.attention) takes
    # the fold path by default, so this exercises fold end-to-end.
    q, _, _ = make_qkv(rng_key, (2, 8, 256, 64))
    _, k, v = make_qkv(jax.random.PRNGKey(9), (2, 2, 256, 64))
    do = jax.random.normal(jax.random.PRNGKey(3), q.shape, jnp.float32) * 0.1

    def loss(q_, k_, v_):
        return jnp.sum(
            flash_attention(q_, k_, v_, causal=causal, window=window) * do
        )

    def loss_ref(q_, k_, v_):
        kb = jnp.broadcast_to(k_[:, :, None], (2, 2, 4, 256, 64)).reshape(
            2, 8, 256, 64
        )
        vb = jnp.broadcast_to(v_[:, :, None], (2, 2, 4, 256, 64)).reshape(
            2, 8, 256, 64
        )
        return jnp.sum(
            attention_reference(q_, kb, vb, causal=causal, window=window)
            * do
        )

    g = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g, gr):
        assert max_abs_diff(a, b) < 1e-3


def test_gqa_fold_bwd_with_save_lse_and_segments(rng_key):
    """Fold path composes with segment ids (row-repeated Q ids) and a
    differentiable lse output."""
    from flash_attention_metal_tpu.config import SegmentIds

    q, _, _ = make_qkv(rng_key, (2, 8, 256, 64))
    _, k, v = make_qkv(jax.random.PRNGKey(9), (2, 2, 256, 64))
    do = jax.random.normal(jax.random.PRNGKey(3), q.shape, jnp.float32) * 0.1
    ids = (jnp.arange(256)[None, :] // 128).astype(jnp.int32).repeat(2, 0)
    seg = SegmentIds(q=ids, kv=ids)

    def loss(q_, k_, v_):
        o, lse = flash_attention(
            q_, k_, v_, segment_ids=seg, causal=True, save_lse=True
        )
        return jnp.sum(o * do) + 0.01 * jnp.sum(lse)

    def loss_ref(q_, k_, v_):
        from flash_attention_metal_tpu.reference.oracle import (
            attention_reference_with_lse,
        )

        kb = jnp.repeat(k_, 4, axis=1)
        vb = jnp.repeat(v_, 4, axis=1)
        o, lse = attention_reference_with_lse(
            q_, kb, vb, causal=True, segment_ids=seg
        )
        return jnp.sum(o * do) + 0.01 * jnp.sum(lse)

    g = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g, gr):
        assert max_abs_diff(a, b) < 1e-3


def test_gqa_bwd_route_fold_equals_broadcast(rng_key, monkeypatch):
    """Small groups (reps < 4) default to the broadcast backward (the
    fold measured 9% slower at group 2 — experiments/gqa_bwd_pair.json);
    forcing route="fold" via the autotune hook must give the same grads,
    so the routing is a pure performance decision."""
    from flash_attention_metal_tpu.harness import autotune

    q, _, _ = make_qkv(rng_key, (2, 4, 256, 64))
    _, k, v = make_qkv(jax.random.PRNGKey(9), (2, 2, 256, 64))
    do = jax.random.normal(jax.random.PRNGKey(3), q.shape, jnp.float32) * 0.1

    def loss(q_, k_, v_):
        return jnp.sum(flash_attention(q_, k_, v_, causal=True) * do)

    g_default = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)  # broadcast
    monkeypatch.setattr(
        autotune, "lookup_gqa_bwd_route", lambda *a, **kw: "fold"
    )
    g_fold = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g_default, g_fold):
        assert max_abs_diff(a, b) < 1e-3


def test_dropout_softcap_alibi_bwd_composition(rng_key):
    """Round-4 lifted gates: dropout composes with softcap+ALiBi+save_lse
    on the pallas path, gradients matching the oracle bit-for-mask."""
    q, k, v = make_qkv(rng_key, (1, 2, 256, 64))
    do = jax.random.normal(jax.random.PRNGKey(3), q.shape, jnp.float32) * 0.1
    slopes = jnp.array([0.25, 0.0625], jnp.float32)
    seed = jnp.int32(11)

    def loss(q_, k_, v_, s_):
        return jnp.sum(
            flash_attention(
                q_, k_, v_, causal=True, softcap=8.0, alibi_slopes=s_,
                dropout_rate=0.2, dropout_seed=seed,
            )
            * do
        )

    def loss_ref(q_, k_, v_, s_):
        return jnp.sum(
            attention_reference(
                q_, k_, v_, causal=True, softcap=8.0, alibi_slopes=s_,
                dropout_rate=0.2, dropout_seed=seed,
            )
            * do
        )

    g = jax.grad(loss, argnums=(0, 1, 2, 3))(q, k, v, slopes)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(q, k, v, slopes)
    for a, b in zip(g[:3], gr[:3]):
        assert max_abs_diff(a, b) < 1e-3
    np.testing.assert_allclose(
        np.asarray(g[3]), np.asarray(gr[3]), rtol=1e-3, atol=1e-3
    )


def test_no_oracle_vjp_in_ext_bwd(rng_key):
    """The softcap backward must not materialize the O(N^2) score tensor:
    check the jaxpr of the VJP for any (N, N)-shaped fp32 intermediate
    bigger than the kernel's own block tiles."""
    n = 512
    q, k, v = make_qkv(rng_key, (1, 1, n, 64))

    def loss(q_):
        return jnp.sum(
            flash_attention(q_, k, v, causal=True, softcap=8.0) ** 2
        )

    jaxpr = jax.make_jaxpr(jax.grad(loss))(q)

    def check(jx):
        for eqn in jx.eqns:
            if "pallas" in str(eqn.primitive):
                # The kernel's own VMEM score tile is (block_q, block_kv)
                # by design; only HBM-level intermediates are the smell.
                continue
            for var in eqn.outvars:
                shape = getattr(var.aval, "shape", ())
                # A dense [*, N, N] score tensor would betray an oracle VJP.
                assert not (
                    len(shape) >= 2 and shape[-1] == n and shape[-2] == n
                ), f"O(N^2) intermediate {shape} in {eqn.primitive}"
            for sub in jax.core.jaxprs_in_params(eqn.params):
                check(sub)

    check(jaxpr.jaxpr)


# ---------------------------------------------------------------------------
# Triangular fused backward (kernels/flash_tri.py, round 4)
# ---------------------------------------------------------------------------


@pytest.mark.parametrize(
    "shape,blocks",
    [
        ((2, 2, 512, 64), (256, 256)),
        ((1, 1, 1024, 64), (256, 512)),
        ((3, 1, 768, 64), (256, 256)),  # batch not a power of two (fold=1)
    ],
)
def test_tri_bwd_matches_split_and_oracle(rng_key, shape, blocks):
    """The fused triangular backward must agree with the split FA-2
    kernels AND the closed-form oracle on causal static-offset shapes."""
    from flash_attention_metal_tpu.kernels.flash_tri import (
        flash_attention_bwd_tri,
    )

    bq, bk = blocks
    q, k, v = make_qkv(rng_key, shape, dtype=jnp.bfloat16)
    o, lse = flash_attention_fwd(
        q, k, v, causal=True, save_lse=True, interpret=INTERPRET
    )
    do = q * 0.01
    dq_t, dk_t, dv_t = flash_attention_bwd_tri(
        q, k, v, o, do, lse, block_q=bq, block_k=bk, interpret=INTERPRET
    )
    dq_s, dk_s, dv_s = flash_attention_bwd(
        q, k, v, o, do, lse, causal=True, interpret=INTERPRET
    )
    dq_r, dk_r, dv_r = attention_reference_bwd(q, k, v, do, causal=True)
    for t, s, r in ((dq_t, dq_s, dq_r), (dk_t, dk_s, dk_r),
                    (dv_t, dv_s, dv_r)):
        assert max_abs_diff(t, s) < 1e-3
        assert max_abs_diff(t, r) < 1e-3


@pytest.mark.parametrize(
    "shape,blocks",
    [
        ((2, 2, 512, 64), (512, 512)),
        ((1, 1, 1024, 64), (512, 512)),
        ((1, 2, 1024, 64), (256, 512)),
    ],
)
def test_tri_bwd_pv_transposed(rng_key, shape, blocks):
    """Transposed-gradient mode (dV^T/dK^T/dQ^T wide-output matmuls,
    wrapper transposes) == untransposed tri backward == oracle — the
    round-5 flagship winner (experiments/tri_bwd_pvt.py, 1.34x over the
    split pair)."""
    from flash_attention_metal_tpu.kernels.flash_tri import (
        flash_attention_bwd_tri,
    )

    bq, bk = blocks
    q, k, v = make_qkv(rng_key, shape, dtype=jnp.bfloat16)
    o, lse = flash_attention_fwd(
        q, k, v, causal=True, save_lse=True, interpret=INTERPRET
    )
    do = q * 0.01
    got = flash_attention_bwd_tri(
        q, k, v, o, do, lse, block_q=bq, block_k=bk, pv_transposed=True,
        interpret=INTERPRET,
    )
    want = flash_attention_bwd_tri(
        q, k, v, o, do, lse, block_q=bq, block_k=bk, interpret=INTERPRET
    )
    ref = attention_reference_bwd(q, k, v, do, causal=True)
    for g, w, r, name in zip(got, want, ref, ("dq", "dk", "dv")):
        assert g.shape == w.shape, name
        assert max_abs_diff(g, w) < 1e-3, name
        assert max_abs_diff(g, r) < 1e-3, name


def test_bwd_auto_heuristic_routes_tri_pvt(rng_key, monkeypatch):
    """An UNTUNED plain-causal backward shape that fits 512 tiles routes
    the transposed-gradient tri kernel by default (round 5); ineligible
    shapes (n_q not 512-tileable) keep the split default."""
    from flash_attention_metal_tpu.harness import autotune
    from flash_attention_metal_tpu.kernels import flash_tri as tri_mod
    from flash_attention_metal_tpu.kernels.flash_bwd import (
        flash_attention_bwd_auto,
    )

    monkeypatch.setattr(autotune, "_MEMO", {})
    calls = []
    real = tri_mod.flash_attention_bwd_tri

    def spy(*a, **kw):
        calls.append((kw.get("block_q"), kw.get("pv_transposed")))
        return real(*a, **kw)

    monkeypatch.setattr(tri_mod, "flash_attention_bwd_tri", spy)
    q, k, v = make_qkv(rng_key, (2, 1, 512, 64), dtype=jnp.bfloat16)
    o, lse = flash_attention_fwd(
        q, k, v, causal=True, save_lse=True, interpret=INTERPRET
    )
    do = q * 0.01
    got = flash_attention_bwd_auto(
        q, k, v, o, do, lse, causal=True, interpret=INTERPRET
    )
    assert calls == [(512, True)]
    ref = attention_reference_bwd(q, k, v, do, causal=True)
    for g, r in zip(got, ref):
        assert max_abs_diff(g, r) < 1e-3
    # Non-512-tileable shape: no tri call (split default).
    calls.clear()
    q2, k2, v2 = make_qkv(rng_key, (2, 1, 256, 64), dtype=jnp.bfloat16)
    o2, lse2 = flash_attention_fwd(
        q2, k2, v2, causal=True, save_lse=True, interpret=INTERPRET
    )
    flash_attention_bwd_auto(
        q2, k2, v2, o2, q2 * 0.01, lse2, causal=True, interpret=INTERPRET
    )
    assert calls == []


def test_tri_bwd_dlse_fold(rng_key):
    """The lse cotangent folds into the tri backward's delta precompute
    exactly as in the split path."""
    from flash_attention_metal_tpu.kernels.flash_tri import (
        flash_attention_bwd_tri,
    )

    q, k, v = make_qkv(rng_key, (1, 2, 512, 64), dtype=jnp.bfloat16)
    o, lse = flash_attention_fwd(
        q, k, v, causal=True, save_lse=True, interpret=INTERPRET
    )
    do = q * 0.01
    dlse = jnp.sin(jnp.arange(2 * 512, dtype=jnp.float32)).reshape(1, 2, 512)
    got = flash_attention_bwd_tri(
        q, k, v, o, do, lse, dlse, interpret=INTERPRET
    )
    want = flash_attention_bwd(
        q, k, v, o, do, lse, None, dlse, causal=True, interpret=INTERPRET
    )
    for g, w in zip(got, want):
        assert max_abs_diff(g, w) < 1e-3


def test_bwd_auto_routes_tri_from_cache(rng_key, tmp_path, monkeypatch):
    """A persisted {"impl": "tri"} bwd cache entry routes the dispatcher
    through the fused triangular kernel — and unsupported feature
    combinations (window) fall back to the split path, both correct."""
    import json as _json

    from flash_attention_metal_tpu.harness import autotune
    from flash_attention_metal_tpu.kernels.flash_bwd import (
        flash_attention_bwd_auto,
    )

    b, h, n, d = 1, 1, 512, 64
    key = autotune._key("bwd", b, h, n, n, d, True, jnp.bfloat16)
    cache = {key: {"impl": "tri",
                   "blocks": {"block_q": 256, "block_k": 256}, "us": 1.0}}
    path = tmp_path / "cache.json"
    path.write_text(_json.dumps(cache))
    monkeypatch.setattr(autotune, "DEFAULT_CACHE", str(path))
    monkeypatch.setattr(autotune, "_MEMO", None)

    q, k, v = make_qkv(rng_key, (b, h, n, d), dtype=jnp.bfloat16)
    o, lse = flash_attention_fwd(
        q, k, v, causal=True, save_lse=True, interpret=INTERPRET
    )
    do = q * 0.01
    got = flash_attention_bwd_auto(
        q, k, v, o, do, lse, causal=True, interpret=INTERPRET
    )
    want = attention_reference_bwd(q, k, v, do, causal=True)
    for g, w in zip(got, want):
        assert max_abs_diff(g, w) < 1e-3

    # Window attention on the same (tri-tuned) shape: must fall back.
    ow, lsew = flash_attention_fwd(
        q, k, v, causal=True, window=128, save_lse=True, interpret=INTERPRET
    )
    goww = flash_attention_bwd_auto(
        q, k, v, ow, do, lsew, causal=True, window=128, interpret=INTERPRET
    )
    www = flash_attention_bwd(
        q, k, v, ow, do, lsew, causal=True, window=128, interpret=INTERPRET
    )
    for g, w in zip(goww, www):
        assert max_abs_diff(g, w) < 1e-6  # identical split path
    monkeypatch.setattr(autotune, "_MEMO", None)


def test_tri_bwd_gqa_fold_pos_div(rng_key):
    """The tri backward under the GQA row-fold convention (pos_div=group)
    matches the split kernels' fold path on the same folded operands."""
    from flash_attention_metal_tpu.kernels.flash_tri import (
        flash_attention_bwd_tri,
    )
    from flash_attention_metal_tpu.ops.attention import (
        fold_gqa_rows,
        unfold_gqa_rows,
    )

    b, hq, hkv, n, d = 2, 4, 2, 512, 64
    group = hq // hkv
    q, _, _ = make_qkv(rng_key, (b, hq, n, d), dtype=jnp.bfloat16)
    _, k, v = make_qkv(jax.random.fold_in(rng_key, 1), (b, hkv, n, d),
                       dtype=jnp.bfloat16)
    kb = jnp.repeat(k, group, axis=1)
    vb = jnp.repeat(v, group, axis=1)
    o, lse = flash_attention_fwd(
        q, kb, vb, causal=True, save_lse=True, interpret=INTERPRET
    )
    do = q * 0.01
    qf, of, dof, lsef = (fold_gqa_rows(x, hkv) for x in (q, o, do, lse))
    got = flash_attention_bwd_tri(
        qf, k, v, of, dof, lsef, pos_div=group, interpret=INTERPRET
    )
    want = flash_attention_bwd(
        qf, k, v, of, dof, lsef, causal=True, pos_div=group,
        interpret=INTERPRET,
    )
    for g, w in zip(got, want):
        assert max_abs_diff(g, w) < 1e-3
    # And the unfolded dQ matches the broadcast-path oracle gradient.
    dq = unfold_gqa_rows(got[0], hq, n)
    dq_r, dk_r, dv_r = attention_reference_bwd(q, kb, vb, do, causal=True)
    assert max_abs_diff(dq, dq_r) < 1e-3
    dk_g = dk_r.reshape(b, hkv, group, n, d).sum(axis=2)
    dv_g = dv_r.reshape(b, hkv, group, n, d).sum(axis=2)
    assert max_abs_diff(got[1], dk_g) < 1e-3
    assert max_abs_diff(got[2], dv_g) < 1e-3
