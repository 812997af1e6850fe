"""Distributed attention on the 8-device virtual CPU mesh (SURVEY.md §4).

Every sharded variant must reproduce the single-device oracle bit-for-
tolerance: the cross-device online-softmax merge is exactly the kernel's
intra-chip merge, so the tolerances match the fp32 ladder rung.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, PartitionSpec

from flash_attention_metal_tpu.parallel import (
    allgather_attention,
    lse_combine_attention,
    make_mesh,
    make_ring_attention,
    merge_partials,
    ring_flash_attention,
    ulysses_attention,
)
from flash_attention_metal_tpu.reference import (
    attention_reference,
    attention_reference_with_lse,
    make_qkv,
)

SP = PartitionSpec(None, None, "sp", None)


def max_abs_diff(a, b):
    return float(jnp.max(jnp.abs(a.astype(jnp.float32) - b.astype(jnp.float32))))


def sp_mesh():
    return make_mesh((1, 1, 8))


def test_merge_partials_equals_full_softmax(rng_key):
    """Merging two disjoint-KV partials == attention over the union."""
    q, k, v = make_qkv(rng_key, (1, 1, 128, 64))
    k2, v2 = jax.random.normal(jax.random.PRNGKey(5), k.shape), jax.random.normal(
        jax.random.PRNGKey(6), v.shape
    )
    o_a, lse_a = attention_reference_with_lse(q, k, v)
    o_b, lse_b = attention_reference_with_lse(q, k2, v2)
    o, lse = merge_partials(
        o_a.astype(jnp.float32),
        lse_a[..., None],
        o_b.astype(jnp.float32),
        lse_b[..., None],
    )
    want = attention_reference(
        q, jnp.concatenate([k, k2], 2), jnp.concatenate([v, v2], 2)
    )
    assert max_abs_diff(o, want) < 1e-5


def test_merge_partials_empty_side(rng_key):
    q, k, v = make_qkv(rng_key, (1, 1, 128, 64))
    o_a, lse_a = attention_reference_with_lse(q, k, v)
    o_a = o_a.astype(jnp.float32)
    empty_o = jnp.zeros_like(o_a)
    empty_lse = jnp.full((*o_a.shape[:3], 1), -jnp.inf)
    o, lse = merge_partials(o_a, lse_a[..., None], empty_o, empty_lse)
    assert max_abs_diff(o, o_a) == 0.0
    np.testing.assert_allclose(np.asarray(lse[..., 0]), np.asarray(lse_a))
    # both sides empty -> zeros, -inf
    o2, lse2 = merge_partials(empty_o, empty_lse, empty_o, empty_lse)
    assert float(jnp.max(jnp.abs(o2))) == 0.0
    assert bool(jnp.all(jnp.isneginf(lse2)))


@pytest.mark.parametrize("causal", [False, True])
def test_ring_attention_vs_oracle(rng_key, causal):
    mesh = sp_mesh()
    q, k, v = make_qkv(rng_key, (1, 2, 1024, 64))
    want = attention_reference(q, k, v, causal=causal)

    ring = make_ring_attention(mesh, "sp", causal=causal)
    got = ring(q, k, v)
    assert max_abs_diff(got, want) < 1e-3


def test_ring_attention_xla_impl(rng_key):
    mesh = sp_mesh()
    q, k, v = make_qkv(rng_key, (1, 2, 512, 64))
    want = attention_reference(q, k, v, causal=True)
    ring = make_ring_attention(mesh, "sp", causal=True, impl="xla")
    got = ring(q, k, v)
    assert max_abs_diff(got, want) < 1e-3


@pytest.mark.parametrize("causal", [False, True])
def test_allgather_cp_vs_oracle(rng_key, causal):
    mesh = sp_mesh()
    q, k, v = make_qkv(rng_key, (1, 2, 1024, 64))
    want = attention_reference(q, k, v, causal=causal)

    f = jax.jit(
        jax.shard_map(
            functools.partial(
                allgather_attention, axis_name="sp", causal=causal
            ),
            mesh=mesh,
            in_specs=(SP, SP, SP),
            out_specs=SP,
            check_vma=False,
        )
    )
    got = f(q, k, v)
    assert max_abs_diff(got, want) < 1e-3


def test_allgather_cp_grad_matches_oracle(rng_key):
    """The CP training path: grads through shard_map == oracle grads."""
    mesh = sp_mesh()
    q, k, v = make_qkv(rng_key, (1, 2, 512, 64))

    inner = jax.shard_map(
        functools.partial(allgather_attention, axis_name="sp", causal=True),
        mesh=mesh,
        in_specs=(SP, SP, SP),
        out_specs=SP,
        check_vma=False,
    )
    g = jax.jit(jax.grad(lambda q_, k_, v_: jnp.sum(inner(q_, k_, v_) ** 2)))
    gq, = (g(q, k, v),)
    g_ref = jax.grad(
        lambda q_: jnp.sum(attention_reference(q_, k, v, causal=True) ** 2)
    )(q)
    assert max_abs_diff(gq, g_ref) < 5e-3


@pytest.mark.parametrize("causal", [False, True])
def test_lse_combine_decode_topology(rng_key, causal):
    """Replicated Q (decode step), sequence-sharded KV."""
    mesh = sp_mesh()
    kq, _, _ = jax.random.split(rng_key, 3)
    q = jax.random.uniform(kq, (1, 2, 128, 64), jnp.float32, -1, 1)
    _, k, v = make_qkv(rng_key, (1, 2, 1024, 64))
    want = attention_reference(q, k, v, causal=causal)

    f = jax.jit(
        jax.shard_map(
            functools.partial(
                lse_combine_attention, axis_name="sp", causal=causal
            ),
            mesh=mesh,
            in_specs=(PartitionSpec(), SP, SP),
            out_specs=PartitionSpec(),
            check_vma=False,
        )
    )
    got = f(q, k, v)
    assert max_abs_diff(got, want) < 1e-3


@pytest.mark.parametrize("causal", [False, True])
def test_ulysses_vs_oracle(rng_key, causal):
    mesh = sp_mesh()
    q, k, v = make_qkv(rng_key, (1, 8, 1024, 64))  # 8 heads over 8 devices
    want = attention_reference(q, k, v, causal=causal)

    f = jax.jit(
        jax.shard_map(
            functools.partial(ulysses_attention, axis_name="sp", causal=causal),
            mesh=mesh,
            in_specs=(SP, SP, SP),
            out_specs=SP,
            check_vma=False,
        )
    )
    got = f(q, k, v)
    assert max_abs_diff(got, want) < 1e-3


def test_ulysses_grad(rng_key):
    mesh = sp_mesh()
    q, k, v = make_qkv(rng_key, (1, 8, 512, 64))
    inner = jax.shard_map(
        functools.partial(ulysses_attention, axis_name="sp", causal=True),
        mesh=mesh,
        in_specs=(SP, SP, SP),
        out_specs=SP,
        check_vma=False,
    )
    g = jax.jit(jax.grad(lambda v_: jnp.sum(inner(q, k, v_) ** 2)))(v)
    g_ref = jax.grad(
        lambda v_: jnp.sum(attention_reference(q, k, v_, causal=True) ** 2)
    )(v)
    assert max_abs_diff(g, g_ref) < 5e-3


def test_ring_bf16(rng_key):
    mesh = sp_mesh()
    q, k, v = make_qkv(rng_key, (2, 4, 1024, 64), dtype=jnp.bfloat16)
    want = attention_reference(q, k, v, causal=True)
    ring = make_ring_attention(mesh, "sp", causal=True)
    got = ring(q, k, v)
    assert got.dtype == jnp.bfloat16
    assert max_abs_diff(got, want) < 1e-2


@pytest.mark.parametrize("causal", [False, True])
def test_ring_attention_grads_match_oracle(rng_key, causal):
    """Reverse-ring backward: all three grads == oracle grads."""
    mesh = sp_mesh()
    q, k, v = make_qkv(rng_key, (1, 2, 512, 64))

    ring = make_ring_attention(
        mesh, "sp", causal=causal, differentiable=True
    )

    def loss(q_, k_, v_):
        return jnp.sum(ring(q_, k_, v_) ** 2)

    def loss_ref(q_, k_, v_):
        return jnp.sum(attention_reference(q_, k_, v_, causal=causal) ** 2)

    got = jax.jit(jax.grad(loss, argnums=(0, 1, 2)))(q, k, v)
    want = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for name, a, b in zip("qkv", got, want):
        assert max_abs_diff(a, b) < 5e-3, (causal, name)


def test_train_step_ring_sp_attention(rng_key):
    """Full dp x tp x sp train step with ring SP attention converges."""
    from flash_attention_metal_tpu.models import ModelConfig, init_params
    from flash_attention_metal_tpu.models.parallel_train import (
        make_train_step,
    )
    from flash_attention_metal_tpu.parallel import make_mesh

    mesh = make_mesh((2, 2, 2))
    cfg = ModelConfig(
        vocab_size=512,
        d_model=128,
        n_layers=2,
        n_heads=4,
        n_kv_heads=2,
        head_dim=64,
        d_ff=256,
        max_seq_len=512,
        dtype=jnp.float32,
    )
    params = init_params(jax.random.PRNGKey(0), cfg)
    tokens = jax.random.randint(jax.random.PRNGKey(1), (4, 256), 0, 512)
    step = make_train_step(mesh, cfg, lr=1e-2, sp_attn="ring")
    params, loss1 = step(params, tokens)
    params, loss2 = step(params, tokens)
    assert jnp.isfinite(loss1) and jnp.isfinite(loss2)
    assert float(loss2) < float(loss1)


def test_optax_sharded_train_step(rng_key):
    """Sharded AdamW over dp x tp x sp: converges, state stays sharded."""
    import optax

    from flash_attention_metal_tpu.models import ModelConfig, init_params
    from flash_attention_metal_tpu.models.parallel_train import (
        make_optax_train_step,
        opt_state_specs,
        param_specs,
    )
    from flash_attention_metal_tpu.parallel import make_mesh

    mesh = make_mesh((2, 2, 2))
    cfg = ModelConfig(
        vocab_size=512,
        d_model=128,
        n_layers=2,
        n_heads=4,
        n_kv_heads=2,
        head_dim=64,
        d_ff=256,
        max_seq_len=512,
        dtype=jnp.float32,
    )
    params = init_params(jax.random.PRNGKey(0), cfg)
    opt = optax.chain(
        optax.clip_by_global_norm(1.0), optax.adamw(1e-2)
    )
    opt_state = opt.init(params)
    # Spec tree must be buildable and structurally compatible.
    specs = opt_state_specs(opt, params, cfg)
    jax.tree_util.tree_structure(specs)

    tokens = jax.random.randint(jax.random.PRNGKey(1), (4, 256), 0, 512)
    step = make_optax_train_step(mesh, cfg, opt)
    params, opt_state, l1 = step(params, opt_state, tokens)
    params, opt_state, l2 = step(params, opt_state, tokens)
    params, opt_state, l3 = step(params, opt_state, tokens)
    assert jnp.isfinite(l1) and float(l3) < float(l1)


def test_ring_gqa_grads_match_oracle(rng_key):
    """Differentiable ring attention with GQA (fewer KV heads) — the
    round-1 ADVICE high finding: the reverse ring used to feed unequal
    head counts straight into flash_attention_bwd and silently corrupt
    dq/dk/dv (~4e-2 error)."""
    mesh = sp_mesh()
    B, Hq, Hkv, N, D = 1, 4, 2, 512, 64
    q, _, _ = make_qkv(rng_key, (B, Hq, N, D))
    _, k, v = make_qkv(jax.random.PRNGKey(11), (B, Hkv, N, D))
    ring = make_ring_attention(mesh, causal=True, differentiable=True)
    co = jax.random.normal(jax.random.PRNGKey(12), q.shape) * 0.1

    def loss_ring(q_, k_, v_):
        return jnp.sum(ring(q_, k_, v_) * co)

    def loss_oracle(q_, k_, v_):
        kb = jnp.repeat(k_, Hq // Hkv, axis=1)
        vb = jnp.repeat(v_, Hq // Hkv, axis=1)
        return jnp.sum(attention_reference(q_, kb, vb, causal=True) * co)

    got = jax.grad(loss_ring, argnums=(0, 1, 2))(q, k, v)
    want = jax.grad(loss_oracle, argnums=(0, 1, 2))(q, k, v)
    for name, a, b in zip("qkv", got, want):
        assert max_abs_diff(a, b) < 1e-3, name


def test_ulysses_gqa_replicated_kv(rng_key):
    """Ulysses with fewer KV heads than devices: KV heads are replicated
    up to one per device (axis_size % kv_heads == 0 case)."""
    mesh = sp_mesh()
    B, Hq, Hkv, N, D = 1, 8, 2, 512, 64
    q, _, _ = make_qkv(rng_key, (B, Hq, N, D))
    _, k, v = make_qkv(jax.random.PRNGKey(13), (B, Hkv, N, D))

    fn = jax.jit(
        jax.shard_map(
            functools.partial(
                ulysses_attention, axis_name="sp", causal=True, impl="xla"
            ),
            mesh=mesh,
            in_specs=(SP, SP, SP),
            out_specs=SP,
            check_vma=False,
        )
    )
    got = fn(q, k, v)
    want = attention_reference(
        q,
        jnp.repeat(k, Hq // Hkv, axis=1),
        jnp.repeat(v, Hq // Hkv, axis=1),
        causal=True,
    )
    assert max_abs_diff(got, want) < 1e-3


def test_ulysses_rejects_bad_head_ratio(rng_key):
    """Neither kv_heads % axis nor axis % kv_heads: a clear error."""
    mesh = sp_mesh()
    q, _, _ = make_qkv(rng_key, (1, 8, 512, 64))
    _, k, v = make_qkv(jax.random.PRNGKey(14), (1, 3, 512, 64))
    fn = jax.jit(
        jax.shard_map(
            functools.partial(
                ulysses_attention, axis_name="sp", causal=True, impl="xla"
            ),
            mesh=mesh,
            in_specs=(SP, SP, SP),
            out_specs=SP,
            check_vma=False,
        )
    )
    with pytest.raises(ValueError, match="Ulysses"):
        fn(q, k, v)
