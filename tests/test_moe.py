"""Mixture-of-Experts + expert parallelism on the 8-device virtual mesh.

At full capacity (no token drops) the ep-sharded model is the same math
as the single-device oracle, so outputs/losses must agree to fp
tolerance; capacity behavior and the dispatch tensors get direct unit
checks.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from flash_attention_metal_tpu.models.moe import (
    MoEConfig,
    _capacity,
    init_moe_params,
    make_moe_train_step,
    moe_forward,
    topk_dispatch,
)
from flash_attention_metal_tpu.parallel import make_mesh

CFG = MoEConfig(
    vocab_size=512,
    d_model=128,
    n_layers=2,
    n_heads=4,
    n_kv_heads=2,
    head_dim=64,
    d_ff=256,
    max_seq_len=512,
    dtype=jnp.float32,
    n_experts=4,
    top_k=2,
    capacity_factor=8.0,  # no drops: sharded == oracle exactly
)


def moe_mesh(dp, ep, tp, sp):
    return make_mesh((dp, ep, tp, sp), axis_names=("dp", "ep", "tp", "sp"))


@pytest.fixture(scope="module")
def fixtures():
    params = init_moe_params(jax.random.PRNGKey(0), CFG)
    tokens = jax.random.randint(jax.random.PRNGKey(1), (8, 128), 0, 512)
    return params, tokens


def test_dispatch_one_hot_and_capacity():
    """Dispatch rows are one-hot per kept (token, choice); overflow rows
    drop; combine sums to ~1 for fully-kept tokens."""
    probs = jax.nn.softmax(
        jax.random.normal(jax.random.PRNGKey(2), (64, 4)), axis=-1
    )
    cap = 8  # 64 tokens x top2 / 4 experts = 32 slots needed; cap 8 drops
    disp, comb, (f_sum, p_sum, t) = topk_dispatch(probs, 2, cap)
    # Every expert fills at most `cap` slots, each slot at most once.
    slot_use = jnp.sum(disp, axis=0)  # [E, C]
    assert float(jnp.max(slot_use)) <= 1.0 + 1e-6
    per_expert = jnp.sum(disp, axis=(0, 2))
    assert float(jnp.max(per_expert)) <= cap + 1e-6
    # Aux statistics are raw sums over the local tokens.
    assert float(t) == 64.0
    np.testing.assert_allclose(float(jnp.sum(f_sum)), 64.0, rtol=1e-6)
    # With generous capacity nothing drops and every token's combine
    # weights sum to 1.
    disp2, comb2, _ = topk_dispatch(probs, 2, 64)
    np.testing.assert_allclose(
        np.asarray(jnp.sum(comb2, axis=(1, 2))), 1.0, rtol=1e-5
    )
    assert float(jnp.sum(disp2)) == 2 * 64


def test_capacity_rounding():
    cfg = dataclasses.replace(CFG, capacity_factor=1.0)
    c = _capacity(256, cfg)
    assert c % 8 == 0 and c >= 256 * cfg.top_k // cfg.n_experts


def test_ep_sharded_matches_oracle(fixtures):
    """ep=4 training loss == dp-only (ep=1) loss on identical inputs —
    the all_to_all transpose must be semantics-free at full capacity."""
    params, tokens = fixtures
    step1 = make_moe_train_step(moe_mesh(8, 1, 1, 1), CFG, lr=1e-2)
    step4 = make_moe_train_step(moe_mesh(2, 4, 1, 1), CFG, lr=1e-2)
    _, l1 = step1(params, tokens)
    _, l4 = step4(params, tokens)
    np.testing.assert_allclose(float(l1), float(l4), rtol=2e-5)


def test_ep_composes_with_tp_sp(fixtures):
    """Full 4-axis (dp,ep,tp,sp) MoE step: loss matches the dp-only run
    and improves over steps."""
    params, tokens = fixtures
    ref = make_moe_train_step(moe_mesh(8, 1, 1, 1), CFG, lr=1e-2)
    step = make_moe_train_step(moe_mesh(1, 2, 2, 2), CFG, lr=1e-2)
    _, l_ref = ref(params, tokens)
    p, l1 = step(params, tokens)
    _, l2 = step(p, tokens)
    np.testing.assert_allclose(float(l_ref), float(l1), rtol=2e-5)
    assert float(l2) < float(l1)


def test_moe_trains_with_drops(fixtures):
    """Tight capacity (tokens dropped to residual) still trains finitely."""
    params, tokens = fixtures
    cfg = dataclasses.replace(CFG, capacity_factor=0.5)
    step = make_moe_train_step(moe_mesh(2, 4, 1, 1), cfg, lr=1e-2)
    p, l1 = step(params, tokens)
    _, l2 = step(p, tokens)
    assert np.isfinite(float(l1)) and np.isfinite(float(l2))
    assert float(l2) < float(l1)


def test_moe_forward_oracle_finite(fixtures):
    params, tokens = fixtures
    logits = moe_forward(params, tokens[:2], CFG)
    assert logits.shape == (2, 128, CFG.vocab_size)
    assert bool(jnp.all(jnp.isfinite(logits)))


def test_moe_rejects_bad_expert_split(fixtures):
    with pytest.raises(ValueError, match="divisible"):
        make_moe_train_step(moe_mesh(1, 8, 1, 1), CFG)  # 4 experts / 8 ep


# ---------------------------------------------------------------------------
# MoE serving: the dense drop-free path through forward / decode / engine
# ---------------------------------------------------------------------------

from flash_attention_metal_tpu.models import forward  # noqa: E402
from flash_attention_metal_tpu.runtime.decode import (  # noqa: E402
    decode_step,
    prefill_slot,
)
from flash_attention_metal_tpu.runtime.engine import (  # noqa: E402
    DecodeEngine,
    Request,
)
from flash_attention_metal_tpu.runtime.kv_cache import init_cache  # noqa: E402


def test_moe_dense_path_matches_capacity_oracle(fixtures):
    """forward() (drop-free routed MLP) == the capacity-bucketed shard_map
    oracle at non-dropping capacity: same gates, same experts."""
    params, tokens = fixtures
    want = moe_forward(params, tokens[:2], CFG)
    got = forward(params, tokens[:2], CFG, remat=False)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), atol=1e-4, rtol=1e-4
    )


def test_moe_decode_matches_forward(fixtures):
    """MoE prefill + stepwise decode == teacher-forced forward logits —
    routing decisions must be identical with and without the KV cache."""
    params, _ = fixtures
    prompt_len, total = 50, 58
    tokens = jax.random.randint(jax.random.PRNGKey(3), (total,), 0, 512)
    full_logits = forward(params, tokens[None, :], CFG, remat=False)[0]

    cache = init_cache(
        CFG.n_layers, 2, CFG.n_kv_heads, 128, CFG.head_dim, CFG.dtype
    )
    padded = jnp.zeros((64,), jnp.int32).at[:prompt_len].set(
        tokens[:prompt_len]
    )
    logits, cache = prefill_slot(
        params, CFG, cache, padded, jnp.int32(prompt_len), 0
    )
    np.testing.assert_allclose(
        np.asarray(logits),
        np.asarray(full_logits[prompt_len - 1]),
        atol=2e-2,
        rtol=1e-2,
    )
    active = jnp.array([True, False])
    for t in range(prompt_len, total):
        step_tokens = jnp.array([int(tokens[t]), 0], jnp.int32)
        step_logits, cache = decode_step(
            params, CFG, cache, step_tokens, active
        )
        np.testing.assert_allclose(
            np.asarray(step_logits[0]),
            np.asarray(full_logits[t]),
            atol=2e-2,
            rtol=1e-2,
        )


def test_moe_engine_matches_manual_greedy(fixtures):
    """The continuous-batching engine serves the MoE model: greedy
    generations == a manual teacher-forced greedy loop."""
    params, _ = fixtures
    prompt = [7, 3, 11, 5]
    n_new = 6

    seq = list(prompt)
    for _ in range(n_new):
        logits = forward(
            params, jnp.asarray(seq)[None, :], CFG, remat=False
        )[0, -1]
        seq.append(int(jnp.argmax(logits)))
    want = seq[len(prompt):]

    eng = DecodeEngine(params, CFG, max_batch=2, max_len=128)
    eng.submit(Request(uid=0, prompt=prompt, max_new_tokens=n_new))
    got = eng.run()[0]
    assert got == want, (got, want)


def test_moe_optax_adamw_converges(fixtures):
    """Sharded AdamW over the (dp,ep,tp,sp) MoE mesh converges; expert
    moments shard with their experts."""
    import optax

    from flash_attention_metal_tpu.models.moe import (
        make_moe_optax_step,
        moe_opt_state_specs,
    )

    params, tokens = fixtures
    opt = optax.chain(optax.clip_by_global_norm(1.0), optax.adamw(1e-2))
    opt_state = opt.init(params)
    jax.tree_util.tree_structure(moe_opt_state_specs(opt, params, CFG))

    step = make_moe_optax_step(moe_mesh(1, 2, 2, 2), CFG, opt)
    p, losses = params, []
    for _ in range(3):
        p, opt_state, loss = step(p, opt_state, tokens)
        losses.append(float(loss))
    assert np.isfinite(losses[0]) and losses[-1] < losses[0]
