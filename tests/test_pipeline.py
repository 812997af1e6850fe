"""Pipeline-parallel training on the 8-device virtual mesh.

The pp schedule must be a pure re-ordering of the same math: the
pipelined loss equals the non-pipelined dp x tp x sp loss on identical
params/tokens, gradients included (checked through a training step).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from flash_attention_metal_tpu.models import ModelConfig, init_params
from flash_attention_metal_tpu.models.parallel_train import make_train_step
from flash_attention_metal_tpu.models.pipeline import (
    make_pp_train_step,
    pp_param_specs,
    stack_layer_params,
    unstack_layer_params,
)
from flash_attention_metal_tpu.parallel import make_mesh

CFG = ModelConfig(
    vocab_size=512,
    d_model=128,
    n_layers=4,
    n_heads=4,
    n_kv_heads=2,
    head_dim=64,
    d_ff=256,
    max_seq_len=512,
    dtype=jnp.float32,
)


def pp_mesh(dp, pp, tp, sp):
    return make_mesh((dp, pp, tp, sp), axis_names=("dp", "pp", "tp", "sp"))


@pytest.fixture(scope="module")
def fixtures():
    params = init_params(jax.random.PRNGKey(0), CFG)
    tokens = jax.random.randint(jax.random.PRNGKey(1), (4, 256), 0, 512)
    return params, tokens


def _baseline_losses(params, tokens, steps=2):
    mesh = make_mesh((2, 2, 2))
    step = make_train_step(mesh, CFG, lr=1e-2)
    out = []
    for _ in range(steps):
        params, loss = step(params, tokens)
        out.append(float(loss))
    return out


def _pp_losses(params, tokens, dp, pp, tp, sp, n_micro, steps=2, **kw):
    mesh = pp_mesh(dp, pp, tp, sp)
    step = make_pp_train_step(mesh, CFG, n_micro=n_micro, lr=1e-2, **kw)
    sp_ = stack_layer_params(params)
    out = []
    for _ in range(steps):
        sp_, loss = step(sp_, tokens)
        out.append(float(loss))
    return out, sp_


def test_stack_roundtrip(fixtures):
    params, _ = fixtures
    rt = unstack_layer_params(stack_layer_params(params))
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(a, b), params, rt
    )


def test_pp_matches_nonpp_losses(fixtures):
    """pp=2 over 2 steps == the dp x tp x sp baseline step-for-step.

    Same fp32 math in a different schedule; the second step also checks
    the gradient path (params must have moved identically)."""
    params, tokens = fixtures
    want = _baseline_losses(params, tokens)
    got, _ = _pp_losses(params, tokens, dp=1, pp=2, tp=2, sp=2, n_micro=2)
    np.testing.assert_allclose(got, want, rtol=2e-4)


def test_pp_microbatch_count_invariance(fixtures):
    """n_micro=1 vs n_micro=4: identical losses (schedule-only change)."""
    params, tokens = fixtures
    a, _ = _pp_losses(params, tokens, dp=1, pp=2, tp=2, sp=2, n_micro=1)
    b, _ = _pp_losses(params, tokens, dp=1, pp=2, tp=2, sp=2, n_micro=4)
    np.testing.assert_allclose(a, b, rtol=2e-4)


def test_pp_four_stages_converges(fixtures):
    """Deep pipeline (pp=4, one layer per stage) trains."""
    params, tokens = fixtures
    losses, _ = _pp_losses(
        params, tokens, dp=1, pp=4, tp=1, sp=2, n_micro=4, steps=3
    )
    assert all(np.isfinite(losses))
    assert losses[-1] < losses[0]


def test_pp_with_dp_and_ring_sp(fixtures):
    """pp composes with dp and the ring sequence-parallel attention."""
    params, tokens = fixtures
    want = _baseline_losses(params, tokens, steps=1)
    got, _ = _pp_losses(
        params, tokens, dp=2, pp=2, tp=1, sp=2, n_micro=2, steps=1,
        sp_attn="ring",
    )
    np.testing.assert_allclose(got, want, rtol=2e-4)


def test_pp_specs_cover_params(fixtures):
    params, _ = fixtures
    sp_ = stack_layer_params(params)
    specs = pp_param_specs(CFG)
    assert jax.tree_util.tree_structure(sp_) == jax.tree_util.tree_structure(
        specs
    )


def test_pp_rejects_bad_layer_split(fixtures):
    params, tokens = fixtures
    mesh = pp_mesh(1, 8, 1, 1)  # 8 stages over 4 layers
    with pytest.raises(ValueError, match="divisible"):
        make_pp_train_step(mesh, CFG, n_micro=2)


def test_pp_optax_adamw_converges(fixtures):
    """Sharded AdamW over the 4-axis pipeline mesh converges."""
    import optax

    from flash_attention_metal_tpu.models.pipeline import (
        make_pp_optax_step,
        pp_opt_state_specs,
    )

    params, tokens = fixtures
    sp_ = stack_layer_params(params)
    opt = optax.chain(optax.clip_by_global_norm(1.0), optax.adamw(1e-2))
    opt_state = opt.init(sp_)
    jax.tree_util.tree_structure(pp_opt_state_specs(opt, sp_, CFG))

    mesh = pp_mesh(1, 2, 2, 2)
    step = make_pp_optax_step(mesh, CFG, opt, n_micro=2)
    losses = []
    for _ in range(3):
        sp_, opt_state, loss = step(sp_, opt_state, tokens)
        losses.append(float(loss))
    assert np.isfinite(losses[0]) and losses[-1] < losses[0]
