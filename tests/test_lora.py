"""LoRA adapter fine-tuning tests.

Invariants: zero-init adapters are an exact identity; training moves
only the adapters (the base stays frozen by construction); the merged
tree is a plain FlashLM param tree that serves through the engine; and
adapters round-trip through the checkpoint layer.
"""

import numpy as np
import jax
import jax.numpy as jnp

from flash_attention_metal_tpu.models import (
    LoRAConfig,
    ModelConfig,
    forward,
    init_lora,
    init_params,
    lora_loss_fn,
    lora_num_params,
    loss_fn,
    make_lora_train_step,
    merge_lora,
)

CFG = ModelConfig(
    vocab_size=128,
    d_model=128,
    n_layers=2,
    n_heads=2,
    n_kv_heads=2,
    head_dim=64,
    d_ff=128,
    max_seq_len=64,
    dtype=jnp.float32,
)
LCFG = LoRAConfig(rank=4, alpha=8.0)


def _fixtures(seed=0, batch=2, seq=32):
    key = jax.random.PRNGKey(seed)
    kp, ka, kt = jax.random.split(key, 3)
    params = init_params(kp, CFG)
    adapters = init_lora(ka, params, LCFG)
    tokens = jax.random.randint(kt, (batch, seq), 0, CFG.vocab_size)
    return params, adapters, tokens


def test_zero_init_is_identity():
    params, adapters, tokens = _fixtures()
    merged = merge_lora(params, adapters, LCFG)
    base = forward(params, tokens, CFG)
    tuned = forward(merged, tokens, CFG)
    np.testing.assert_array_equal(np.asarray(base), np.asarray(tuned))


def test_adapter_training_reduces_loss_base_frozen():
    params, adapters, tokens = _fixtures()
    step, opt_init = make_lora_train_step(CFG, LCFG)
    opt_state = opt_init(adapters)
    base_snapshot = jax.tree_util.tree_map(np.asarray, params)

    losses = []
    for _ in range(8):
        adapters, opt_state, loss = step(adapters, opt_state, params, tokens)
        losses.append(float(loss))
    assert losses[-1] < losses[0] - 0.05, losses

    # Base params are inputs, never outputs: bit-identical after training.
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), b),
        params,
        base_snapshot,
    )
    # The adapters really are tiny relative to the model.
    n_base = sum(x.size for x in jax.tree_util.tree_leaves(params))
    assert lora_num_params(adapters) < 0.1 * n_base

    # And the loss-through-merge matches evaluating the merged tree.
    merged = merge_lora(params, adapters, LCFG)
    np.testing.assert_allclose(
        float(lora_loss_fn(adapters, params, tokens, CFG, LCFG)),
        float(loss_fn(merged, tokens, CFG)),
        rtol=1e-6,
    )


def test_merged_tree_serves_through_engine():
    from flash_attention_metal_tpu.runtime import DecodeEngine, Request

    params, adapters, tokens = _fixtures()
    # Perturb B so the adapters actually change the function.
    adapters = jax.tree_util.tree_map(
        lambda x: x + 0.01 if x.ndim == 2 and x.shape[0] == LCFG.rank else x,
        adapters,
    )
    merged = merge_lora(params, adapters, LCFG)
    eng = DecodeEngine(merged, CFG, max_batch=2, max_len=128)
    eng.submit(Request(uid=0, prompt=[1, 2, 3], max_new_tokens=8))
    out = eng.run()
    assert len(out[0]) == 8

    base = forward(params, tokens, CFG)
    tuned = forward(merged, tokens, CFG)
    assert float(jnp.max(jnp.abs(base - tuned))) > 0


def test_adapters_checkpoint_roundtrip(tmp_path):
    from flash_attention_metal_tpu.utils.checkpoint import (
        restore_pytree,
        save_pytree,
    )

    params, adapters, _ = _fixtures()
    adapters = jax.tree_util.tree_map(lambda x: x + 0.5, adapters)
    save_pytree(str(tmp_path / "lora"), adapters)
    fresh = init_lora(jax.random.PRNGKey(9), params, LCFG)
    restored = restore_pytree(str(tmp_path / "lora"), like=fresh)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(
            np.asarray(a), np.asarray(b)
        ),
        adapters,
        restored,
    )
