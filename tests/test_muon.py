"""Muon optimizer tests: Newton-Schulz orthogonalization quality,
label partitioning, and end-to-end training through the Trainer."""

import numpy as np
import jax
import jax.numpy as jnp

from flash_attention_metal_tpu.models import ModelConfig, init_params
from flash_attention_metal_tpu.models.muon import (
    make_muon_optimizer,
    muon_label_tree,
    newton_schulz_orthogonalize,
)

CFG = ModelConfig(
    vocab_size=256,
    d_model=128,
    n_layers=2,
    n_heads=2,
    n_kv_heads=2,
    head_dim=64,
    d_ff=128,
    max_seq_len=128,
    dtype=jnp.float32,
)


def test_newton_schulz_orthogonalizes():
    g = jax.random.normal(jax.random.PRNGKey(0), (128, 384))
    x = newton_schulz_orthogonalize(g)
    s = jnp.linalg.svd(x, compute_uv=False)
    # Quintic NS in bf16: singular values land near 1 (not exact).
    assert float(s.min()) > 0.3, float(s.min())
    assert float(s.max()) < 1.6, float(s.max())
    # Singular directions preserved: x should align with UV^T of g.
    u, _, vt = jnp.linalg.svd(g, full_matrices=False)
    align = float(jnp.sum(x * (u @ vt)) / jnp.linalg.norm(x) /
                  jnp.linalg.norm(u @ vt))
    assert align > 0.95, align
    # Tall matrices go through the transpose path.
    x2 = newton_schulz_orthogonalize(g.T)
    s2 = jnp.linalg.svd(x2, compute_uv=False)
    assert float(s2.min()) > 0.3 and float(s2.max()) < 1.6


def test_labels_partition():
    params = init_params(jax.random.PRNGKey(0), CFG)
    labels = muon_label_tree(params)
    assert labels["embed"] == "adamw"
    assert labels["lm_head"] == "adamw"
    assert labels["final_norm"] == "adamw"
    layer = labels["layers"][0]
    assert layer["wq"] == "muon" and layer["w_down"] == "muon"
    assert layer["attn_norm"] == "adamw"


def test_muon_trains():
    from flash_attention_metal_tpu.models.trainer import Trainer

    params = init_params(jax.random.PRNGKey(0), CFG)
    tr = Trainer(
        CFG, seed=0, optimizer=make_muon_optimizer(params, muon_lr=0.01)
    )
    tokens = jax.random.randint(
        jax.random.PRNGKey(1), (4, 64), 0, CFG.vocab_size
    )
    losses = [tr.step(tokens) for _ in range(6)]
    assert losses[-1] < losses[0] - 0.3, losses
    assert np.isfinite(losses[-1])
