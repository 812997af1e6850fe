"""FlashLM model + decode runtime tests.

The key invariant: decode-with-cache reproduces teacher-forced forward
logits token for token (the cache path and the training path are the same
math through the same kernels).
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from flash_attention_metal_tpu.models import (
    ModelConfig,
    forward,
    init_params,
    loss_fn,
    sgd_train_step,
)
from flash_attention_metal_tpu.runtime import (
    DecodeEngine,
    Request,
    decode_step,
    init_cache,
    prefill_slot,
)

CFG = ModelConfig(
    vocab_size=256,
    d_model=128,
    n_layers=2,
    n_heads=4,
    n_kv_heads=2,
    head_dim=64,
    d_ff=256,
    max_seq_len=256,
    dtype=jnp.float32,  # fp32 on CPU for tight decode-vs-forward checks
)


@pytest.fixture(scope="module")
def params():
    return init_params(jax.random.PRNGKey(0), CFG)


CFG_WINDOW = ModelConfig(
    vocab_size=256,
    d_model=128,
    n_layers=2,
    n_heads=4,
    n_kv_heads=2,
    head_dim=64,
    d_ff=256,
    max_seq_len=256,
    dtype=jnp.float32,
    attn_window=32,
)


@pytest.fixture(scope="module")
def params_window():
    return init_params(jax.random.PRNGKey(0), CFG_WINDOW)


def test_forward_shapes_and_loss(params):
    tokens = jax.random.randint(jax.random.PRNGKey(1), (2, 128), 0, 256)
    logits = forward(params, tokens, CFG)
    assert logits.shape == (2, 128, 256)
    loss = loss_fn(params, tokens, CFG)
    assert np.isfinite(float(loss))
    # Untrained model ~ uniform: loss near log(vocab).
    assert abs(float(loss) - np.log(256)) < 1.0


def test_train_step_reduces_loss(params):
    tokens = jnp.tile(jnp.arange(128)[None, :] % 7, (2, 1))
    p = params
    l0 = float(loss_fn(p, tokens, CFG))
    for _ in range(10):
        p, loss = sgd_train_step(p, tokens, CFG, lr=0.05)
    l1 = float(loss_fn(p, tokens, CFG))
    assert l1 < l0


def test_decode_matches_forward(params):
    """Prefill + stepwise decode == teacher-forced forward logits."""
    prompt_len = 100
    total = 110
    tokens = jax.random.randint(jax.random.PRNGKey(2), (total,), 0, 256)

    # Teacher-forced: logits for positions 0..total-1.
    full_logits = forward(params, tokens[None, :], CFG, remat=False)[0]

    cache = init_cache(CFG.n_layers, 2, CFG.n_kv_heads, 256, CFG.head_dim, CFG.dtype)
    padded = jnp.zeros((128,), jnp.int32).at[:prompt_len].set(tokens[:prompt_len])
    logits, cache = prefill_slot(
        params, CFG, cache, padded, jnp.int32(prompt_len), 0
    )
    np.testing.assert_allclose(
        np.asarray(logits),
        np.asarray(full_logits[prompt_len - 1]),
        atol=2e-2,
        rtol=1e-2,
    )

    # Feed the true continuation tokens one at a time through decode_step.
    active = jnp.array([True, False])
    for t in range(prompt_len, total):
        step_tokens = jnp.array([int(tokens[t]), 0], jnp.int32)
        step_logits, cache = decode_step(params, CFG, cache, step_tokens, active)
        np.testing.assert_allclose(
            np.asarray(step_logits[0]),
            np.asarray(full_logits[t]),
            atol=2e-2,
            rtol=1e-2,
        )
    assert int(cache.lengths[0]) == total
    assert int(cache.lengths[1]) == 0


def test_engine_continuous_batching(params):
    eng = DecodeEngine(params, CFG, max_batch=2, max_len=256, eos_id=-1)
    for uid in range(4):  # more requests than slots -> queueing + reuse
        eng.submit(
            Request(uid=uid, prompt=[1 + uid, 2, 3], max_new_tokens=5)
        )
    out = eng.run()
    assert sorted(out.keys()) == [0, 1, 2, 3]
    for uid, toks in out.items():
        assert len(toks) == 5
        assert all(0 <= t < 256 for t in toks)


def test_engine_determinism(params):
    def gen():
        eng = DecodeEngine(params, CFG, max_batch=2, max_len=256)
        eng.submit(Request(uid=0, prompt=[5, 6, 7], max_new_tokens=6))
        return eng.run()[0]

    assert gen() == gen()


def test_engine_slot_reuse_isolation(params):
    """A recycled slot must not leak the previous occupant's KV."""
    eng = DecodeEngine(params, CFG, max_batch=1, max_len=256)
    eng.submit(Request(uid=0, prompt=[9, 8, 7, 6, 5], max_new_tokens=4))
    eng.submit(Request(uid=1, prompt=[1, 2, 3], max_new_tokens=4))
    out = eng.run()

    eng2 = DecodeEngine(params, CFG, max_batch=1, max_len=256)
    eng2.submit(Request(uid=1, prompt=[1, 2, 3], max_new_tokens=4))
    out2 = eng2.run()
    assert out[1] == out2[1]


def test_engine_quantized_kv_cache(params):
    """int8-KV engine produces valid tokens and near-dense greedy output."""
    eng_q = DecodeEngine(
        params, CFG, max_batch=2, max_len=256, kv_quant="int8"
    )
    for uid in range(3):
        eng_q.submit(
            Request(uid=uid, prompt=[1 + uid, 2, 3], max_new_tokens=5)
        )
    out_q = eng_q.run()
    assert sorted(out_q.keys()) == [0, 1, 2]
    for toks in out_q.values():
        assert len(toks) == 5 and all(0 <= t < 256 for t in toks)

    # Greedy decode usually survives 8-bit KV: require most tokens equal.
    eng_d = DecodeEngine(params, CFG, max_batch=2, max_len=256)
    for uid in range(3):
        eng_d.submit(
            Request(uid=uid, prompt=[1 + uid, 2, 3], max_new_tokens=5)
        )
    out_d = eng_d.run()
    same = sum(
        t1 == t2
        for uid in out_d
        for t1, t2 in zip(out_d[uid], out_q[uid])
    )
    assert same >= 10  # of 15


def test_quant_cache_prefill_decode_consistency(params):
    """Quant-cache decode tracks the dense-cache decode logits closely."""
    from flash_attention_metal_tpu.runtime import decode_step
    from flash_attention_metal_tpu.runtime.kv_cache import init_quant_cache
    from flash_attention_metal_tpu.runtime import prefill_slot

    prompt = jnp.asarray([3, 1, 4, 1, 5, 9, 2, 6] * 4, jnp.int32)
    padded = jnp.pad(prompt, (0, 128 - prompt.shape[0]))

    dense = init_cache(
        CFG.n_layers, 1, CFG.n_kv_heads, 256, CFG.head_dim, dtype=CFG.dtype
    )
    quant = init_quant_cache(
        CFG.n_layers, 1, CFG.n_kv_heads, 256, CFG.head_dim
    )
    lg_d, dense = prefill_slot(
        params, CFG, dense, padded, jnp.int32(prompt.shape[0]), 0
    )
    lg_q, quant = prefill_slot(
        params, CFG, quant, padded, jnp.int32(prompt.shape[0]), 0
    )
    # Same argmax and close logits through an entire prefill.
    assert int(jnp.argmax(lg_d)) == int(jnp.argmax(lg_q))
    rel = float(
        jnp.max(jnp.abs(lg_d - lg_q)) / (jnp.max(jnp.abs(lg_d)) + 1e-6)
    )
    assert rel < 0.15


def test_windowed_model_decode_matches_forward(params_window):
    """Sliding-window model: decode == teacher-forced forward."""
    from flash_attention_metal_tpu.models import forward

    cfg = CFG_WINDOW
    tokens = jax.random.randint(jax.random.PRNGKey(3), (1, 64), 0, 256)
    logits_fwd = forward(params_window, tokens, cfg=cfg)

    cache = init_cache(
        cfg.n_layers, 1, cfg.n_kv_heads, 256, cfg.head_dim, dtype=cfg.dtype
    )
    padded = jnp.pad(tokens[0], (0, 128 - tokens.shape[1]))
    lg, cache = prefill_slot(
        params_window, cfg, cache, padded, jnp.int32(tokens.shape[1]), 0
    )
    np.testing.assert_allclose(
        np.asarray(lg),
        np.asarray(logits_fwd[0, -1]),
        atol=2e-2,
        rtol=2e-2,
    )


def test_engine_snapshot_restart_resumes_identically(params):
    """Crash-restart from a KV snapshot continues the exact generation."""
    def submit_all(eng):
        for uid in range(3):
            eng.submit(
                Request(uid=uid, prompt=[1 + uid, 2, 3], max_new_tokens=8)
            )

    # Uninterrupted run.
    ref = DecodeEngine(params, CFG, max_batch=2, max_len=256)
    submit_all(ref)
    want = ref.run()

    # Interrupted run: snapshot mid-flight, "crash", restore, finish.
    eng = DecodeEngine(params, CFG, max_batch=2, max_len=256)
    submit_all(eng)
    for _ in range(4):
        eng.step()
    snap = eng.snapshot()
    finished_before = {uid: r.generated for uid, r in eng.finished.items()}
    del eng

    # Round-trip the snapshot through the checkpoint layer (disk).
    import tempfile, os
    from flash_attention_metal_tpu.utils.checkpoint import (
        restore_pytree,
        save_pytree,
    )

    with tempfile.TemporaryDirectory() as td:
        path = os.path.join(td, "serving_snap")
        save_pytree(path, snap)
        snap = restore_pytree(path, like=snap)

    eng2 = DecodeEngine(params, CFG, max_batch=2, max_len=256)
    eng2.restore(snap)
    eng2.finished = {}
    got = eng2.run()
    got.update(finished_before)
    assert got == want


def test_trainer_loss_decreases_and_resumes():
    """AdamW trainer converges; checkpoint/resume is bit-exact."""
    import itertools
    import os
    import tempfile

    from flash_attention_metal_tpu.models.trainer import (
        Trainer,
        make_optimizer,
        synthetic_batches,
    )

    opt = make_optimizer(peak_lr=1e-2, warmup_steps=2, total_steps=40)
    tr = Trainer(CFG, optimizer=opt, seed=0)
    batches = synthetic_batches(CFG, batch=2, seq=128, seed=1)
    out = tr.train(batches, steps=10)
    assert out["final_step"] == 10
    assert out["losses"][-1] < out["losses"][0]

    with tempfile.TemporaryDirectory() as td:
        path = os.path.join(td, "ckpt")
        tr.save(path)
        # Continue the original 3 more steps.
        cont = tr.train(synthetic_batches(CFG, 2, 128, seed=2), steps=3)

        # Fresh trainer resumed from the checkpoint: identical trajectory.
        tr2 = Trainer(CFG, optimizer=opt, seed=123)
        tr2.load(path)
        assert int(tr2.state.step) == 10
        cont2 = tr2.train(synthetic_batches(CFG, 2, 128, seed=2), steps=3)
        np.testing.assert_array_equal(
            np.asarray(cont["losses"]), np.asarray(cont2["losses"])
        )


def test_rolling_window_cache_matches_dense(params_window):
    """O(window) rolling cache decodes identically to the dense cache."""
    cfg = CFG_WINDOW  # attn_window=32 -> rolling capacity 256

    def run(rolling):
        eng = DecodeEngine(
            params_window, cfg, max_batch=2, max_len=256, rolling=rolling
        )
        for uid in range(2):
            eng.submit(
                Request(
                    uid=uid, prompt=[1 + uid, 5, 9, 2], max_new_tokens=24
                )
            )
        return eng.run()

    dense = run(False)
    rolled = run(True)
    assert dense == rolled
    # And the rolling cache really is capacity-bound.
    eng = DecodeEngine(
        params_window, cfg, max_batch=1, max_len=256, rolling=True
    )
    assert eng.cache.capacity == 256


def test_rolling_cache_wraps_past_capacity(params_window):
    """Generation beyond capacity wraps and keeps decoding greedily.

    With window=32 and capacity 256, positions wrap only in longer runs;
    this exercises the position-map write/evict path at modest length and
    checks tokens stay valid and deterministic.
    """
    cfg = CFG_WINDOW

    def gen():
        eng = DecodeEngine(
            params_window, cfg, max_batch=1, max_len=256, rolling=True
        )
        eng.submit(Request(uid=0, prompt=[7, 3, 1], max_new_tokens=40))
        return eng.run()[0]

    out = gen()
    assert len(out) == 40 and all(0 <= t < 256 for t in out)
    assert gen() == out


def test_chunked_prefill_matches_single_shot(params):
    """Chunked prefill produces the same logits and cache as one shot."""
    prompt = jnp.asarray(list(range(3, 200, 2)), jnp.int32)  # 99 tokens
    padded = jnp.pad(prompt, (0, 256 - prompt.shape[0]))

    c1 = init_cache(CFG.n_layers, 1, CFG.n_kv_heads, 256, CFG.head_dim,
                    dtype=CFG.dtype)
    lg1, c1 = prefill_slot(
        params, CFG, c1, padded, jnp.int32(prompt.shape[0]), 0
    )
    c2 = init_cache(CFG.n_layers, 1, CFG.n_kv_heads, 256, CFG.head_dim,
                    dtype=CFG.dtype)
    lg2, c2 = prefill_slot(
        params, CFG, c2, padded, jnp.int32(prompt.shape[0]), 0, chunk=128
    )
    np.testing.assert_allclose(
        np.asarray(lg1), np.asarray(lg2), atol=1e-4, rtol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(c1.k), np.asarray(c2.k), atol=1e-5
    )
    assert int(c1.lengths[0]) == int(c2.lengths[0]) == prompt.shape[0]


def test_rolling_long_prompt_via_chunked_prefill(params_window):
    """A prompt longer than the rolling capacity prefills in chunks."""
    cfg = CFG_WINDOW  # window 32 -> capacity 256; prompt 300 > capacity
    eng = DecodeEngine(
        params_window, cfg, max_batch=1, max_len=512, rolling=True
    )
    rngp = np.random.default_rng(0)
    prompt = rngp.integers(1, 256, 300).tolist()
    eng.submit(Request(uid=0, prompt=prompt, max_new_tokens=8))
    out = eng.run()[0]
    assert len(out) == 8 and all(0 <= t < 256 for t in out)

    # Cross-check against the dense windowed cache (ground truth).
    eng2 = DecodeEngine(params_window, cfg, max_batch=1, max_len=512)
    eng2.submit(Request(uid=0, prompt=prompt, max_new_tokens=8))
    assert eng2.run()[0] == out


def test_engine_sharded_over_mesh_matches_single_device(params):
    """SPMD serving: slot pool sharded over a dp mesh == single-device."""
    from flash_attention_metal_tpu.parallel import make_mesh

    def run(mesh):
        eng = DecodeEngine(
            params, CFG, max_batch=4, max_len=256, mesh=mesh
        )
        for uid in range(6):  # queueing + slot reuse across devices
            eng.submit(
                Request(uid=uid, prompt=[1 + uid, 2, 3], max_new_tokens=6)
            )
        return eng.run()

    single = run(None)
    mesh = make_mesh((4, 1, 1), devices=jax.devices()[:4])  # 4-way dp
    sharded = run(mesh)
    assert single == sharded


def test_rolling_quant_cache(params_window):
    """8-bit rolling cache: valid, deterministic, near the dense-quant run."""
    cfg = CFG_WINDOW

    def run(rolling):
        eng = DecodeEngine(
            params_window, cfg, max_batch=1, max_len=256,
            kv_quant="int8", rolling=rolling,
        )
        eng.submit(Request(uid=0, prompt=[4, 7, 2, 9], max_new_tokens=16))
        return eng.run()[0]

    rolled = run(True)
    dense = run(False)
    assert len(rolled) == 16 and all(0 <= t < 256 for t in rolled)
    assert run(True) == rolled  # deterministic
    # int8 greedy trajectories may diverge after a tie; require a common
    # prefix with the dense-quant windowed run.
    common = sum(1 for a, b in zip(rolled, dense) if a == b)
    assert common >= 8, (rolled, dense)


def test_sinks_model_rolling_matches_dense():
    """Sliding-window+sinks model: rolling cache == dense cache decode."""
    cfg = ModelConfig(
        vocab_size=256,
        d_model=128,
        n_layers=2,
        n_heads=4,
        n_kv_heads=2,
        head_dim=64,
        d_ff=256,
        max_seq_len=256,
        dtype=jnp.float32,
        attn_window=32,
        attn_sinks=4,
    )
    params_s = init_params(jax.random.PRNGKey(2), cfg)

    def run(rolling):
        eng = DecodeEngine(
            params_s, cfg, max_batch=1, max_len=256, rolling=rolling
        )
        eng.submit(Request(uid=0, prompt=[3, 1, 4, 1, 5], max_new_tokens=20))
        return eng.run()[0]

    assert run(True) == run(False)


def test_sinks_rolling_quant_cache():
    """Sinks + 8-bit rolling cache decode (valid, deterministic)."""
    cfg = ModelConfig(
        vocab_size=256,
        d_model=128,
        n_layers=2,
        n_heads=4,
        n_kv_heads=2,
        head_dim=64,
        d_ff=256,
        max_seq_len=256,
        dtype=jnp.float32,
        attn_window=32,
        attn_sinks=4,
    )
    params_s = init_params(jax.random.PRNGKey(2), cfg)

    def gen():
        eng = DecodeEngine(
            params_s, cfg, max_batch=1, max_len=256,
            rolling=True, kv_quant="int8",
        )
        eng.submit(Request(uid=0, prompt=[3, 1, 4], max_new_tokens=12))
        return eng.run()[0]

    out = gen()
    assert len(out) == 12 and all(0 <= t < 256 for t in out)
    assert gen() == out


def test_encoder_padding_invariance():
    """FlashEncoder: pad tokens must not influence real-token outputs."""
    from flash_attention_metal_tpu.models.encoder import (
        EncoderConfig,
        encode,
        init_params as enc_init,
        mean_pool,
    )

    cfg = EncoderConfig(
        vocab_size=256, d_model=128, n_layers=2, n_heads=4, n_kv_heads=4,
        head_dim=64, d_ff=256, max_seq_len=256, dtype=jnp.float32,
    )
    params = enc_init(jax.random.PRNGKey(0), cfg)
    toks = jax.random.randint(jax.random.PRNGKey(1), (1, 128), 1, 256)
    # Same real content, different pad garbage beyond length 100.
    mask = (jnp.arange(128) < 100).astype(jnp.int32)[None]
    t1 = jnp.where(mask == 1, toks, 7)
    t2 = jnp.where(mask == 1, toks, 201)
    h1 = encode(params, t1, mask, cfg=cfg)
    h2 = encode(params, t2, mask, cfg=cfg)
    d = float(jnp.max(jnp.abs((h1 - h2)[:, :100])))
    assert d < 1e-5, d
    e1, e2 = mean_pool(h1, mask[0:1]), mean_pool(h2, mask[0:1])
    assert float(jnp.max(jnp.abs(e1 - e2))) < 1e-5


def test_encoder_mlm_trains():
    """MLM loss decreases under SGD on a tiny corpus."""
    from flash_attention_metal_tpu.models.encoder import (
        EncoderConfig,
        init_params as enc_init,
        mlm_loss,
    )

    cfg = EncoderConfig(
        vocab_size=256, d_model=128, n_layers=2, n_heads=4, n_kv_heads=4,
        head_dim=64, d_ff=256, max_seq_len=256, dtype=jnp.float32,
    )
    params = enc_init(jax.random.PRNGKey(0), cfg)
    labels = jax.random.randint(jax.random.PRNGKey(1), (2, 128), 1, 250)
    lm = (jax.random.uniform(jax.random.PRNGKey(2), (2, 128)) < 0.15).astype(
        jnp.int32
    )
    tokens = jnp.where(lm == 1, 255, labels)  # 255 = [MASK]

    @jax.jit
    def step(p):
        loss, g = jax.value_and_grad(
            lambda pp: mlm_loss(pp, tokens, labels, lm, cfg=cfg)
        )(p)
        return jax.tree_util.tree_map(lambda a, b: a - 0.5 * b, p, g), loss

    losses = []
    for _ in range(6):
        params, loss = step(params)
        losses.append(float(loss))
    assert losses[-1] < losses[0]


# ---------------------------------------------------------------------------
# Score-transform model variants: Gemma-2-style softcap and ALiBi-position
# models must decode exactly like their teacher-forced forward.
# ---------------------------------------------------------------------------

CFG_TRANSFORM = ModelConfig(
    vocab_size=256,
    d_model=128,
    n_layers=2,
    n_heads=4,
    n_kv_heads=2,
    head_dim=64,
    d_ff=256,
    max_seq_len=256,
    dtype=jnp.float32,
    attn_softcap=30.0,
    attn_alibi=True,
)


def _decode_vs_forward(cfg):
    params = init_params(jax.random.PRNGKey(0), cfg)
    prompt_len, total = 100, 106
    tokens = jax.random.randint(jax.random.PRNGKey(2), (total,), 0, 256)
    full_logits = forward(params, tokens[None, :], cfg, remat=False)[0]

    cache = init_cache(
        cfg.n_layers, 2, cfg.n_kv_heads, 256, cfg.head_dim, cfg.dtype
    )
    padded = (
        jnp.zeros((128,), jnp.int32).at[:prompt_len].set(tokens[:prompt_len])
    )
    logits, cache = prefill_slot(
        params, cfg, cache, padded, jnp.int32(prompt_len), 0
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
            params, cfg, cache, step_tokens, active
        )
        np.testing.assert_allclose(
            np.asarray(step_logits[0]),
            np.asarray(full_logits[t]),
            atol=2e-2,
            rtol=1e-2,
        )


def test_softcap_alibi_model_decode_matches_forward():
    """ALiBi+softcap model: stepwise decode == teacher-forced forward."""
    _decode_vs_forward(CFG_TRANSFORM)


def test_softcap_alibi_model_trains():
    """Gradients flow through the in-kernel transforms (oracle-VJP path)."""
    params = init_params(jax.random.PRNGKey(0), CFG_TRANSFORM)
    tokens = jnp.tile(jnp.arange(128)[None, :] % 7, (2, 1))
    l0 = float(loss_fn(params, tokens, CFG_TRANSFORM))
    p = params
    for _ in range(5):
        p, _ = sgd_train_step(p, tokens, CFG_TRANSFORM, lr=0.05)
    l1 = float(loss_fn(p, tokens, CFG_TRANSFORM))
    assert np.isfinite(l1) and l1 < l0


def test_alibi_extrapolates_past_train_length():
    """ALiBi's selling point: a model runs at lengths beyond max_seq_len
    with no positional table to exhaust (RoPE-free path)."""
    cfg = CFG_TRANSFORM
    params = init_params(jax.random.PRNGKey(0), cfg)
    tokens = jax.random.randint(
        jax.random.PRNGKey(3), (1, 2 * cfg.max_seq_len), 0, 256
    )
    logits = forward(params, tokens, cfg, remat=False)
    assert np.all(np.isfinite(np.asarray(logits)))


def test_transform_rolling_matches_dense_windowed():
    """softcap+ALiBi on a rolling (wrapped) cache == the dense windowed
    cache: ALiBi distance and the window both run in position space, so
    slot wrapping must not change the scores."""
    cfg = dataclasses.replace(
        CFG_WINDOW, attn_softcap=25.0, attn_alibi=True
    )
    params = init_params(jax.random.PRNGKey(0), cfg)

    def run(rolling):
        eng = DecodeEngine(
            params, cfg, max_batch=2, max_len=256, rolling=rolling
        )
        for uid in range(2):
            eng.submit(
                Request(uid=uid, prompt=[1 + uid, 5, 9, 2], max_new_tokens=24)
            )
        return eng.run()

    assert run(False) == run(True)


def test_transform_rolling_quant_cache():
    """softcap+ALiBi through the 8-bit rolling cache: valid,
    deterministic, shares a prefix with the dense-quant windowed run."""
    cfg = dataclasses.replace(
        CFG_WINDOW, attn_softcap=25.0, attn_alibi=True
    )
    params = init_params(jax.random.PRNGKey(0), cfg)

    def run(rolling):
        eng = DecodeEngine(
            params, cfg, max_batch=1, max_len=256,
            kv_quant="int8", rolling=rolling,
        )
        eng.submit(Request(uid=0, prompt=[4, 7, 2, 9], max_new_tokens=16))
        return eng.run()[0]

    rolled = run(True)
    dense = run(False)
    assert len(rolled) == 16 and all(0 <= t < 256 for t in rolled)
    assert run(True) == rolled
    common = sum(1 for a, b in zip(rolled, dense) if a == b)
    assert common >= 8, (rolled, dense)


def test_encoder_dropout_train_eval():
    """Encoder attention dropout: eval deterministic, train key-dependent,
    grads finite through the dropout path."""
    from flash_attention_metal_tpu.models.encoder import (
        EncoderConfig,
        encode,
        init_params as enc_init,
        mlm_loss,
    )

    cfg = EncoderConfig(
        vocab_size=256, d_model=128, n_layers=2, n_heads=2, n_kv_heads=2,
        head_dim=64, d_ff=256, max_seq_len=256, dtype=jnp.float32,
        attn_dropout=0.3,
    )
    params = enc_init(jax.random.PRNGKey(0), cfg)
    toks = jax.random.randint(jax.random.PRNGKey(1), (2, 128), 1, 256)
    a = encode(params, toks, cfg=cfg)
    b = encode(params, toks, cfg=cfg)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    c = encode(params, toks, cfg=cfg, dropout_key=jax.random.PRNGKey(2))
    d = encode(params, toks, cfg=cfg, dropout_key=jax.random.PRNGKey(3))
    assert float(jnp.max(jnp.abs(a - c))) > 0
    assert float(jnp.max(jnp.abs(c - d))) > 0

    labels = toks
    loss_mask = jnp.ones_like(toks)
    g = jax.grad(
        lambda p: mlm_loss(
            p, toks, labels, loss_mask, cfg=cfg,
            dropout_key=jax.random.PRNGKey(4),
        )
    )(params)
    gn = jax.tree_util.tree_reduce(
        lambda s, x: s + float(jnp.sum(jnp.abs(x))), g, 0.0
    )
    assert np.isfinite(gn) and gn > 0
