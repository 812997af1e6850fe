"""FlashSeq2Seq (encoder-decoder) tests.

Core invariants: incremental greedy decode reproduces the teacher-forced
decoder token-for-token (cached cross-K/V + self-KV path == full
forward); source padding is provably inert; training lowers the loss.
"""

import numpy as np
import jax
import jax.numpy as jnp

from flash_attention_metal_tpu.models import seq2seq as s2s

CFG = s2s.Seq2SeqConfig(
    vocab_size=128,
    d_model=128,
    enc_layers=2,
    dec_layers=2,
    n_heads=2,
    n_kv_heads=2,
    head_dim=64,
    d_ff=128,
    max_src_len=128,
    max_tgt_len=128,
    dtype=jnp.float32,
)
SRC = [5, 9, 2, 44, 17]


def _params(seed=0):
    return s2s.init_params(jax.random.PRNGKey(seed), CFG)


def test_greedy_matches_teacher_forced():
    params = _params()
    out = s2s.greedy_generate(
        params, CFG, SRC, bos_id=1, max_new_tokens=8
    )
    assert len(out) == 8

    # Teacher-forced re-scoring of [bos] + out must reproduce the chain.
    s_pad = 128
    src = jnp.zeros((1, s_pad), jnp.int32).at[0, : len(SRC)].set(
        jnp.asarray(SRC)
    )
    src_mask = (jnp.arange(s_pad) < len(SRC)).astype(jnp.int32)[None]
    tgt = jnp.asarray([[1] + out], jnp.int32)
    logits = s2s.forward(params, src, tgt, CFG, src_mask)
    for t in range(8):
        assert int(jnp.argmax(logits[0, t])) == out[t], t


def test_source_padding_is_inert():
    params = _params()
    logits = {}
    for s_pad in (128, 256):
        src = jnp.zeros((1, s_pad), jnp.int32).at[0, : len(SRC)].set(
            jnp.asarray(SRC)
        )
        mask = (jnp.arange(s_pad) < len(SRC)).astype(jnp.int32)[None]
        tgt = jnp.asarray([[1, 7, 3, 9]], jnp.int32)
        logits[s_pad] = np.asarray(s2s.forward(params, src, tgt, CFG, mask))
    np.testing.assert_allclose(logits[128], logits[256], atol=1e-5)


def test_training_reduces_loss():
    import optax

    params = _params()
    src = jax.random.randint(jax.random.PRNGKey(1), (4, 128), 0, 128)
    tgt = jax.random.randint(jax.random.PRNGKey(2), (4, 64), 0, 128)
    opt = optax.adam(3e-3)
    opt_state = opt.init(params)

    @jax.jit
    def step(params, opt_state):
        loss, grads = jax.value_and_grad(s2s.loss_fn)(params, src, tgt, CFG)
        updates, opt_state = opt.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    losses = []
    for _ in range(6):
        params, opt_state, loss = step(params, opt_state)
        losses.append(float(loss))
    assert losses[-1] < losses[0] - 0.3, losses
    assert np.isfinite(losses[-1])


def test_masked_target_loss():
    params = _params()
    src = jax.random.randint(jax.random.PRNGKey(1), (2, 128), 0, 128)
    tgt = jax.random.randint(jax.random.PRNGKey(2), (2, 64), 0, 128)
    full = float(s2s.loss_fn(params, src, tgt, CFG))
    all_ones = jnp.ones_like(tgt)
    np.testing.assert_allclose(
        float(s2s.loss_fn(params, src, tgt, CFG, tgt_mask=all_ones)),
        full,
        rtol=1e-6,
    )
    # Masking out half the targets changes the value (and stays finite).
    half = all_ones.at[:, 32:].set(0)
    masked = float(s2s.loss_fn(params, src, tgt, CFG, tgt_mask=half))
    assert np.isfinite(masked) and masked != full


def test_beam_width1_equals_greedy():
    params = _params()
    greedy = s2s.greedy_generate(
        params, CFG, SRC, bos_id=1, max_new_tokens=8
    )
    seq, score = s2s.beam_generate(
        params, CFG, SRC, beam_width=1, bos_id=1, max_new_tokens=8
    )
    assert seq == greedy
    assert np.isfinite(score)


def test_beam_scores_match_teacher_forced():
    params = _params()
    beams = s2s.beam_generate(
        params, CFG, SRC, beam_width=3, bos_id=1, max_new_tokens=5,
        return_all=True,
    )
    s_pad = 128
    src = jnp.zeros((1, s_pad), jnp.int32).at[0, : len(SRC)].set(
        jnp.asarray(SRC)
    )
    mask = (jnp.arange(s_pad) < len(SRC)).astype(jnp.int32)[None]
    assert len({tuple(s) for s, _ in beams}) == 3
    for seq, score in beams:
        tgt = jnp.asarray([[1] + seq], jnp.int32)
        logits = s2s.forward(params, src, tgt, CFG, mask)
        logp = jax.nn.log_softmax(logits, axis=-1)
        want = sum(
            float(logp[0, t, tok]) for t, tok in enumerate(seq)
        )
        np.testing.assert_allclose(score, want, atol=1e-3)
