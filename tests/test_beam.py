"""Beam-search decoding tests.

Anchors: width-1 beam == engine greedy; returned scores are exactly the
teacher-forced log-probabilities of the returned sequences; wider beams
never score worse on this fixed fixture; EOS freezes a beam's history.
"""

import numpy as np
import jax
import jax.numpy as jnp

from flash_attention_metal_tpu.models import (
    ModelConfig,
    forward,
    init_params,
)
from flash_attention_metal_tpu.runtime import DecodeEngine, Request
from flash_attention_metal_tpu.runtime.beam import beam_search_generate

CFG = ModelConfig(
    vocab_size=256,
    d_model=128,
    n_layers=2,
    n_heads=2,
    n_kv_heads=2,
    head_dim=64,
    d_ff=128,
    max_seq_len=256,
    dtype=jnp.float32,
)
PROMPT = [7, 3, 11, 2]


def _params(seed=0):
    return init_params(jax.random.PRNGKey(seed), CFG)


def _teacher_forced_logp(params, prompt, cont):
    toks = jnp.asarray([prompt + cont], jnp.int32)
    logits = forward(params, toks, CFG)
    logp = jax.nn.log_softmax(logits, axis=-1)
    total = 0.0
    for t, tok in enumerate(cont):
        total += float(logp[0, len(prompt) - 1 + t, tok])
    return total


def test_beam1_equals_greedy_engine():
    params = _params()
    seq, _ = beam_search_generate(
        params, CFG, PROMPT, beam_width=1, max_new_tokens=10, max_len=256
    )
    eng = DecodeEngine(params, CFG, max_batch=1, max_len=256)
    eng.submit(Request(uid=0, prompt=PROMPT, max_new_tokens=10))
    assert seq == eng.run()[0]


def test_scores_match_teacher_forced():
    params = _params()
    beams = beam_search_generate(
        params, CFG, PROMPT, beam_width=4, max_new_tokens=6, max_len=256,
        return_all=True,
    )
    for seq, score in beams:
        assert len(seq) == 6
        np.testing.assert_allclose(
            score, _teacher_forced_logp(params, PROMPT, seq), atol=1e-4
        )
    # Beams are distinct and sorted best-first.
    assert len({tuple(s) for s, _ in beams}) == 4
    scores = [sc for _, sc in beams]
    assert scores == sorted(scores, reverse=True)


def test_wider_beam_not_worse():
    params = _params()
    out = {}
    for w in (1, 2, 4):
        _, score = beam_search_generate(
            params, CFG, PROMPT, beam_width=w, max_new_tokens=6, max_len=256
        )
        out[w] = score
    assert out[2] >= out[1] - 1e-5
    assert out[4] >= out[2] - 1e-5


def test_eos_freezes_beam():
    params = _params()
    # Find the greedy first token, then rerun declaring it to be EOS:
    # the top beam must terminate immediately with an empty continuation.
    seq, _ = beam_search_generate(
        params, CFG, PROMPT, beam_width=1, max_new_tokens=4, max_len=256
    )
    eos = seq[0]
    seq2, _ = beam_search_generate(
        params, CFG, PROMPT, beam_width=1, max_new_tokens=4, max_len=256,
        eos_id=eos,
    )
    assert seq2 == []
    # With width 2 the second beam continues past a non-EOS first token.
    beams = beam_search_generate(
        params, CFG, PROMPT, beam_width=2, max_new_tokens=4, max_len=256,
        eos_id=eos, return_all=True,
    )
    lens = sorted(len(s) for s, _ in beams)
    assert lens[0] == 0 and lens[1] == 4, beams
