"""Per-token logprob reporting tests.

The engine's reported logprobs must equal the teacher-forced
log-softmax of the emitted sequence (raw model distribution,
pre-temperature/pre-penalty), on both the single-step and the
multi-step (scanned) paths.
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
PROMPT = [5, 9, 2]


def _check_logprobs(params, req):
    toks = jnp.asarray([PROMPT + req.generated], jnp.int32)
    logits = forward(params, toks, CFG)
    logp = jax.nn.log_softmax(logits, axis=-1)
    assert len(req.logprobs) == len(req.generated)
    for t, (tok, lp) in enumerate(zip(req.generated, req.logprobs)):
        want = float(logp[0, len(PROMPT) - 1 + t, tok])
        np.testing.assert_allclose(lp, want, atol=1e-4), t


def _run(params, **kw):
    eng = DecodeEngine(params, CFG, max_batch=2, max_len=256, **kw)
    req = Request(uid=0, prompt=PROMPT, max_new_tokens=8)
    eng.submit(req)
    eng.run()
    return req


def test_logprobs_match_teacher_forced():
    params = init_params(jax.random.PRNGKey(0), CFG)
    _check_logprobs(params, _run(params))


def test_logprobs_multi_step():
    params = init_params(jax.random.PRNGKey(0), CFG)
    req = _run(params, multi_step=4)
    _check_logprobs(params, req)


def test_logprobs_with_penalties_report_raw_distribution():
    params = init_params(jax.random.PRNGKey(0), CFG)
    eng = DecodeEngine(params, CFG, max_batch=1, max_len=256)
    req = Request(
        uid=0, prompt=PROMPT, max_new_tokens=6, presence_penalty=2.0
    )
    eng.submit(req)
    eng.run()
    # Penalties change WHICH token is emitted, but the reported logprob
    # is still the raw model probability of that token.
    _check_logprobs(params, req)
