"""min-p sampling and stop-sequence tests."""

import numpy as np
import jax
import jax.numpy as jnp

from flash_attention_metal_tpu.models import ModelConfig, init_params
from flash_attention_metal_tpu.runtime import DecodeEngine, Request
from flash_attention_metal_tpu.runtime.decode import sample_batch

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


def test_min_p_filter_math():
    # Two candidates: p(top) ~ 0.73, p(second) ~ 0.27 (logit gap 1.0).
    v = 16
    logits = jnp.full((2, v), -30.0).at[:, 3].set(2.0).at[:, 7].set(1.0)
    temps = jnp.ones((2,))
    # min_p = 0.5: only the top token survives -> sampling always
    # returns it, for every key.  Slot 1 (min_p off) can return either.
    min_ps = jnp.asarray([0.5, 0.0])
    seen1 = set()
    for i in range(16):
        toks = sample_batch(
            logits, jax.random.PRNGKey(i), temps, None, None,
            None, None, None, min_ps,
        )
        assert int(toks[0]) == 3
        seen1.add(int(toks[1]))
    assert seen1 == {3, 7}, seen1
    # min_p = 0.2: both survive for slot 0 too.
    min_ps = jnp.asarray([0.2, 0.0])
    seen0 = {
        int(sample_batch(
            logits, jax.random.PRNGKey(i), temps, None, None,
            None, None, None, min_ps,
        )[0])
        for i in range(24)
    }
    assert seen0 == {3, 7}, seen0


def test_min_p_through_engine_runs():
    params = init_params(jax.random.PRNGKey(0), CFG)
    eng = DecodeEngine(params, CFG, max_batch=1, max_len=256)
    req = Request(
        uid=0, prompt=PROMPT, max_new_tokens=8, temperature=0.8, min_p=0.9
    )
    eng.submit(req)
    out = eng.run()[0]
    assert len(out) == 8
    # min_p=0.9 at modest temperature is near-greedy: must match the
    # greedy engine (the greedy token always has p >= 0.9 * p_max).
    eng2 = DecodeEngine(params, CFG, max_batch=1, max_len=256)
    eng2.submit(Request(uid=0, prompt=PROMPT, max_new_tokens=8))
    assert out == eng2.run()[0]


def _greedy(params, **req_kw):
    eng = DecodeEngine(params, CFG, max_batch=2, max_len=256)
    req = Request(uid=0, prompt=PROMPT, max_new_tokens=10, **req_kw)
    eng.submit(req)
    eng.run()
    return req


def _first_unique_bigram(seq):
    """First index whose bigram occurs nowhere earlier in the sequence."""
    for i in range(1, len(seq) - 1):
        big = seq[i : i + 2]
        if all(seq[j : j + 2] != big for j in range(i)):
            return i
    raise AssertionError("no unique bigram in fixture")


def test_stop_sequence_truncates():
    params = init_params(jax.random.PRNGKey(0), CFG)
    base = _greedy(params)
    assert len(base.generated) == 10
    # Stop on the first uniquely-occurring bigram: generation must end
    # right before it, with logprobs truncated in lockstep.
    i = _first_unique_bigram(base.generated)
    req = _greedy(params, stop=[base.generated[i : i + 2]])
    assert req.generated == base.generated[:i], (req.generated, i)
    assert len(req.logprobs) == len(req.generated)
    assert req.done
    # A never-occurring stop changes nothing.
    req2 = _greedy(params, stop=[[251, 252, 253]])
    assert req2.generated == base.generated


def test_stop_sequence_multi_step_and_snapshot():
    params = init_params(jax.random.PRNGKey(0), CFG)
    base = _greedy(params)
    i = _first_unique_bigram(base.generated)
    stop = [base.generated[i : i + 2]]
    eng = DecodeEngine(params, CFG, max_batch=1, max_len=256, multi_step=4)
    req = Request(uid=0, prompt=PROMPT, max_new_tokens=10, stop=stop)
    eng.submit(req)
    snap = eng.snapshot()  # queue snapshot round-trips the stop lists
    eng2 = DecodeEngine(params, CFG, max_batch=1, max_len=256, multi_step=4)
    eng2.restore(snap)
    eng2.run()
    got = eng2.finished[0]
    assert got.generated == base.generated[:i], got.generated
