"""Speculative decoding: greedy spec output == target greedy output.

The load-bearing property (Leviathan et al.): the draft model changes
how many target forwards a generation takes, NEVER the generated tokens
(greedy) / their distribution (sampling).  These tests pin the greedy
equality token-for-token against a plain decode_step loop, across draft
quality extremes (draft == target -> all-accept; independently random
draft -> mostly-reject) and gamma values.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from flash_attention_metal_tpu.models import ModelConfig, init_params
from flash_attention_metal_tpu.runtime import (
    decode_step,
    init_cache,
    prefill_slot,
    speculative_generate,
)

CFG_T = ModelConfig(
    vocab_size=256,
    d_model=128,
    n_layers=2,
    n_heads=4,
    n_kv_heads=2,
    head_dim=64,
    d_ff=256,
    max_seq_len=512,
    dtype=jnp.float32,
)
CFG_D = ModelConfig(
    vocab_size=256,
    d_model=128,
    n_layers=1,
    n_heads=2,
    n_kv_heads=1,
    head_dim=64,
    d_ff=128,
    max_seq_len=512,
    dtype=jnp.float32,
)


@pytest.fixture(scope="module")
def params_t():
    return init_params(jax.random.PRNGKey(0), CFG_T)


@pytest.fixture(scope="module")
def params_d():
    return init_params(jax.random.PRNGKey(1), CFG_D)


def greedy_reference(params, cfg, prompts, max_new):
    """Plain one-token-at-a-time greedy decode via decode_step."""
    batch = len(prompts)
    n_pad = -(-max(len(p) for p in prompts) // 128) * 128
    max_len = -(-(n_pad + max_new + 16) // 128) * 128
    cache = init_cache(
        cfg.n_layers, batch, cfg.n_kv_heads, max_len, cfg.head_dim, cfg.dtype
    )
    out = []
    for b, p in enumerate(prompts):
        toks = jnp.asarray(list(p) + [0] * (n_pad - len(p)), jnp.int32)
        logits, cache = prefill_slot(
            params, cfg, cache, toks, jnp.int32(len(p)), b
        )
        out.append([int(jnp.argmax(logits))])
    tok = jnp.asarray([o[0] for o in out], jnp.int32)
    active = jnp.ones((batch,), bool)
    for _ in range(max_new - 1):
        logits, cache = decode_step(params, cfg, cache, tok, active)
        tok = jnp.argmax(logits, -1).astype(jnp.int32)
        for b in range(batch):
            out[b].append(int(tok[b]))
    return out


PROMPTS = [[5, 9, 2, 77, 31], [100, 3], [42] * 17]


@pytest.mark.parametrize("gamma", [1, 3, 4])
def test_greedy_equals_plain_decode(params_t, params_d, gamma):
    want = greedy_reference(params_t, CFG_T, PROMPTS, 24)
    got = speculative_generate(
        params_t, CFG_T, params_d, CFG_D, PROMPTS, 24, gamma=gamma
    )
    assert got == want


def test_draft_equals_target_all_accept(params_t):
    """Perfect draft: still exactly the greedy sequence (and the
    all-accept path — bonus after gamma accepted — is exercised)."""
    want = greedy_reference(params_t, CFG_T, PROMPTS, 20)
    got = speculative_generate(
        params_t, CFG_T, params_t, CFG_T, PROMPTS, 20, gamma=4
    )
    assert got == want


def test_sampling_smoke(params_t, params_d):
    out = speculative_generate(
        params_t, CFG_T, params_d, CFG_D, PROMPTS, 16,
        gamma=3, temperature=0.8, seed=3,
    )
    assert [len(o) for o in out] == [16, 16, 16]
    for o in out:
        assert all(0 <= t < CFG_T.vocab_size for t in o)


def test_ragged_lengths_and_exact_count(params_t, params_d):
    """max_new is hit exactly even when a round over-produces."""
    prompts = [[7], [1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11]]
    got = speculative_generate(
        params_t, CFG_T, params_d, CFG_D, prompts, 7, gamma=4
    )
    want = greedy_reference(params_t, CFG_T, prompts, 7)
    assert got == want
    assert [len(g) for g in got] == [7, 7]


# ---------------------------------------------------------------------------
# Engine integration: continuous-batching speculative serving
# ---------------------------------------------------------------------------

from flash_attention_metal_tpu.runtime import DecodeEngine, Request


def _engine_run(params_t, draft=None, temps=(0.0, 0.0, 0.0, 0.0), **kw):
    eng = DecodeEngine(
        params_t, CFG_T, max_batch=2, max_len=512, draft=draft, **kw
    )
    for uid in range(4):  # slot churn: 4 requests over 2 slots
        eng.submit(
            Request(
                uid=uid,
                prompt=[1 + uid, 2, 3, 4 + uid],
                max_new_tokens=9,
                temperature=temps[uid],
            )
        )
    return eng.run()


def test_spec_engine_matches_plain_greedy(params_t, params_d):
    want = _engine_run(params_t)
    got = _engine_run(params_t, draft=(params_d, CFG_D), spec_gamma=3)
    assert got == want


def test_spec_engine_perfect_draft(params_t):
    want = _engine_run(params_t)
    got = _engine_run(params_t, draft=(params_t, CFG_T), spec_gamma=4)
    assert got == want
    # A perfect draft must finish in far fewer dispatches than plain
    # decode: every round emits gamma+1 tokens.
    eng = DecodeEngine(
        params_t, CFG_T, max_batch=2, max_len=512,
        draft=(params_t, CFG_T), spec_gamma=4, harvest_lag=0,
    )
    eng.submit(Request(uid=0, prompt=[5, 6, 7], max_new_tokens=20))
    eng.run()
    assert eng.steps <= 6  # ceil(20/5) rounds vs 20 plain decode steps


def test_spec_engine_mixed_temperatures(params_t, params_d):
    out = _engine_run(
        params_t, draft=(params_d, CFG_D), spec_gamma=3,
        temps=(0.0, 0.9, 0.0, 1.3),
    )
    assert sorted(out.keys()) == [0, 1, 2, 3]
    for uid, toks in out.items():
        assert len(toks) == 9
        assert all(0 <= t < CFG_T.vocab_size for t in toks)
    # Greedy slots still exactly match the target-only engine.
    want = _engine_run(params_t)
    assert out[0] == want[0] and out[2] == want[2]


def test_spec_engine_eos(params_t, params_d):
    """EOS mid-round stops at the same token as the plain engine."""

    def run(draft):
        eng = DecodeEngine(
            params_t, CFG_T, max_batch=1, max_len=512,
            eos_id=11, draft=draft, spec_gamma=3, harvest_lag=2,
        )
        eng.submit(Request(uid=0, prompt=[9, 8, 7], max_new_tokens=40))
        return eng.run()

    assert run((params_d, CFG_D)) == run(None)


def test_spec_engine_topk1_equals_greedy(params_t, params_d):
    """top_k=1 at temperature 1.0 pins both draft proposals and target
    acceptance to the argmax — the speculative engine must emit exactly
    the greedy sequence (a crisp end-to-end check that the filters reach
    the draft sampling, the acceptance p/q, AND the residual resample)."""
    want = _engine_run(params_t)

    def run_topk1():
        eng = DecodeEngine(
            params_t, CFG_T, max_batch=2, max_len=512,
            draft=(params_d, CFG_D), spec_gamma=3,
        )
        for uid in range(4):
            eng.submit(
                Request(
                    uid=uid, prompt=[1 + uid, 2, 3, 4 + uid],
                    max_new_tokens=9, temperature=1.0, top_k=1,
                )
            )
        return eng.run()

    assert run_topk1() == want


def test_spec_engine_topp_smoke(params_t, params_d):
    """Nucleus requests serve through the speculative engine (round 5:
    the submit-time rejection is gone)."""
    eng = DecodeEngine(
        params_t, CFG_T, max_batch=2, max_len=512,
        draft=(params_d, CFG_D), spec_gamma=3,
    )
    for uid, (tk, tp, mp) in enumerate(
        [(5, 1.0, 0.0), (0, 0.8, 0.0), (0, 1.0, 0.1), (0, 0.9, 0.05)]
    ):
        eng.submit(
            Request(
                uid=uid, prompt=[1 + uid, 2, 3], max_new_tokens=8,
                temperature=0.9, top_k=tk, top_p=tp, min_p=mp,
            )
        )
    out = eng.run()
    assert sorted(out.keys()) == [0, 1, 2, 3]
    for toks in out.values():
        assert len(toks) == 8
        assert all(0 <= t < CFG_T.vocab_size for t in toks)


def test_spec_engine_paged_target_cache(params_t, params_d):
    """Speculative serving with a PAGED target cache (round 5): verify
    windows scatter through the page table at arbitrary (non-aligned)
    write heads, page grants advance by the 8-row-padded window per
    round, and the host write-head tracker re-syncs to the true length
    at harvest.  Greedy generations must be token-identical to the
    paged plain engine — exercised with slot churn (6 requests over 2
    slots) so retirement/release and re-admission run too."""

    def run(draft, paged):
        eng = DecodeEngine(
            params_t, CFG_T, max_batch=2, max_len=512, draft=draft,
            spec_gamma=3, paged=paged, harvest_lag=2,
        )
        for uid in range(6):
            eng.submit(
                Request(uid=uid, prompt=[1 + uid, 2, 3], max_new_tokens=9)
            )
        return eng.run()

    want = run(None, False)
    assert run(None, True) == want          # paged plain == dense plain
    assert run((params_d, CFG_D), True) == want  # paged spec == both


def test_spec_engine_int8_target_cache(params_t, params_d):
    """Speculative serving with a QUANTIZED target cache (round 5): the
    O(1) rollback argument is format-independent (appends past lengths
    are invisible and overwritten), so int8 greedy generations must be
    token-identical to the int8 plain engine."""

    def run(draft):
        eng = DecodeEngine(
            params_t, CFG_T, max_batch=2, max_len=512, draft=draft,
            spec_gamma=3, kv_quant="int8",
        )
        for uid in range(3):
            eng.submit(
                Request(uid=uid, prompt=[1 + uid, 2, 3], max_new_tokens=8)
            )
        return eng.run()

    assert run((params_d, CFG_D)) == run(None)


def test_spec_engine_penalties_topk1_matches_plain(params_t, params_d):
    """Presence/frequency penalties compose with speculative serving
    (round 5): with top_k=1 the penalized-filtered distribution is a
    point mass, so the speculative engine must emit exactly the plain
    engine's tokens — penalties applied with per-row window counts on
    both the draft proposals and the target acceptance."""

    def run(draft):
        eng = DecodeEngine(
            params_t, CFG_T, max_batch=2, max_len=512, draft=draft,
            spec_gamma=3,
        )
        for uid in range(3):
            eng.submit(
                Request(
                    uid=uid, prompt=[2 + uid, 3, 4], max_new_tokens=10,
                    temperature=1.0, top_k=1, presence_penalty=4.0,
                    frequency_penalty=0.7,
                )
            )
        return eng.run()

    want = run(None)
    got = run((params_d, CFG_D))
    assert got == want
    # The penalties actually bite: a no-penalty run differs.
    def run_nopen():
        eng = DecodeEngine(params_t, CFG_T, max_batch=2, max_len=512)
        for uid in range(3):
            eng.submit(
                Request(uid=uid, prompt=[2 + uid, 3, 4], max_new_tokens=10,
                        temperature=1.0, top_k=1)
            )
        return eng.run()

    assert run_nopen() != want


def test_acceptance_rule_filtered_distribution():
    """Statistical check of the speculative-sampling rule under top-k/
    top-p: the marginal of the first emitted token must match the
    FILTERED target distribution (what sample_batch would serve), for a
    draft that proposes from its own filtered distribution.  Greedy
    degeneracy is pinned by test_spec_engine_matches_plain_greedy."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from flash_attention_metal_tpu.runtime.decode import filter_scaled_logits
    from flash_attention_metal_tpu.runtime.speculative import acceptance_rule

    vocab, gamma, B, reps = 16, 2, 512, 6
    key = jax.random.PRNGKey(0)
    kq, kt = jax.random.split(key)
    # One fixed (target, draft) logit pair, broadcast over B trial slots.
    t_log = jax.random.normal(kt, (vocab,)) * 1.5
    q_log = t_log + jax.random.normal(kq, (vocab,)) * 1.0
    tau = jnp.ones((B, 1))
    top_ks = jnp.full((B,), 5, jnp.int32)
    top_ps = jnp.full((B,), 0.9, jnp.float32)
    greedy = jnp.zeros((B,), bool)

    q_scaled = jnp.broadcast_to(q_log, (B, vocab))
    q_filt = filter_scaled_logits(q_scaled, top_ks, top_ps, None)

    @jax.jit
    def one_round(k):
        kd, ku, kr, kq2 = jax.random.split(k, 4)
        # Draft proposes gamma tokens i.i.d. from its filtered dist
        # (context-free toy model: logits don't depend on history).
        d = jax.random.categorical(
            kd, jnp.stack([q_filt] * gamma, 1), axis=-1
        ).astype(jnp.int32)
        q_logits = jnp.broadcast_to(q_log, (B, gamma, vocab))
        logits_t = jnp.broadcast_to(t_log, (B, gamma + 1, vocab))
        out, n_acc, bonus = acceptance_rule(
            d, q_logits, logits_t, greedy, tau, ku, kr,
            top_ks, top_ps, None,
        )
        return out[:, 0]

    samples = np.concatenate(
        [np.asarray(one_round(jax.random.PRNGKey(100 + r)))
         for r in range(reps)]
    )
    counts = np.bincount(samples, minlength=vocab)
    emp = counts / counts.sum()
    want = np.asarray(
        jax.nn.softmax(
            filter_scaled_logits(
                t_log[None], top_ks[:1], top_ps[:1], None
            )[0]
        )
    )
    tv = 0.5 * np.abs(emp - want).sum()
    # ~3k samples over <=5 live tokens: TV under correctness ~ 0.01-0.02.
    assert tv < 0.05, (tv, emp, want)
    # Tokens outside the filtered support must never be emitted.
    assert counts[want < 1e-9].sum() == 0
