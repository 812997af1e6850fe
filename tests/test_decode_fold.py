"""GQA decode head-fold tests (``ops.gqa_decode_attention``).

The fold packs each KV head's ``group`` query heads into adjacent rows
(kernel ``pos_div``), reading the KV cache once per KV head instead of
once per q-head — measured 7.7x at group=8, N=32K on the v5e.  These
tests pin exactness vs the unfolded kernel across mask variants.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from flash_attention_metal_tpu.ops.attention import (
    flash_attention,
    gqa_decode_attention,
)
from flash_attention_metal_tpu.reference import make_qkv


def _fixtures(hq, hkv, t, n=1024, b=2):
    q, _, _ = make_qkv(jax.random.PRNGKey(0), (b, hq, t, 64))
    _, k, v = make_qkv(jax.random.PRNGKey(1), (b, hkv, n, 64))
    lengths = jnp.asarray([n // 2 - 3, n - 1][:b], jnp.int32)
    return q, k, v, lengths


@pytest.mark.parametrize("t", [1, 4])
@pytest.mark.parametrize("hq,hkv", [(8, 2), (8, 1), (4, 4)])
def test_fold_matches_unfolded(hq, hkv, t):
    q, k, v, lengths = _fixtures(hq, hkv, t)
    ref = flash_attention(q, k, v, q_offset=lengths, causal=True)
    got = gqa_decode_attention(q, k, v, lengths)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)


def test_fold_window_sinks_softcap():
    q, k, v, lengths = _fixtures(8, 2, 4)
    kw = dict(window=256, sinks=4, softcap=20.0)
    ref = flash_attention(q, k, v, q_offset=lengths, causal=True, **kw)
    got = gqa_decode_attention(q, k, v, lengths, **kw)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)


def test_fold_save_lse():
    q, k, v, lengths = _fixtures(8, 2, 2)
    r_o, r_l = flash_attention(
        q, k, v, q_offset=lengths, causal=True, save_lse=True
    )
    g_o, g_l = gqa_decode_attention(q, k, v, lengths, save_lse=True)
    np.testing.assert_allclose(np.asarray(g_o), np.asarray(r_o), atol=1e-5)
    np.testing.assert_allclose(np.asarray(g_l), np.asarray(r_l), atol=1e-5)


def test_fold_rejects_bad_compositions():
    q, k, v, lengths = _fixtures(8, 2, 1)
    from flash_attention_metal_tpu.kernels.flash_fwd import (
        flash_attention_fwd,
    )

    with pytest.raises((ValueError, NotImplementedError)):
        flash_attention_fwd(
            q.reshape(2, 2, 4, 64), k, v, lengths, causal=False, pos_div=4
        )
    with pytest.raises((ValueError, NotImplementedError)):
        flash_attention_fwd(
            q.reshape(2, 2, 4, 64), k, v, lengths, causal=True, pos_div=4,
            dropout_rate=0.1, dropout_seed=jnp.int32(0),
        )
