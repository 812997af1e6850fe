"""Golden-reference attention oracles (pure JAX, fp32).

These mirror the Metal reference's in-process CPU oracles:

* non-causal forward with two-pass safe softmax  (reference ``main.mm:121-159``)
* causal forward                                 (reference ``main.mm:549-578``)
* full backward via the closed-form gradient     (reference ``main.mm:1087-1195``)

Everything else in the framework — every Pallas kernel, every sharded
variant — is verified against these at the reference's tolerance ladder
(fp32 rungs 1e-3, half rungs 5e-3/1e-2, backward 1e-1; see
``main.mm:239,253,292,375,452,591,1191``).

The oracles are deliberately *simple* jnp code (materialize the full score
matrix, plain softmax) so they are obviously correct; they run on any JAX
backend including CPU.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from ..config import default_scale


def _dropout_probs(
    p_norm: jax.Array, rate: float, seed: jax.Array, n_heads=None
) -> jax.Array:
    """Apply the framework's deterministic attention dropout to the
    normalized probabilities.

    Uses the same counter-based coordinate hash as the Pallas kernels
    (``kernels._common.dropout_keep``), so oracle and kernel produce the
    *identical* mask — dropout is testable to fp tolerance, not just
    statistically.  Requires [B, H, N_q, N_kv] probabilities.

    ``seed`` may be a plain int32 scalar or the packed
    ``[seed, row_off, col_off, b_off, h_off]`` shard-offset vector
    (``kernels._common.pack_dropout_seed``); ``n_heads`` overrides the
    (b, h) stream multiplier for tp-sharded callers (global head count).
    """
    from ..kernels._common import dropout_keep, pack_dropout_seed

    if p_norm.ndim != 4:
        raise ValueError("dropout oracle requires [B, H, N_q, N_kv] scores")
    sv = pack_dropout_seed(seed)
    b, h, n_q, n_kv = p_norm.shape
    mul = h if n_heads is None else n_heads
    bh = (
        (jnp.arange(b)[:, None] + sv[3]) * mul
        + jnp.arange(h)[None, :]
        + sv[4]
    ).reshape(b, h, 1, 1)
    rows = sv[1] + jnp.arange(n_q).reshape(1, 1, n_q, 1)
    cols = sv[2] + jnp.arange(n_kv).reshape(1, 1, 1, n_kv)
    return p_norm * dropout_keep(sv[0], bh, rows, cols, rate)


def _softcap_scores(s: jax.Array, softcap: Optional[float]) -> jax.Array:
    """Tanh logit soft-cap: s -> softcap * tanh(s / softcap)."""
    if softcap is None:
        return s
    return softcap * jnp.tanh(s / softcap)


def _alibi_bias(
    s: jax.Array,
    slopes: jax.Array,
    n_q: int,
    n_kv: int,
    q_offset,
) -> jax.Array:
    """Additive ALiBi bias ``slope_h * (col - (row + q_offset))``.

    ``slopes`` is ``[H]``; bias is <= 0 for causally-visible positions
    (col <= row + q_offset) and grows more negative with distance —
    "Train Short, Test Long" (Press et al.), the linear-bias position
    scheme the reference explicitly scoped out
    (``project_narrative.md:50-53``).
    """
    off = (n_kv - n_q) if q_offset is None else q_offset
    row = jnp.arange(n_q)[:, None] + off
    col = jnp.arange(n_kv)[None, :]
    dist = (col - row).astype(jnp.float32)  # [n_q, n_kv]
    # slopes [H] -> [H, 1, 1] so it broadcasts under [..., H, n_q, n_kv].
    return s + slopes.astype(jnp.float32)[:, None, None] * dist


def attention_reference(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    *,
    causal: bool = False,
    sm_scale: Optional[float] = None,
    q_offset: Optional[jax.Array] = None,
    window: Optional[int] = None,
    segment_ids=None,
    sinks: int = 0,
    softcap: Optional[float] = None,
    alibi_slopes: Optional[jax.Array] = None,
    dropout_rate: float = 0.0,
    dropout_seed: Optional[jax.Array] = None,
    dropout_heads: Optional[int] = None,
) -> jax.Array:
    """O = softmax(Q K^T * scale) V, computed naively in fp32.

    ``window``: with ``causal``, restrict each row to the last ``window``
    visible keys (sliding-window / local attention).

    ``softcap``: tanh logit cap applied to the scaled scores before any
    bias/masking (Gemma-2 style): ``s = softcap * tanh(s / softcap)``.

    ``alibi_slopes``: optional ``[H]`` per-head slopes adding the linear
    position bias ``slope * (col - row - q_offset)`` after the cap.

    Accepts ``[..., N_q, D]`` / ``[..., N_kv, D]`` (leading batch/head dims
    broadcast).  All math in fp32 regardless of input dtype; output cast back
    to the input dtype, matching how the reference compares fp16 kernel
    outputs against its fp32 CPU oracle (``main.mm:351-378``).
    """
    orig_dtype = q.dtype
    if sm_scale is None:
        sm_scale = default_scale(q.shape[-1])
    qf = q.astype(jnp.float32)
    kf = k.astype(jnp.float32)
    vf = v.astype(jnp.float32)

    s = jnp.einsum("...qd,...kd->...qk", qf, kf,
                   precision=jax.lax.Precision.HIGHEST) * sm_scale
    s = _softcap_scores(s, softcap)
    if alibi_slopes is not None:
        s = _alibi_bias(s, alibi_slopes, s.shape[-2], s.shape[-1], q_offset)
    if causal:
        n_q, n_kv = s.shape[-2], s.shape[-1]
        # Align the diagonals at the *end* of the sequences (the usual decode
        # convention) unless an explicit q_offset is given; for n_q == n_kv
        # the default is the standard causal mask.
        off = (n_kv - n_q) if q_offset is None else q_offset
        row = jnp.arange(n_q)[:, None] + off
        col = jnp.arange(n_kv)[None, :]
        s = jnp.where(col <= row, s, -jnp.inf)
        if window is not None:
            keep = col > row - window
            if sinks:
                # Attention sinks (streaming-LLM): the first ``sinks``
                # positions stay visible beyond the window.
                keep |= col < sinks
            s = jnp.where(keep, s, -jnp.inf)
    if segment_ids is not None:
        seg = segment_ids.q[..., :, None] == segment_ids.kv[..., None, :]
        # [B, nq, nkv] -> broadcast over heads.
        s = jnp.where(seg[:, None] if seg.ndim == 3 else seg, s, -jnp.inf)
    # Two-pass safe softmax, exactly the oracle's structure
    # (row max ``main.mm:131-137``, exp/sum ``main.mm:139-147``).
    m = jnp.max(s, axis=-1, keepdims=True)
    m = jnp.where(jnp.isneginf(m), 0.0, m)  # fully-masked rows -> zeros
    p = jnp.exp(s - m)
    l = jnp.sum(p, axis=-1, keepdims=True)
    l = jnp.where(l == 0.0, 1.0, l)
    probs = p / l
    if dropout_rate:
        # Attention-probability dropout (post-normalization, the FA-2
        # convention), with the kernels' exact deterministic mask.
        probs = _dropout_probs(
            probs, dropout_rate, dropout_seed, n_heads=dropout_heads
        )
    o = jnp.einsum("...qk,...kd->...qd", probs, vf,
                   precision=jax.lax.Precision.HIGHEST)
    return o.astype(orig_dtype)


def attention_reference_with_lse(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    *,
    causal: bool = False,
    sm_scale: Optional[float] = None,
    q_offset: Optional[jax.Array] = None,
    window: Optional[int] = None,
    sinks: int = 0,
    segment_ids=None,
    softcap: Optional[float] = None,
    alibi_slopes: Optional[jax.Array] = None,
) -> Tuple[jax.Array, jax.Array]:
    """Forward oracle that also returns the logsumexp L = m + log(l).

    The reference's V4 kernel persists L for the backward pass
    (``kernels.metal:861-864``); this oracle defines the ground truth for it.
    Fully-masked rows yield (o=0, lse=-inf).
    """
    if sm_scale is None:
        sm_scale = default_scale(q.shape[-1])
    qf = q.astype(jnp.float32)
    kf = k.astype(jnp.float32)
    vf = v.astype(jnp.float32)
    s = jnp.einsum("...qd,...kd->...qk", qf, kf,
                   precision=jax.lax.Precision.HIGHEST) * sm_scale
    s = _softcap_scores(s, softcap)
    if alibi_slopes is not None:
        s = _alibi_bias(s, alibi_slopes, s.shape[-2], s.shape[-1], q_offset)
    if causal:
        n_q, n_kv = s.shape[-2], s.shape[-1]
        off = (n_kv - n_q) if q_offset is None else q_offset
        row = jnp.arange(n_q)[:, None] + off
        col = jnp.arange(n_kv)[None, :]
        s = jnp.where(col <= row, s, -jnp.inf)
        if window is not None:
            keep = col > row - window
            if sinks:
                keep |= col < sinks
            s = jnp.where(keep, s, -jnp.inf)
    if segment_ids is not None:
        # Same packed-sequence masking as attention_reference, so the XLA
        # save_lse path stays a consistent oracle for segmented inputs.
        seg = segment_ids.q[..., :, None] == segment_ids.kv[..., None, :]
        s = jnp.where(seg[:, None] if seg.ndim == 3 else seg, s, -jnp.inf)
    m = jnp.max(s, axis=-1, keepdims=True)
    m_safe = jnp.where(jnp.isneginf(m), 0.0, m)
    p = jnp.exp(s - m_safe)
    l = jnp.sum(p, axis=-1, keepdims=True)
    l_safe = jnp.where(l == 0.0, 1.0, l)
    o = jnp.einsum("...qk,...kd->...qd", p / l_safe, vf,
                   precision=jax.lax.Precision.HIGHEST)
    lse = jnp.where(l == 0.0, -jnp.inf, m_safe + jnp.log(l_safe))[..., 0]
    return o.astype(q.dtype), lse


def attention_reference_bwd(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    do: jax.Array,
    *,
    causal: bool = False,
    sm_scale: Optional[float] = None,
    softcap: Optional[float] = None,
    alibi_slopes: Optional[jax.Array] = None,
    dropout_rate: float = 0.0,
    dropout_seed: Optional[jax.Array] = None,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Closed-form (dQ, dK, dV) for the attention forward.

    Matches the reference's hand-derived CPU backward (``main.mm:1087-1195``):
    dV = P^T dO; dP = dO V^T; dS = P * (dP - rowsum(dP * P)) * scale;
    dQ = dS K; dK = dS^T Q — expressed here via ``jax.vjp`` on the fp32
    oracle, which computes exactly that gradient.
    """
    f = lambda q_, k_, v_: attention_reference(
        q_.astype(jnp.float32),
        k_.astype(jnp.float32),
        v_.astype(jnp.float32),
        causal=causal,
        sm_scale=sm_scale,
        softcap=softcap,
        alibi_slopes=alibi_slopes,
        dropout_rate=dropout_rate,
        dropout_seed=dropout_seed,
    )
    _, vjp = jax.vjp(f, q, k, v)
    dq, dk, dv = vjp(do.astype(jnp.float32))
    return dq.astype(q.dtype), dk.astype(k.dtype), dv.astype(v.dtype)


def make_qkv(
    key: jax.Array,
    shape: Tuple[int, ...],
    dtype=jnp.float32,
    minval: float = -1.0,
    maxval: float = 1.0,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Deterministic uniform(-1, 1) test fixtures.

    Mirrors the reference's seeded ``mt19937(42)`` uniform(-1,1) init
    (``main.mm:24-30``); JAX's counter-based PRNG replaces the Mersenne
    twister and is reproducible across hosts and backends.
    """
    kq, kk, kv = jax.random.split(key, 3)
    q = jax.random.uniform(kq, shape, jnp.float32, minval, maxval).astype(dtype)
    k = jax.random.uniform(kk, shape, jnp.float32, minval, maxval).astype(dtype)
    v = jax.random.uniform(kv, shape, jnp.float32, minval, maxval).astype(dtype)
    return q, k, v
