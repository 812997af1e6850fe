"""Public attention API: typed, differentiable, vmappable.

The reference's "API" is a positional Metal buffer ABI — Q/K/V/O at buffer
indices 0-3, scalars via ``setBytes`` at 4-10 (``main.mm:417-432``).  Here
that becomes a typed Python signature with a ``custom_vjp`` wiring the
FA-2 backward kernels (``flash_bwd.py``) to the forward's logsumexp
residual, the way the reference's V4 forward feeds its backward kernel
(``kernels.metal:861-864`` -> ``kernels.metal:993-996``).

Implementations:

* ``impl="pallas"``   — the MXU flash kernel ladder (default on TPU).
* ``impl="xla"``      — pure-jnp fallback (differentiable via autodiff);
                        used on CPU for fast sharding tests and as a
                        cross-check.
* ``impl="auto"``     — pallas on TPU, pallas-interpret elsewhere.

GQA/MQA (fewer KV heads than Q heads) is supported by logical broadcast of
the KV heads.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

from ..config import BlockSizes, default_scale
from ..kernels.flash_bwd import flash_attention_bwd_auto
from ..kernels.flash_fwd import flash_attention_fwd
from ..reference.oracle import attention_reference, attention_reference_with_lse


def _use_interpret() -> bool:
    return jax.default_backend() != "tpu"


@functools.partial(
    jax.custom_vjp, nondiff_argnums=(7, 8, 9, 10, 11, 12, 13, 14, 15, 16, 17)
)
def _flash_core(
    q, k, v, q_offset, alibi_slopes, dropout_seed, segment_ids,
    causal, window, sinks, sm_scale, softcap, dropout_rate, dropout_heads,
    block_sizes, save_lse, lazy_softmax, interpret,
):
    """The one differentiable attention primitive behind the public op.

    Every capability rides a single custom_vjp: causal/window/sinks,
    packed segments, tanh softcap, ALiBi (with d/d(slopes)), in-kernel
    dropout, and the optional differentiable logsumexp output — all on
    the Pallas kernel pair, never through an O(N^2) score tensor (the
    round-3 `_flash_ext` oracle-VJP fallback is gone).

    ``dropout_seed`` is None when ``dropout_rate == 0`` (an empty-pytree
    arg whose cotangent is None); with dropout it is the packed
    ``[seed, row_off, col_off, b_off, h_off]`` int32 vector
    (``kernels._common.pack_dropout_seed``) — traced, so a new seed every
    train step costs no recompile — and the backward kernels regenerate
    the identical mask from it (FA-2 capability; the reference has none).
    ``dropout_heads`` is the static global head count for the (b, h) hash
    stream (None == local heads).
    """
    out = flash_attention_fwd(
        q,
        k,
        v,
        q_offset,
        sm_scale=sm_scale,
        causal=causal,
        window=window,
        sinks=sinks,
        segment_ids=segment_ids,
        block_sizes=block_sizes,
        save_lse=save_lse,
        lazy_softmax=lazy_softmax,
        softcap=softcap,
        alibi_slopes=alibi_slopes,
        dropout_rate=dropout_rate,
        dropout_seed=dropout_seed,
        dropout_heads=dropout_heads,
        interpret=interpret,
    )
    if save_lse:
        return out[0], out[1][..., 0]
    return out


def _flash_core_fwd_rule(
    q, k, v, q_offset, alibi_slopes, dropout_seed, segment_ids,
    causal, window, sinks, sm_scale, softcap, dropout_rate, dropout_heads,
    block_sizes, save_lse, lazy_softmax, interpret,
):
    o, lse_lanes = flash_attention_fwd(
        q,
        k,
        v,
        q_offset,
        sm_scale=sm_scale,
        causal=causal,
        window=window,
        sinks=sinks,
        segment_ids=segment_ids,
        block_sizes=block_sizes,
        save_lse=True,
        lazy_softmax=lazy_softmax,
        softcap=softcap,
        alibi_slopes=alibi_slopes,
        dropout_rate=dropout_rate,
        dropout_seed=dropout_seed,
        dropout_heads=dropout_heads,
        interpret=interpret,
    )
    res = (q, k, v, q_offset, alibi_slopes, dropout_seed, segment_ids, o,
           lse_lanes)
    primal = (o, lse_lanes[..., 0]) if save_lse else o
    return primal, res


def _grads_from_residuals(
    residuals, do, dlse, *, causal, window, sinks, sm_scale, softcap,
    block_sizes, interpret, dropout_rate=0.0, dropout_heads=None,
):
    """Shared FA-2 backward with native GQA.

    GQA (fewer KV heads) has two equivalent paths, routed by measurement:

    - **row-fold**: each KV head's ``group`` query heads fold into
      adjacent rows of one tile (``fold_gqa_rows``; kernel ``pos_div``
      masking — the backward twin of the round-3 decode head-fold), so
      the dKdV kernel reads each K/V block ONCE per KV head and its VMEM
      accumulator already sums the whole group — no ``jnp.repeat`` K/V
      broadcast in HBM, no group-x dK/dV materialization, no reduce
      pass.  The price: 5 full Q-sized HBM transposes (fold q/o/do/lse,
      unfold dq).
    - **broadcast**: ``jnp.repeat`` K/V to the q-head count, group-sum
      dK/dV after.  Group-x K/V materialization, but no transposes.

    At the flagship training shape (B16 Hq16 Hkv8 N2048, group 2) the
    fold measured 9% SLOWER paired (experiments/gqa_bwd_pair.json): the
    transposes outweigh a mere 2x K/V saving.  Small groups (< 4)
    therefore default to broadcast, large groups to fold; a raced
    autotune-cache entry (``lookup_gqa_bwd_route``) overrides either.
    ALiBi and dropout always take broadcast (per-row slopes /
    fold-variant mask coordinates).
    """
    (q, k, v, q_offset, alibi_slopes, dropout_seed, segment_ids, o,
     lse_lanes) = residuals
    h_q, h_kv = q.shape[1], k.shape[1]
    reps = h_q // h_kv
    has_alibi = alibi_slopes is not None
    d_slopes = None
    common = dict(
        sm_scale=sm_scale,
        causal=causal,
        window=window,
        sinks=sinks,
        softcap=softcap,
        block_sizes=block_sizes,
        dropout_rate=dropout_rate,
        dropout_seed=dropout_seed,
        dropout_heads=dropout_heads,
        interpret=interpret,
    )
    use_fold = reps > 1 and not has_alibi and not dropout_rate
    if use_fold:
        # Route fold-vs-broadcast by measurement: the fold halves-to-
        # eighths the K/V HBM traffic but pays 5 full Q-sized transposes
        # (fold q/o/do/lse + unfold dq); paired measurement at the
        # flagship training shape (B16 Hq16 Hkv8 N2048, group 2) put the
        # fold 9% BEHIND broadcast (experiments/gqa_bwd_pair.json), so
        # small groups default to broadcast and large groups (>= 4,
        # where repeat's group-x materialization dominates) to fold; a
        # raced per-topology cache entry overrides either default.
        route = None
        try:
            from ..harness.autotune import lookup_gqa_bwd_route

            route = lookup_gqa_bwd_route(
                h_q, h_kv, q.shape[2], q.shape[3], causal, q.dtype
            )
        except (OSError, KeyError, ValueError, TypeError):
            route = None
        if route is None:
            route = "fold" if reps >= 4 else "broadcast"
        use_fold = route == "fold"
    if use_fold:
        n_q = q.shape[2]
        seg = segment_ids
        if seg is not None:
            # Folded row t*group + g sits at position t: repeat the Q ids.
            from ..config import SegmentIds

            seg = SegmentIds(
                q=jnp.repeat(seg.q, reps, axis=1), kv=seg.kv
            )
        dlse_f = (
            None
            if dlse is None
            else fold_gqa_rows(dlse[..., None], h_kv)[..., 0]
        )
        dqf, dk, dv = flash_attention_bwd_auto(
            fold_gqa_rows(q, h_kv),
            k,
            v,
            fold_gqa_rows(o, h_kv),
            fold_gqa_rows(do, h_kv),
            fold_gqa_rows(lse_lanes, h_kv),
            q_offset,
            dlse_f,
            segment_ids=seg,
            pos_div=reps,
            **common,
        )
        dq = unfold_gqa_rows(dqf, h_q, n_q)
        dk = dk.astype(k.dtype)
        dv = dv.astype(v.dtype)
    else:
        kb, vb = _broadcast_kv_heads(q, k, v)
        out = flash_attention_bwd_auto(
            q,
            kb,
            vb,
            o,
            do,
            lse_lanes,
            q_offset,
            dlse,
            segment_ids=segment_ids,
            alibi_slopes=alibi_slopes,
            **common,
        )
        dq, dk, dv = out[:3]
        if has_alibi:
            d_slopes = out[3].astype(alibi_slopes.dtype)
        if reps > 1:
            b, _, n, d = dk.shape
            dk = dk.reshape(b, h_kv, reps, n, d).sum(axis=2).astype(k.dtype)
            dv = dv.reshape(b, h_kv, reps, n, d).sum(axis=2).astype(v.dtype)
    # Integer offsets/segment-ids get float0 cotangents.
    d_off = np.zeros(np.shape(q_offset), jax.dtypes.float0)
    d_seg = (
        None
        if segment_ids is None
        else jax.tree_util.tree_map(
            lambda x: np.zeros(np.shape(x), jax.dtypes.float0), segment_ids
        )
    )
    return dq, dk, dv, d_off, d_slopes, d_seg


def _flash_core_bwd_rule(
    causal, window, sinks, sm_scale, softcap, dropout_rate, dropout_heads,
    block_sizes, save_lse, lazy_softmax, interpret, residuals, cts,
):
    do, dlse = cts if save_lse else (cts, None)
    dropout_seed = residuals[5]
    dq, dk, dv, d_off, d_slopes, d_seg = _grads_from_residuals(
        residuals,
        do,
        dlse,
        causal=causal,
        window=window,
        sinks=sinks,
        sm_scale=sm_scale,
        softcap=softcap,
        block_sizes=block_sizes,
        interpret=interpret,
        dropout_rate=dropout_rate,
        dropout_heads=dropout_heads,
    )
    d_seed = (
        None
        if dropout_seed is None
        else np.zeros(np.shape(dropout_seed), jax.dtypes.float0)
    )
    return dq, dk, dv, d_off, d_slopes, d_seed, d_seg


_flash_core.defvjp(_flash_core_fwd_rule, _flash_core_bwd_rule)


def _broadcast_kv_heads(q: jax.Array, k: jax.Array, v: jax.Array):
    """GQA/MQA: replicate KV heads up to the Q head count."""
    h_q, h_kv = q.shape[1], k.shape[1]
    if h_q == h_kv:
        return k, v
    if h_q % h_kv != 0:
        raise ValueError(f"q heads ({h_q}) must be a multiple of kv heads ({h_kv})")
    reps = h_q // h_kv
    k = jnp.repeat(k, reps, axis=1)
    v = jnp.repeat(v, reps, axis=1)
    return k, v


def flash_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    q_offset: Optional[jax.Array] = None,
    segment_ids=None,
    *,
    causal: bool = False,
    window: Optional[int] = None,
    sinks: int = 0,
    kv_positions: Optional[jax.Array] = None,
    sm_scale: Optional[float] = None,
    softcap: Optional[float] = None,
    alibi_slopes: Optional[jax.Array] = None,
    block_sizes: Optional[BlockSizes] = None,
    save_lse: bool = False,
    lazy_softmax: bool = True,
    dropout_rate: float = 0.0,
    dropout_seed: Optional[jax.Array] = None,
    dropout_offsets=None,
    dropout_heads: Optional[int] = None,
    impl: str = "auto",
    interpret: Optional[bool] = None,
) -> Union[jax.Array, Tuple[jax.Array, jax.Array]]:
    """Differentiable flash attention over ``[B, H, N, D]`` inputs.

    Args:
      q: ``[batch, q_heads, n_q, head_dim]``.
      k, v: ``[batch, kv_heads, n_kv, head_dim]`` (kv_heads may divide
        q_heads for GQA/MQA).
      q_offset: optional int32 scalar (may be traced): with ``causal``,
        query row r attends to key cols c <= r + q_offset.  Defaults to
        ``n_kv - n_q`` (end-aligned diagonals).
      causal: apply causal masking.
      window: with causal, restrict each row to its last ``window``
        visible keys (sliding-window attention); out-of-window blocks are
        skipped and their DMAs elided.
      segment_ids: optional ``config.SegmentIds`` for packed sequences
        (tokens attend only within equal ids).
      sinks: with window, keep the first ``sinks`` positions visible
        beyond the window (attention sinks / streaming-LLM).
      kv_positions: optional ``[B, N_kv]`` int32 slot-position map for
        rolling (wrapped) KV caches; switches causal/window masking to
        position space.  Forward-only (serving path).
      sm_scale: softmax scale; defaults to ``1/sqrt(head_dim)``.
      softcap: optional tanh logit cap (Gemma-2 style) on the scaled
        scores: ``s = softcap * tanh(s / softcap)``.  Differentiable
        in-kernel: the backward replays the cap in its score recompute
        and chains dS through ``1 - tanh^2`` — no O(N^2) score tensor.
      alibi_slopes: optional ``[q_heads]`` fp32 ALiBi slopes adding the
        linear position bias ``slope * (col - row - q_offset)``.
        Differentiable, including d/d(slopes) (an in-kernel masked
        reduce of dS * distance).
      block_sizes: kernel tile configuration (see ``config.BlockSizes``).
      save_lse: also return per-row logsumexp ``[B, H, N_q]`` (fp32).
        Both outputs are differentiable (the lse cotangent folds into the
        backward's delta precompute).
      lazy_softmax: use the lagged-base online softmax (faster; see
        ``flash_fwd.flash_attention_fwd``).  Set False for the classic
        eager variant, exact at any score magnitude.
      dropout_rate: attention-probability dropout (FA-2 capability the
        reference lacks).  The keep mask {0, 1/(1-rate)} is a stateless
        hash of ``dropout_seed`` (traced int32 scalar — new seed each
        step, no recompile) and absolute coordinates; the backward
        kernels regenerate it bit-exactly, so no mask tensor ever hits
        HBM.  Training-path feature: composes with causal/window/GQA/
        segment_ids/softcap/alibi/save_lse; NOT with kv_positions
        (rolling-cache serving has no dropout).
      dropout_seed: int32 scalar; required when ``dropout_rate > 0``.
      dropout_offsets: optional ``(row, col, batch, head)`` int32 scalars
        (traced OK) translating shard-local coordinates to GLOBAL ones
        under ``shard_map``: sequence shards pass their row/col origins,
        dp/tp shards their batch/head origins.  With the right offsets
        (plus ``dropout_heads``) every mesh factorization regenerates
        the exact single-device mask — sharding-invariant dropout.
      dropout_heads: static global head count for the (b, h) hash stream
        (required for exactness under tp head sharding; defaults to the
        local head count).
      impl: "pallas" | "xla" | "auto".
      interpret: force Pallas interpreter mode (default: auto-detect
        non-TPU backends).

    Returns:
      ``o`` with the shape/dtype of ``q``, or ``(o, lse)``.
    """
    if q.ndim != 4:
        raise ValueError(f"expected [B, H, N, D] inputs, got {q.shape}")
    if sm_scale is None:
        sm_scale = default_scale(q.shape[-1])
    if q.shape[1] % k.shape[1]:
        raise ValueError(
            f"q heads ({q.shape[1]}) must be a multiple of kv heads "
            f"({k.shape[1]})"
        )
    if q_offset is None:
        q_offset = k.shape[2] - q.shape[2]
    q_offset = jnp.asarray(q_offset, jnp.int32)

    if impl == "auto":
        impl = "pallas"
    if interpret is None:
        interpret = _use_interpret()

    if dropout_rate:
        if not 0.0 < dropout_rate < 1.0:
            raise ValueError(
                f"dropout_rate must be in [0, 1), got {dropout_rate}"
            )
        if dropout_seed is None:
            raise ValueError("dropout_rate > 0 requires dropout_seed")
        if kv_positions is not None:
            raise NotImplementedError(
                "dropout is a training-path feature; rolling-cache "
                "(kv_positions) serving does not support it"
            )
        from ..kernels._common import pack_dropout_seed

        dropout_seed = pack_dropout_seed(dropout_seed, dropout_offsets)

    if kv_positions is not None:
        # Rolling-cache serving path: forward-only, straight to the kernel.
        return flash_attention_fwd(
            q,
            k,
            v,
            q_offset,
            sm_scale=sm_scale,
            causal=causal,
            window=window,
            sinks=sinks,
            kv_positions=kv_positions,
            block_sizes=block_sizes,
            save_lse=save_lse,
            softcap=softcap,
            alibi_slopes=alibi_slopes,
            interpret=interpret,
        )

    if impl == "xla":
        k, v = _broadcast_kv_heads(q, k, v)
        if save_lse:
            if dropout_rate:
                raise NotImplementedError("save_lse with dropout")
            return attention_reference_with_lse(
                q,
                k,
                v,
                causal=causal,
                sm_scale=sm_scale,
                q_offset=q_offset,
                window=window,
                sinks=sinks,
                segment_ids=segment_ids,
                softcap=softcap,
                alibi_slopes=alibi_slopes,
            )
        return attention_reference(
            q,
            k,
            v,
            causal=causal,
            sm_scale=sm_scale,
            q_offset=q_offset,
            window=window,
            sinks=sinks,
            segment_ids=segment_ids,
            softcap=softcap,
            alibi_slopes=alibi_slopes,
            dropout_rate=dropout_rate,
            dropout_seed=dropout_seed,
            dropout_heads=dropout_heads,
        )
    if impl != "pallas":
        raise ValueError(f"unknown impl {impl!r}")

    if alibi_slopes is not None:
        alibi_slopes = jnp.asarray(alibi_slopes, jnp.float32)
    return _flash_core(
        q,
        k,
        v,
        q_offset,
        alibi_slopes,
        dropout_seed if dropout_rate else None,
        segment_ids,
        causal,
        window,
        sinks,
        sm_scale,
        softcap,
        dropout_rate,
        dropout_heads if dropout_rate else None,
        block_sizes,
        save_lse,
        lazy_softmax,
        interpret,
    )


def mha(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    **kwargs,
) -> jax.Array:
    """Convenience wrapper for ``[B, N, H, D]`` (sequence-major) layouts."""
    out = flash_attention(
        q.transpose(0, 2, 1, 3),
        k.transpose(0, 2, 1, 3),
        v.transpose(0, 2, 1, 3),
        **kwargs,
    )
    if isinstance(out, tuple):
        o, lse = out
        return o.transpose(0, 2, 1, 3), lse
    return out.transpose(0, 2, 1, 3)


def fold_gqa_rows(q: jax.Array, kv_heads: int) -> jax.Array:
    """[B, Hq, T, D] -> [B, Hkv, T*group, D] with row = t*group + g.

    Row-major grouping matches the kernels' ``h // kv_group`` GQA
    convention (q-head index = kv*group + g) and the ``pos_div`` mask
    semantics (position = row // group)."""
    b, hq, t, d = q.shape
    group = hq // kv_heads
    return (
        q.reshape(b, kv_heads, group, t, d)
        .transpose(0, 1, 3, 2, 4)
        .reshape(b, kv_heads, t * group, d)
    )


def unfold_gqa_rows(x: jax.Array, q_heads: int, t: int) -> jax.Array:
    """Inverse of ``fold_gqa_rows`` on outputs (any trailing dims)."""
    b, hkv = x.shape[:2]
    group = q_heads // hkv
    tail = x.shape[3:]
    x = x.reshape(b, hkv, t, group, *tail)
    perm = (0, 1, 3, 2) + tuple(range(4, x.ndim))
    return x.transpose(*perm).reshape(b, q_heads, t, *tail)


def gqa_decode_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    q_offset: jax.Array,
    *,
    window: Optional[int] = None,
    sinks: int = 0,
    softcap: Optional[float] = None,
    sm_scale: Optional[float] = None,
    block_sizes: Optional[BlockSizes] = None,
    save_lse: bool = False,
    interpret: Optional[bool] = None,
) -> Union[jax.Array, Tuple[jax.Array, jax.Array]]:
    """Head-folded GQA/MQA decode attention (forward-only, serving path).

    ``q``: ``[B, H_q, T, D]`` new-token queries at positions
    ``q_offset[b] + t``; ``k, v``: ``[B, H_kv, N, D]`` cache.  The plain
    kernel's GQA grid re-reads each KV block once per *q*-head
    (index-map sharing dedups storage, not traffic), which multiplies
    the HBM bytes of bandwidth-bound decode by ``group = H_q / H_kv``.
    This wrapper folds each KV head's ``group`` query heads into
    adjacent rows of one tile (kernel ``pos_div`` semantics: row ``r``
    masks at position ``r // group``), so the KV stream is read ONCE per
    KV head and the QK^T gets real sublane tiles instead of single rows.

    Returns ``o`` shaped like ``q`` (and ``lse [B, H_q, T]``).
    Not composable with ALiBi (per-head slopes would need per-row
    slopes), rolling caches, or dropout; use ``flash_attention`` there.
    """
    b, hq, t, d = q.shape
    hkv = k.shape[1]
    if hq % hkv:
        raise ValueError(f"q heads ({hq}) not a multiple of kv heads ({hkv})")
    group = hq // hkv
    if interpret is None:
        interpret = _use_interpret()
    if group == 1:
        out = flash_attention_fwd(
            q, k, v, q_offset, causal=True, window=window, sinks=sinks,
            softcap=softcap, sm_scale=sm_scale, block_sizes=block_sizes,
            save_lse=save_lse, interpret=interpret,
        )
        if save_lse:
            return out[0], out[1][..., 0]
        return out
    qf = fold_gqa_rows(q, hkv)
    out = flash_attention_fwd(
        qf, k, v, q_offset, causal=True, window=window, sinks=sinks,
        softcap=softcap, sm_scale=sm_scale, block_sizes=block_sizes,
        save_lse=save_lse, pos_div=group, interpret=interpret,
    )
    o = out[0] if save_lse else out
    if save_lse:
        return (
            unfold_gqa_rows(o, hq, t),
            unfold_gqa_rows(out[1][..., 0], hq, t),
        )
    return unfold_gqa_rows(o, hq, t)
