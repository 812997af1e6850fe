"""Triangular causal forward: statically-unrolled visible-area kernel.

The mid-N causal problem, quantified in round 4 (experiments/
causal_cost.py, real v5e): the general kernel's 4-D grid costs ~0.5 us
per grid step plus a ~2x fixed overhead over the lean 3-D path (15.4 vs
7.8 us at N=1024 B=2 with identical 1024-blocks), so *any* block-skip
scheme that pays per-block grid steps loses more to step floors than the
skipped work saves — which is why rounds 1-3 measured small tiles, dense
-pair grids, and skip-lists all slower, and why causal sat at 45-50% of
roofline for N=1024-4096 while non-causal sat at 95%.

This kernel removes the grid from the triangle instead: ONE grid step
per (batch, head) [batch-folded like the lean path], with the q-block
loop and each q block's kv-tile loop unrolled at trace time.  Because
the causal offset is static here, every q block's visible KV extent is a
compile-time constant: block i reads exactly k[:ext_i] with static
slices, tiles that cannot straddle the diagonal skip the mask compare
entirely, and the online-softmax state lives in registers (SSA values
threaded through the unrolled loop — no scratch refs, no carry).

Executed score area is ceil(visible / tile) — e.g. 10/16 of the full
square at N/4 tiles — with zero skipped steps and zero per-pair
bookkeeping.  This is the TPU shape of the reference V4's whole-block
``continue`` (``kernels.metal:682``): the skip happens in the
instruction stream, not the dispatch.

Scope: causal self-attention with a *static* q_offset (the benchmark
and training shapes; ring/decode keep the general kernel's traced
offsets), optional save_lse, no window/segments/dropout/positions.
"""

from __future__ import annotations

import functools
import math
from typing import Optional, Tuple, Union

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..config import DEFAULT_MASK_VALUE, NUM_LANES, default_scale
from ._common import mxu_dot_general

_LOG2E = math.log2(math.e)
_LN2 = math.log(2.0)


def _tri_kernel(
    q_ref,
    k_ref,
    v_ref,
    o_ref,
    lse_ref,
    *,
    sm_scale: float,
    block_q: int,
    block_k: int,
    n_q: int,
    n_kv: int,
    q_offset: int,
    save_lse: bool,
    fold: int,
    pv_t: bool = False,
):
    # ``pv_t``: transposed-PV accumulation (round 5).  A [block_q, D=64]
    # PV output wastes half of every 128-lane vreg write — measured 77
    # TF/s vs 156 TF/s for the wide QK^T pass (experiments/mxu_rates.py).
    # Computing o^T = V^T P^T instead (pure dot_general dimension
    # numbers, no materialized transpose) makes the PV output
    # [D, block_q]-wide; the accumulator lives transposed, the rescale
    # applies per column, the kernel stores o^T and the wrapper
    # transposes once in XLA (an O(N*D) pass).  Paired at B16 H8 N2048:
    # 976 us vs 1117 us for the best untransposed tri — 1.09x, and past
    # the 70%-of-roofline bar (experiments/tri_pvt.py).  512-tiles win
    # under pv_t (the wide output amortizes); 256-tiles regress (Mosaic
    # materializes a transpose) — the autotuner races both modes.
    for f in range(fold):
        for i in range(n_q // block_q):
            # Rows [i*bq, (i+1)*bq) see columns <= i*bq + r + off.
            last_visible = i * block_q + block_q - 1 + q_offset
            ext = min(n_kv, last_visible + 1)
            rows = slice(i * block_q, (i + 1) * block_q)
            if ext <= 0:
                # Fully-masked q block: zero output, lse = -inf.
                if pv_t:
                    o_ref[f, 0, :, rows] = jnp.zeros(
                        (o_ref.shape[2], block_q), o_ref.dtype
                    )
                else:
                    o_ref[f, 0, rows, :] = jnp.zeros(
                        (block_q, o_ref.shape[-1]), o_ref.dtype
                    )
                if save_lse:
                    lse_ref[f, 0, rows, :] = (
                        jnp.full((block_q, NUM_LANES), -jnp.inf, jnp.float32)
                    )
                continue
            n_tiles = -(-ext // block_k)
            q = q_ref[f, 0, rows, :]
            q = (q.astype(jnp.float32) * (sm_scale * _LOG2E)).astype(q.dtype)

            # Lagged-base online softmax in REGISTERS (same recurrence as
            # flash_fwd's lazy path; base 0 start) — SSA values threaded
            # through the static loop, no VMEM scratch round-trips.
            m = None  # running base (block_q, 1)
            l = None
            acc = None
            for j in range(n_tiles):
                c0 = j * block_k
                bk = min(block_k, n_kv - c0)
                k = k_ref[f, 0, c0 : c0 + bk, :]
                v = v_ref[f, 0, c0 : c0 + bk, :]
                s = mxu_dot_general(q, k, (((1,), (1,)), ((), ())))
                # Static masking decision: only tiles whose last column
                # can exceed some row's limit pay the compare+select.
                if c0 + bk - 1 > i * block_q + q_offset:
                    row = (
                        jax.lax.broadcasted_iota(jnp.int32, (block_q, 1), 0)
                        + i * block_q
                        + q_offset
                    )
                    col = (
                        jax.lax.broadcasted_iota(jnp.int32, (1, bk), 1) + c0
                    )
                    s = jnp.where(col <= row, s, DEFAULT_MASK_VALUE)

                def _pv(p):
                    if pv_t:
                        # o^T += V^T P^T: [D, block_q] wide output.
                        return mxu_dot_general(
                            v, p.astype(v.dtype), (((0,), (1,)), ((), ()))
                        )
                    return mxu_dot_general(
                        p.astype(v.dtype), v, (((1,), (0,)), ((), ()))
                    )

                if m is None:
                    m_curr = jnp.max(s, axis=-1, keepdims=True)
                    p = jnp.exp2(s - m_curr)
                    pv = _pv(p)
                    l = jnp.sum(p, axis=-1, keepdims=True)
                    acc = pv
                    m = m_curr
                else:
                    p = jnp.exp2(jnp.minimum(s - m[:, :1], 96.0))
                    pv = _pv(p)
                    m_curr = jnp.max(s, axis=-1, keepdims=True)
                    m_next = jnp.maximum(m, m_curr)
                    alpha = jnp.exp2(m - m_next)
                    l = (l + jnp.sum(p, axis=-1, keepdims=True)) * alpha
                    if pv_t:
                        acc = (acc + pv) * alpha[:, 0][None, :]
                    else:
                        acc = (acc + pv) * alpha[:, :1]
                    m = m_next
            l_inv = jnp.where(l == 0.0, 1.0, 1.0 / l)
            if pv_t:
                o_ref[f, 0, :, rows] = (acc * l_inv[:, 0][None, :]).astype(
                    o_ref.dtype
                )
            else:
                o_ref[f, 0, rows, :] = (acc * l_inv).astype(o_ref.dtype)
            if save_lse:
                lse = jnp.where(
                    l == 0.0,
                    -jnp.inf,
                    m * _LN2 + jnp.log(jnp.where(l == 0.0, 1.0, l)),
                )
                lse_ref[f, 0, rows, :] = (
                    jnp.broadcast_to(lse, (block_q, NUM_LANES))
                )


# Static-unroll budget: the tri kernel's trace unrolls every visible
# (q-block, kv-tile) pair into the instruction stream, so compile time
# grows with the pair count.  The cap bounds it at the same ~600 full
# -square pairs the autotuner uses (harness.autotune.tri_candidates);
# shapes that cannot fit under it with 512-tiles stay on the grid kernel
# (at those N the grid kernel is within its per-step floors anyway —
# N=16384 measured 0.82 of roofline, docs/optimization_narrative.md).
_UNROLL_CAP = 600

# Measured Mosaic compile wall (round-5 re-race, v5e): EVERY tri config
# at N=8192 fails AOT compilation ("tpu_compile_helper subprocess exit
# code 1") — including 1024x1024 tiles whose instruction count equals
# the N=4096 512x512 config that compiles fine.  The tail-session repro
# ladder (experiments/tri_compile_wall{,2,3}.py) isolated it to the
# count of unrolled online-softmax rescale chains x the sequence
# extent: at 8192, 10 stripped softmax pairs compile, 21 fail, and the
# production kernel fails even at 10 pairs with 2048-tiles — a Mosaic
# resource limit with no tile-geometry escape (narrative, "round 5
# tail").  Heuristics and the race stay within the proven envelope.
_TRI_MAX_N = 4096


def tri_heuristic(
    batch: int,
    heads: int,
    n_q: int,
    n_kv: int,
    head_dim: int,
    q_offset: int = 0,
) -> Optional[Tuple[int, int, bool]]:
    """Default (block_q, block_k, pv_transposed) for routing a causal
    shape onto the triangular kernel with NO autotune entry — the
    round-5 fix for the "tuned shapes only" caveat (the reference's
    causal whole-block skip is unconditional, ``kernels.metal:682``;
    ours must be too).

    Returns ``None`` when the shape is ineligible (q length not
    tileable, or the static unroll would blow the compile-time budget)
    — callers then use the general grid kernel.  Tile choice mirrors
    the autotuner's measured winners on v5e: transposed-PV 512x512
    where the shape admits it (the flagship winner, 1.09x over the best
    untransposed tiles — experiments/tri_pvt.py), 256x256 untransposed
    otherwise (pv_t at 256-tiles regresses: Mosaic materializes a
    transpose).  The autotune cache overrides this in either direction
    (a raced grid win routes grid; a raced tri win carries its tuned
    tiles and mode).
    """
    if n_kv > _TRI_MAX_N or n_q > _TRI_MAX_N:
        return None  # measured Mosaic compile wall past 4096 (see above)
    for bq, bk, pvt in (
        (512, 512, True),
        (256, 256, False),
        (128, 256, False),
        (128, 128, False),
    ):
        if bq > n_q or n_q % bq:
            continue
        bkc = min(bk, n_kv)
        if (n_q // bq) * (-(-n_kv // bkc)) > _UNROLL_CAP:
            continue
        return bq, bkc, pvt
    return None


def tri_bwd_heuristic(
    batch: int,
    heads: int,
    n_q: int,
    n_kv: int,
    head_dim: int,
    q_offset: int = 0,
) -> Optional[Tuple[int, int, bool]]:
    """Default (block_q, block_k, pv_transposed) for routing an untuned
    plain-causal backward onto the fused triangular kernel.

    Conservative by design: only the transposed-gradient 512-tile
    configuration fires (the measured 1.34x flagship winner over the
    split FA-2 pair, experiments/tri_bwd_pvt.py) — untransposed tri and
    256-tiles measured AT OR BELOW the split pair, so ineligible shapes
    keep the split default.  The unroll budget is tighter than the
    forward's (5 matmuls per visible pair vs 2 make backward compiles
    ~2.5x heavier), so very long sequences stay on the split kernels;
    the autotune cache overrides in either direction.
    """
    if n_kv > _TRI_MAX_N or n_q > _TRI_MAX_N:
        return None  # measured Mosaic compile wall past 4096 (see above)
    for bq in (512, 1024):
        bk = bq
        if n_q % bq or n_kv < bk:
            continue
        # Tighter unroll budget than the forward (5 matmuls per pair).
        if (n_q // bq) * (-(-n_kv // bk)) > 150:
            continue
        return bq, bk, True
    return None


def _tri_fold(batch: int, n_q: int, n_kv: int, head_dim: int) -> int:
    """Batch elements per grid step: amortize per-step overhead while
    keeping the folded VMEM working set (Q+K+V, double-buffered)
    comfortably under the scoped limit."""
    fold = 1
    while (
        batch % (fold * 2) == 0
        and fold * 2 * (n_q + 2 * n_kv) * head_dim * 4 <= 8 * 1024 * 1024
        and fold * 2 * max(n_q, n_kv) <= 4096
    ):
        fold *= 2
    return fold


@functools.partial(
    jax.jit,
    static_argnames=(
        "sm_scale",
        "q_offset",
        "block_q",
        "block_k",
        "save_lse",
        "pv_transposed",
        "interpret",
    ),
)
def flash_attention_tri(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    *,
    sm_scale: Optional[float] = None,
    q_offset: Optional[int] = None,
    block_q: int = 256,
    block_k: int = 256,
    save_lse: bool = False,
    pv_transposed: bool = False,
    interpret: bool = False,
) -> Union[jax.Array, Tuple[jax.Array, jax.Array]]:
    """Causal flash attention, triangular statically-unrolled kernel.

    ``q``: [B, H, N_q, D]; ``k``/``v``: [B, H_kv, N_kv, D] (GQA via the
    KV index maps, like the lean path).  ``q_offset`` must be a Python
    int (default n_kv - n_q).  Returns ``o`` (or ``(o, lse_lanes)`` with
    the [B, H, N_q, 128] lane-replicated logsumexp the backward
    consumes).  ``pv_transposed``: widen the PV output by accumulating
    o^T in-kernel and transposing once outside (see ``_tri_kernel``) —
    the measured winner at 512-tiles on v5e.
    """
    batch, heads, n_q, head_dim = q.shape
    n_kv = k.shape[2]
    kv_heads = k.shape[1]
    if heads % kv_heads:
        raise ValueError(f"q heads {heads} not a multiple of {kv_heads}")
    kv_group = heads // kv_heads
    if sm_scale is None:
        sm_scale = default_scale(head_dim)
    if q_offset is None:
        q_offset = n_kv - n_q
    q_offset = int(q_offset)
    block_q = min(block_q, n_q)
    block_k = min(block_k, n_kv)
    if n_q % block_q:
        raise ValueError(f"n_q={n_q} not divisible by block_q={block_q}")
    fold = 1
    if kv_group == 1:
        fold = _tri_fold(batch, n_q, n_kv, head_dim)

    kernel = functools.partial(
        _tri_kernel,
        sm_scale=sm_scale,
        block_q=block_q,
        block_k=block_k,
        n_q=n_q,
        n_kv=n_kv,
        q_offset=q_offset,
        save_lse=save_lse,
        fold=fold,
        pv_t=pv_transposed,
    )
    if not save_lse:
        bound = kernel

        def kernel(q_ref, k_ref, v_ref, o_ref):  # noqa: F811
            return bound(q_ref, k_ref, v_ref, o_ref, None)

    if pv_transposed:
        out_shapes = [
            jax.ShapeDtypeStruct((batch, heads, head_dim, n_q), q.dtype)
        ]
        out_specs = [
            pl.BlockSpec(
                (fold, 1, head_dim, n_q), lambda b, h: (b, h, 0, 0)
            )
        ]
    else:
        out_shapes = [jax.ShapeDtypeStruct(q.shape, q.dtype)]
        out_specs = [
            pl.BlockSpec((fold, 1, n_q, head_dim), lambda b, h: (b, h, 0, 0))
        ]
    if save_lse:
        out_shapes.append(
            jax.ShapeDtypeStruct((batch, heads, n_q, NUM_LANES), jnp.float32)
        )
        out_specs.append(
            pl.BlockSpec((fold, 1, n_q, NUM_LANES), lambda b, h: (b, h, 0, 0))
        )
    # Visible-area FLOP model (the executed work, for the scheduler).
    nb = n_q // block_q
    area = sum(
        min(n_kv, i * block_q + block_q + q_offset) * block_q
        for i in range(nb)
        if min(n_kv, i * block_q + block_q + q_offset) > 0
    )
    flops = 4 * batch * heads * area * head_dim
    results = pl.pallas_call(
        kernel,
        out_shape=out_shapes,
        grid=(batch // fold, heads),
        in_specs=[
            pl.BlockSpec(
                (fold, 1, n_q, head_dim), lambda b, h: (b, h, 0, 0)
            ),
            pl.BlockSpec(
                (fold, 1, n_kv, head_dim),
                lambda b, h: (b, h // kv_group, 0, 0),
            ),
            pl.BlockSpec(
                (fold, 1, n_kv, head_dim),
                lambda b, h: (b, h // kv_group, 0, 0),
            ),
        ],
        out_specs=out_specs,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=(q.size + k.size + v.size + q.size)
            * q.dtype.itemsize,
            transcendentals=batch * heads * area,
        ),
        interpret=interpret,
    )(q, k, v)
    o = results[0]
    if pv_transposed:
        o = o.swapaxes(-1, -2)
    if save_lse:
        return o, results[1]
    return o


# ---------------------------------------------------------------------------
# Triangular backward: one fused static-unroll kernel for dQ, dK, dV.
# ---------------------------------------------------------------------------


def _tri_bwd_kernel(
    q_ref,
    k_ref,
    v_ref,
    do_ref,
    lse_ref,
    delta_ref,
    dq_ref,
    dk_ref,
    dv_ref,
    *,
    sm_scale: float,
    block_q: int,
    block_k: int,
    n_q: int,
    n_kv: int,
    q_offset: int,
    fold: int,
    pos_div: int,
    pv_t: bool = False,
):
    """Fused causal FA-2 backward, visible-area static unroll.

    The split backward (``flash_bwd``) runs TWO 4-D-grid kernels (dKdV
    and dQ), re-reading Q/K/V/dO and paying the general path's per-step
    floors twice; the fused 4-D variant was measured slower (HBM dQ
    partials).  Here — as in the forward tri kernel — the grid is one
    step per (batch, head): every visible (i, j) block pair runs exactly
    once, S is recomputed ONCE and feeds all three gradients, dQ_i
    accumulates across its inner j loop in registers, and the per-KV
    -block dK_j/dV_j accumulators are SSA values threaded through the
    unrolled i loop (the skipped upper triangle never enters the
    instruction stream).  Scope mirrors the forward tri kernel: static
    causal offset, no window/segments/softcap/alibi/dropout
    (those stay on the split kernels, ``flash_bwd.py``).  ``pos_div``
    is the GQA row-fold convention (row r masks at position
    r // pos_div — see ``flash_bwd._dkv_kernel``), so the folded
    native-GQA backward rides this kernel too.  Reference dS math:
    ``kernels.metal:1081-1214`` (recompute P from saved lse, dV +=
    P^T dO, dS = P(dP − delta), dK += dS^T Q, dQ += dS K).

    ``pv_t``: transposed-output gradient matmuls (round 5).  dV, dK and
    dQ all have [block, D=64]-narrow outputs — the 39-49%-of-peak matmul
    class (experiments/mxu_rates.py) — so the kernel computes
    dV^T = dO^T P, dK^T = Q^T dS and dQ^T = K^T dS^T instead ([64,
    block]-wide outputs, pure dimension numbers), stores the gradients
    transposed, and the wrapper transposes outside.  Paired at B16 H8
    N2048 causal: 1741 us vs the split pair's 2329 us (1.34x,
    bit-identical gradients; experiments/tri_bwd_pvt.py).
    """
    nkb = -(-n_kv // block_k)
    for f in range(fold):
        dk_accs = [None] * nkb
        dv_accs = [None] * nkb
        for i in range(n_q // block_q):
            last_visible = (
                (i * block_q + block_q - 1) // pos_div + q_offset
            )
            ext = min(n_kv, last_visible + 1)
            rows = slice(i * block_q, (i + 1) * block_q)
            if ext <= 0:
                if pv_t:
                    dq_ref[f, 0, :, rows] = jnp.zeros(
                        (dq_ref.shape[2], block_q), dq_ref.dtype
                    )
                else:
                    dq_ref[f, 0, rows, :] = jnp.zeros(
                        (block_q, dq_ref.shape[-1]), dq_ref.dtype
                    )
                continue
            n_tiles = -(-ext // block_k)
            q = q_ref[f, 0, rows, :]
            # Base-2 reconstruction with sm_scale * log2(e) folded into a
            # [block_q, D] Q prescale and the trailing dS scale folded
            # into the dK/dQ epilogue stores (see flash_bwd._dkv_kernel,
            # round 5) — three full-area VPU passes off each pair.
            qs = (q.astype(jnp.float32) * (sm_scale * _LOG2E)).astype(
                q.dtype
            )
            do = do_ref[f, 0, rows, :]
            lse = lse_ref[f, 0, rows, :][:, :1]
            # -inf rows (fully masked / lazy-flushed) must yield p == 0,
            # not inf (see flash_bwd._dkv_kernel).
            lse = jnp.where(jnp.isneginf(lse), 1e30, lse)
            lse2 = lse * _LOG2E
            delta = delta_ref[f, 0, rows, :][:, :1]
            dq = None
            for j in range(n_tiles):
                c0 = j * block_k
                bk = min(block_k, n_kv - c0)
                k = k_ref[f, 0, c0 : c0 + bk, :]
                v = v_ref[f, 0, c0 : c0 + bk, :]
                s = mxu_dot_general(qs, k, (((1,), (1,)), ((), ())))
                p = jnp.exp2(s - lse2)
                if c0 + bk - 1 > (i * block_q) // pos_div + q_offset:
                    row = (
                        jax.lax.broadcasted_iota(jnp.int32, (block_q, 1), 0)
                        + i * block_q
                    )
                    if pos_div != 1:
                        row = row // pos_div
                    row = row + q_offset
                    col = (
                        jax.lax.broadcasted_iota(jnp.int32, (1, bk), 1) + c0
                    )
                    p = jnp.where(col <= row, p, 0.0)
                if pv_t:
                    # dV^T += dO^T P : [D, bk]-wide output.
                    pv = mxu_dot_general(
                        do, p.astype(do.dtype), (((0,), (0,)), ((), ()))
                    )
                else:
                    pv = mxu_dot_general(
                        p.astype(do.dtype), do, (((0,), (0,)), ((), ()))
                    )
                dv_accs[j] = pv if dv_accs[j] is None else dv_accs[j] + pv
                dp = mxu_dot_general(do, v, (((1,), (1,)), ((), ())))
                ds = p * (dp - delta)  # sm_scale folded into the stores
                if pv_t:
                    # dK^T += Q^T dS : [D, bk]; dQ^T += K^T dS^T : [D, bq].
                    dst = mxu_dot_general(
                        q, ds.astype(q.dtype), (((0,), (0,)), ((), ()))
                    )
                else:
                    dst = mxu_dot_general(
                        ds.astype(q.dtype), q, (((0,), (0,)), ((), ()))
                    )
                dk_accs[j] = dst if dk_accs[j] is None else dk_accs[j] + dst
                if pv_t:
                    dqj = mxu_dot_general(
                        k, ds.astype(k.dtype), (((0,), (1,)), ((), ()))
                    )
                else:
                    dqj = mxu_dot_general(
                        ds.astype(k.dtype), k, (((1,), (0,)), ((), ()))
                    )
                dq = dqj if dq is None else dq + dqj
            if pv_t:
                dq_ref[f, 0, :, rows] = (dq * sm_scale).astype(dq_ref.dtype)
            else:
                dq_ref[f, 0, rows, :] = (dq * sm_scale).astype(dq_ref.dtype)
        for j in range(nkb):
            c0 = j * block_k
            bk = min(block_k, n_kv - c0)
            cols = slice(c0, c0 + bk)
            if dk_accs[j] is None:
                if pv_t:
                    dk_ref[f, 0, :, cols] = jnp.zeros(
                        (dk_ref.shape[2], bk), dk_ref.dtype
                    )
                    dv_ref[f, 0, :, cols] = jnp.zeros(
                        (dv_ref.shape[2], bk), dv_ref.dtype
                    )
                else:
                    dk_ref[f, 0, cols, :] = jnp.zeros(
                        (bk, dk_ref.shape[-1]), dk_ref.dtype
                    )
                    dv_ref[f, 0, cols, :] = jnp.zeros(
                        (bk, dv_ref.shape[-1]), dv_ref.dtype
                    )
            elif pv_t:
                dk_ref[f, 0, :, cols] = (dk_accs[j] * sm_scale).astype(
                    dk_ref.dtype
                )
                dv_ref[f, 0, :, cols] = dv_accs[j].astype(dv_ref.dtype)
            else:
                dk_ref[f, 0, cols, :] = (dk_accs[j] * sm_scale).astype(
                    dk_ref.dtype
                )
                dv_ref[f, 0, cols, :] = dv_accs[j].astype(dv_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=(
        "sm_scale",
        "q_offset",
        "block_q",
        "block_k",
        "pos_div",
        "pv_transposed",
        "interpret",
    ),
)
def flash_attention_bwd_tri(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    o: jax.Array,
    do: jax.Array,
    lse_lanes: jax.Array,
    dlse: Optional[jax.Array] = None,
    *,
    sm_scale: Optional[float] = None,
    q_offset: Optional[int] = None,
    block_q: int = 256,
    block_k: int = 256,
    pos_div: int = 1,
    pv_transposed: bool = False,
    interpret: bool = False,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """(dQ, dK, dV) via the fused triangular static-unroll kernel.

    Causal self-attention with a *static* ``q_offset`` and equal head
    counts only; softcap, ALiBi, dropout, window, segments and traced
    offsets stay on the split kernels.  ``pos_div`` carries the GQA
    row-fold (callers fold the group q-heads into rows; dK/dV come out
    group-summed — see ``ops.attention._grads_from_residuals``).
    ``dlse`` (cotangent of an exposed lse output) folds into the delta
    precompute exactly as in ``flash_bwd``.  ``pv_transposed`` widens
    the three gradient matmuls' outputs (see ``_tri_bwd_kernel``) — the
    flagship-shape winner, 1.34x over the split pair.
    """
    batch, heads, n_q, head_dim = q.shape
    n_kv = k.shape[2]
    if k.shape[1] != heads:
        raise ValueError(
            f"flash_attention_bwd_tri requires equal head counts, got "
            f"{heads} vs {k.shape[1]}"
        )
    if sm_scale is None:
        sm_scale = default_scale(head_dim)
    if q_offset is None:
        q_offset = n_kv - n_q // pos_div
    q_offset = int(q_offset)
    block_q = min(block_q, n_q)
    block_k = min(block_k, n_kv)
    if n_q % block_q:
        raise ValueError(f"n_q={n_q} not divisible by block_q={block_q}")
    fold = _tri_fold(batch, n_q, n_kv, head_dim)
    if batch % fold:
        fold = 1

    # delta_i = rowsum(dO ⊙ O) (+ the lse cotangent when saved); computed
    # in XLA, lane-replicated like the lse residual.
    delta = jnp.sum(
        o.astype(jnp.float32) * do.astype(jnp.float32), axis=-1,
        keepdims=True,
    )
    if dlse is not None:
        delta = delta - dlse.astype(jnp.float32)[..., None]
    delta_lanes = jnp.broadcast_to(delta, (*delta.shape[:-1], NUM_LANES))

    kernel = functools.partial(
        _tri_bwd_kernel,
        sm_scale=sm_scale,
        block_q=block_q,
        block_k=block_k,
        n_q=n_q,
        n_kv=n_kv,
        q_offset=q_offset,
        fold=fold,
        pos_div=pos_div,
        pv_t=pv_transposed,
    )
    qspec = pl.BlockSpec((fold, 1, n_q, head_dim), lambda b, h: (b, h, 0, 0))
    kvspec = pl.BlockSpec(
        (fold, 1, n_kv, head_dim), lambda b, h: (b, h, 0, 0)
    )
    lanespec = pl.BlockSpec(
        (fold, 1, n_q, NUM_LANES), lambda b, h: (b, h, 0, 0)
    )
    qtspec = pl.BlockSpec(
        (fold, 1, head_dim, n_q), lambda b, h: (b, h, 0, 0)
    )
    kvtspec = pl.BlockSpec(
        (fold, 1, head_dim, n_kv), lambda b, h: (b, h, 0, 0)
    )
    nb = n_q // block_q
    area = sum(
        ext * block_q
        for i in range(nb)
        for ext in [
            min(n_kv, (i * block_q + block_q - 1) // pos_div + q_offset + 1)
        ]
        if ext > 0
    )
    if pv_transposed:
        out_shape = [
            jax.ShapeDtypeStruct(
                (batch, heads, head_dim, n_q), q.dtype
            ),
            jax.ShapeDtypeStruct(
                (batch, heads, head_dim, n_kv), jnp.float32
            ),
            jax.ShapeDtypeStruct(
                (batch, heads, head_dim, n_kv), jnp.float32
            ),
        ]
        out_specs = [qtspec, kvtspec, kvtspec]
    else:
        out_shape = [
            jax.ShapeDtypeStruct(q.shape, q.dtype),
            jax.ShapeDtypeStruct(k.shape, jnp.float32),
            jax.ShapeDtypeStruct(v.shape, jnp.float32),
        ]
        out_specs = [qspec, kvspec, kvspec]
    dq, dk, dv = pl.pallas_call(
        kernel,
        out_shape=out_shape,
        grid=(batch // fold, heads),
        in_specs=[qspec, kvspec, kvspec, qspec, lanespec, lanespec],
        out_specs=out_specs,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
            vmem_limit_bytes=96 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=10 * batch * heads * area * head_dim,
            bytes_accessed=3
            * (q.size * 2 + k.size * 2)
            * q.dtype.itemsize,
            transcendentals=batch * heads * area,
        ),
        interpret=interpret,
    )(q, k, v, do, lse_lanes, delta_lanes)
    if pv_transposed:
        dq = dq.swapaxes(-1, -2)
        dk = dk.swapaxes(-1, -2)
        dv = dv.swapaxes(-1, -2)
    return dq, dk, dv
