"""K2 — FlashAttention V1: tiled, fp32, online softmax.

TPU-native re-design of the reference's ``flash_attention_kernel``
(``kernels.metal:66-171``).  The Metal kernel stages 32x64 Q/K/V tiles in
threadgroup SRAM and streams K/V blocks with a per-element online softmax
(running m, l and accumulator rescale, ``kernels.metal:148-159``).  On TPU
the same algorithm becomes:

* threadgroup SRAM tiles      -> Pallas ``BlockSpec`` VMEM blocks
* the streaming K/V loop      -> a grid axis with ``"arbitrary"`` semantics
                                 (Pallas pipelines the HBM->VMEM block DMAs)
* per-thread scalar math      -> whole-tile MXU ``dot_general`` + VPU ops
* running (m, l, acc) in
  registers                   -> fp32 VMEM scratch persisting across the KV
                                 grid axis

This rung is deliberately simple — one KV block per grid step, fp32
everywhere, mask applied elementwise — and exists as the first verified
step above the naive baseline, exactly as in the reference ladder
(``main.mm:245-256``).  The tuned engine lives in ``flash_fwd.py``.
"""

from __future__ import annotations

import functools
import math
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..config import DEFAULT_MASK_VALUE, NUM_LANES, default_scale
from ._common import mxu_precision

_LOG2E = math.log2(math.e)


def _flash_v1_kernel(
    q_ref,
    k_ref,
    v_ref,
    o_ref,
    m_scratch,
    l_scratch,
    acc_scratch,
    *,
    sm_scale: float,
    causal: bool,
    block_q: int,
    block_k: int,
    num_kv_blocks: int,
):
    q_idx = pl.program_id(2)
    kv_idx = pl.program_id(3)

    # --- init running stats on the first KV block (analog of the m=-inf,
    # l=0 thread-local init at ``kernels.metal:113-115``) ---
    @pl.when(kv_idx == 0)
    def _init():
        m_scratch[...] = jnp.full_like(m_scratch, -jnp.inf)
        l_scratch[...] = jnp.zeros_like(l_scratch)
        acc_scratch[...] = jnp.zeros_like(acc_scratch)

    # Causal: skip KV blocks entirely above the diagonal (the analog of the
    # whole-block ``continue`` in the reference V4, ``kernels.metal:682``).
    if causal:
        should_run = (q_idx + 1) * block_q - 1 >= kv_idx * block_k
    else:
        should_run = True

    @pl.when(should_run)
    def _body():
        # Scale (and the base-2 change of base) folded into the
        # (block_q, D) Q tile once instead of a (block_q, block_k) pass
        # over every score tile: exp(x) = exp2(x * log2 e), so running
        # the whole online recurrence in base 2 turns every per-score
        # transcendental into a raw exp2 — one VPU multiply pass per
        # score tile cheaper (same trick as the tuned engine; the
        # softmax weights are identical, p_i/l is base-invariant).
        q = q_ref[0, 0].astype(jnp.float32) * (sm_scale * _LOG2E)
        k = k_ref[0, 0].astype(jnp.float32)
        v = v_ref[0, 0].astype(jnp.float32)

        # S = Q K^T * scale  (MXU), in log2 units
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=mxu_precision(q.dtype),
        )

        if causal:
            row = (
                jax.lax.broadcasted_iota(jnp.int32, s.shape, 0)
                + q_idx * block_q
            )
            col = (
                jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
                + kv_idx * block_k
            )
            s = jnp.where(col <= row, s, DEFAULT_MASK_VALUE)

        # --- online softmax update (``kernels.metal:148-159``) ---
        m_prev = m_scratch[...]  # (block_q, NUM_LANES), lane-replicated
        l_prev = l_scratch[...]
        m_curr = jnp.max(s, axis=-1, keepdims=True)  # (block_q, 1)
        m_next = jnp.maximum(m_prev, m_curr)  # lane-replicated
        alpha = jnp.exp2(m_prev - m_next)
        p = jnp.exp2(s - m_next[:, :1])
        l_curr = jnp.sum(p, axis=-1, keepdims=True)
        l_next = alpha * l_prev + l_curr

        m_scratch[...] = m_next
        l_scratch[...] = l_next

        # Unnormalized accumulator with rescale-by-alpha (the register
        # rescale at ``kernels.metal:154-156``); final 1/l division happens
        # once in the epilogue, like the reference's divide-by-l store
        # (``kernels.metal:166-170``).
        acc_scratch[...] *= alpha[:, :1]
        acc_scratch[...] += jnp.dot(
            p.astype(v.dtype), v,
            preferred_element_type=jnp.float32,
            precision=mxu_precision(v.dtype),
        )

    # --- epilogue on the final KV block ---
    @pl.when(kv_idx == num_kv_blocks - 1)
    def _store():
        l = l_scratch[...][:, :1]
        l_inv = jnp.where(l == 0.0, 1.0, 1.0 / l)
        o_ref[0, 0, :, :] = (acc_scratch[...] * l_inv).astype(o_ref.dtype)


def _flash_v1_kernel_folded(
    q_ref,
    k_ref,
    v_ref,
    o_ref,
    *,
    sm_scale: float,
    causal: bool,
    fold: int,
):
    """Single-KV-block V1 with ``fold`` batch elements per grid step.

    Small-N batched sweeps (the reference's N=128 row) otherwise pay the
    per-grid-step overhead once per batch element — the same fix as the
    tuned engine's lean path (``flash_fwd._lean_batch_fold``): a pure
    grid repack, identical math.  With one KV block the online-softmax
    recurrence collapses to its first iteration (m = -inf, l = 0 carry-in
    is the identity), so no scratch round-trip is needed.
    """
    for f in range(fold):
        # Base-2 softmax with log2(e) folded into the Q prescale (see
        # _flash_v1_kernel) — one VPU pass per score tile saved.
        q = q_ref[f, 0].astype(jnp.float32) * (sm_scale * _LOG2E)
        k = k_ref[f, 0].astype(jnp.float32)
        v = v_ref[f, 0].astype(jnp.float32)
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=mxu_precision(q.dtype),
        )
        if causal:
            row = jax.lax.broadcasted_iota(jnp.int32, s.shape, 0)
            col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
            s = jnp.where(col <= row, s, DEFAULT_MASK_VALUE)
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp2(s - m)
        l = jnp.sum(p, axis=-1, keepdims=True)
        l_inv = jnp.where(l == 0.0, 1.0, 1.0 / l)
        acc = jnp.dot(
            p.astype(v.dtype), v,
            preferred_element_type=jnp.float32,
            precision=mxu_precision(v.dtype),
        )
        o_ref[f, 0, :, :] = (acc * l_inv).astype(o_ref.dtype)


# Per-N streaming tile defaults, raced paired-vs-naive on v5e at the
# 2^23-amortized sweep batches (experiments/v1_blocks.py, round 5):
# larger KV blocks amortize the online-softmax state updates that the
# structurally-lean TPU "naive" never pays.  Every entry keeps >= 2 KV
# streaming steps — the defining FA-1 trait.
_V1_BLOCKS = {
    1024: (512, 512),  # 1.14x vs naive
    2048: (1024, 1024),  # 1.06x
    4096: (512, 2048),  # 1.05x
    8192: (1024, 2048),  # 1.01x
}


@functools.partial(
    jax.jit,
    static_argnames=("sm_scale", "causal", "block_q", "block_k", "interpret"),
)
def flash_attention_v1(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    *,
    sm_scale: Optional[float] = None,
    causal: bool = False,
    block_q: Optional[int] = None,
    block_k: Optional[int] = None,
    interpret: bool = False,
) -> jax.Array:
    """Tiled fp32 flash attention over ``[B, H, N, D]`` inputs.

    Default tiles come from the per-N raced table ``_V1_BLOCKS``
    (512x512 otherwise): the TPU analog of the reference's 16x16-vs-
    32x32 occupancy study (``README.md:25-28``) lands much larger here —
    128x128 tiles leave the kernel per-grid-step-overhead bound (measured
    0.33x vs naive at N>=2048 on v5e; the raced tiles reach 1.0-1.14x,
    at the fp32-HIGHEST matmul wall both kernels share — see
    ``docs/optimization_narrative.md``).
    """
    batch, heads, n_q, head_dim = q.shape
    n_kv = k.shape[2]
    if sm_scale is None:
        sm_scale = default_scale(head_dim)
    if block_q is None or block_k is None:
        dq, dk = _V1_BLOCKS.get(max(n_q, n_kv), (512, 512))
        block_q = dq if block_q is None else block_q
        block_k = dk if block_k is None else block_k
    block_q = min(block_q, n_q)
    block_k = min(block_k, n_kv)
    if causal and n_q != n_kv:
        raise ValueError(
            "flash_attention_v1 causal requires n_q == n_kv (this simple "
            "rung has no diagonal offset; use flash_attention_mxu)"
        )
    if n_q % block_q or n_kv % block_k:
        raise ValueError(
            f"sequence lengths ({n_q}, {n_kv}) must be divisible by blocks "
            f"({block_q}, {block_k})"
        )
    num_kv_blocks = n_kv // block_k

    if num_kv_blocks == 1 and block_q == n_q:
        # Whole problem in one tile: amortize the per-grid-step overhead
        # over several batch elements (the N=128 dispatch-bound regime the
        # reference's own V1 lost in, speedup 0.6x at N=128 in
        # BASELINE.md; a pure grid repack — same FLOPs and outputs).
        from .flash_fwd import _lean_batch_fold

        fold = _lean_batch_fold(batch, n_q, n_kv)
        if fold > 1:
            kernel = functools.partial(
                _flash_v1_kernel_folded,
                sm_scale=sm_scale,
                causal=causal,
                fold=fold,
            )
            return pl.pallas_call(
                kernel,
                out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
                grid=(batch // fold, heads, 1),
                in_specs=[
                    pl.BlockSpec(
                        (fold, 1, block_q, head_dim),
                        lambda b, h, i: (b, h, i, 0),
                    ),
                    pl.BlockSpec(
                        (fold, 1, block_k, head_dim),
                        lambda b, h, i: (b, h, 0, 0),
                    ),
                    pl.BlockSpec(
                        (fold, 1, block_k, head_dim),
                        lambda b, h, i: (b, h, 0, 0),
                    ),
                ],
                out_specs=pl.BlockSpec(
                    (fold, 1, block_q, head_dim), lambda b, h, i: (b, h, i, 0)
                ),
                compiler_params=pltpu.CompilerParams(
                    dimension_semantics=("parallel", "parallel", "parallel"),
                ),
                cost_estimate=pl.CostEstimate(
                    flops=4 * batch * heads * n_q * n_kv * head_dim,
                    bytes_accessed=(q.size + k.size + v.size + q.size)
                    * q.dtype.itemsize,
                    transcendentals=batch * heads * n_q * n_kv,
                ),
                interpret=interpret,
            )(q, k, v)

    grid = (batch, heads, n_q // block_q, num_kv_blocks)
    kernel = functools.partial(
        _flash_v1_kernel,
        sm_scale=sm_scale,
        causal=causal,
        block_q=block_q,
        block_k=block_k,
        num_kv_blocks=num_kv_blocks,
    )
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (1, 1, block_q, head_dim), lambda b, h, i, j: (b, h, i, 0)
            ),
            pl.BlockSpec(
                (1, 1, block_k, head_dim), lambda b, h, i, j: (b, h, j, 0)
            ),
            pl.BlockSpec(
                (1, 1, block_k, head_dim), lambda b, h, i, j: (b, h, j, 0)
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, block_q, head_dim), lambda b, h, i, j: (b, h, i, 0)
        ),
        scratch_shapes=[
            pltpu.VMEM((block_q, NUM_LANES), jnp.float32),
            pltpu.VMEM((block_q, NUM_LANES), jnp.float32),
            pltpu.VMEM((block_q, head_dim), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel", "arbitrary"),
            # Large streaming tiles (512x2048 fp32 score blocks) need
            # headroom past the 16 MB scoped default — same 32 MB
            # setting as the tuned forward engine (CLAUDE.md).
            vmem_limit_bytes=32 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * batch * heads * n_q * n_kv * head_dim,
            bytes_accessed=(q.size + k.size + v.size + q.size)
            * q.dtype.itemsize,
            transcendentals=batch * heads * n_q * n_kv,
        ),
        interpret=interpret,
    )(q, k, v)
