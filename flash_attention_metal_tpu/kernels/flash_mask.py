"""Arbitrary block-sparse attention masks (splash-style skip lists).

Causal, sliding-window, sinks, and segment masking cover the production
cases (``flash_fwd.py``); this module subsumes them with a general
mask compiler: any mask expressible as a jnp-traceable predicate
``mask_fn(row_ids, col_ids) -> bool`` is

1. **compiled to per-Q-block KV skip lists** at trace time — for each Q
   block row, the list of KV blocks containing ANY visible element.
   The grid's KV axis runs over the list (scalar-prefetched ids, like
   the per-batch causal offsets), so fully-masked blocks cost neither
   compute NOR bandwidth: out-of-list grid steps clamp the index map to
   a repeated block and their DMAs are elided — the general-mask form
   of the causal block skip (``kernels.metal:682`` analog) + DMA-elision
   trick;
2. **applied elementwise inside the kernel** on the visited blocks
   (unconditionally — a per-block FULL/PARTIAL branch was measured to
   break Mosaic's MXU/VPU overlap, so visited blocks always pay the
   cheap VPU mask).

The same skip lists, transposed, drive the backward kernels (per-KV-
block Q lists for dKdV; the Q-block lists again for dQ).

The reference has no mask system at all — its only mask is the causal
flag (``kernels.metal:612,682,737-754``); this is the TPU build's
generalization, following the jax ``splash_attention`` design idea of
block-level mask compilation without copying its implementation.
"""

from __future__ import annotations

import functools
from typing import Callable, Optional, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..config import DEFAULT_MASK_VALUE, NUM_LANES, default_scale
from ._common import mxu_dot_general

MaskFn = Callable[[jax.Array, jax.Array], jax.Array]


class BlockMask:
    """Compiled block-sparse mask for a fixed (n_q, n_kv, blocks) layout.

    ``mask_fn(row_ids, col_ids)`` must be a jnp-traceable elementwise
    predicate (True = visible).  Block occupancy is evaluated once with
    numpy at construction (O(n_q * n_kv) one-time host work, blockwise
    so peak memory is one block tile) and cached on the instance.
    """

    def __init__(
        self,
        mask_fn: MaskFn,
        n_q: int,
        n_kv: int,
        block_q: int,
        block_kv: int,
    ):
        if n_q % block_q or n_kv % block_kv:
            raise ValueError(
                f"({n_q},{n_kv}) not divisible by blocks ({block_q},{block_kv})"
            )
        self.mask_fn = mask_fn
        self.n_q, self.n_kv = n_q, n_kv
        self.block_q, self.block_kv = block_q, block_kv
        nqb, nkb = n_q // block_q, n_kv // block_kv

        occupancy = np.zeros((nqb, nkb), dtype=bool)
        rows = np.arange(block_q)
        cols = np.arange(block_kv)
        for i in range(nqb):
            r = (rows + i * block_q)[:, None]
            for j in range(nkb):
                c = (cols + j * block_kv)[None, :]
                occupancy[i, j] = bool(np.any(np.asarray(mask_fn(r, c))))
        self.occupancy = occupancy

        # Per-Q-block KV skip lists, padded by repeating the LAST valid
        # id (repeated index_map results elide the DMA; the kernel skips
        # compute via the count).  Q rows with no visible KV at all get
        # count 0 and id 0.
        self.q_counts = occupancy.sum(axis=1).astype(np.int32)
        self.max_kv = max(int(self.q_counts.max()), 1)
        kv_ids = np.zeros((nqb, self.max_kv), dtype=np.int32)
        for i in range(nqb):
            ids = np.nonzero(occupancy[i])[0]
            if len(ids):
                kv_ids[i, : len(ids)] = ids
                kv_ids[i, len(ids):] = ids[-1]
        self.kv_ids = kv_ids

        # Transposed lists for the dKdV backward (per KV block, which Q
        # blocks visit it).
        self.kv_counts = occupancy.sum(axis=0).astype(np.int32)
        self.max_q = max(int(self.kv_counts.max()), 1)
        q_ids = np.zeros((nkb, self.max_q), dtype=np.int32)
        for j in range(nkb):
            ids = np.nonzero(occupancy[:, j])[0]
            if len(ids):
                q_ids[j, : len(ids)] = ids
                q_ids[j, len(ids):] = ids[-1]
        self.q_ids = q_ids

    @property
    def density(self) -> float:
        return float(self.occupancy.mean())


def _mask_tile(mask_fn, i_ref, block_q, block_kv, q_idx, kv_id, s):
    """Evaluate the predicate on this (q_block, kv_block) tile."""
    row = (
        jax.lax.broadcasted_iota(jnp.int32, (s.shape[0], 1), 0)
        + q_idx * block_q
    )
    col = (
        jax.lax.broadcasted_iota(jnp.int32, (1, s.shape[1]), 1)
        + kv_id * block_kv
    )
    return jnp.broadcast_to(mask_fn(row, col), s.shape)


def _fwd_sparse_kernel(
    kvids_ref,
    kvcnt_ref,
    q_ref,
    k_ref,
    v_ref,
    o_ref,
    lse_ref,
    m_scratch,
    l_scratch,
    acc_scratch,
    *,
    mask_fn: MaskFn,
    sm_scale: float,
    block_q: int,
    block_kv: int,
    max_kv: int,
    save_lse: bool,
):
    q_idx = pl.program_id(2)
    step = pl.program_id(3)
    kv_id = kvids_ref[q_idx, step]
    cnt = kvcnt_ref[q_idx]

    @pl.when(step == 0)
    def _init():
        m_scratch[...] = jnp.full_like(m_scratch, -jnp.inf)
        l_scratch[...] = jnp.zeros_like(l_scratch)
        acc_scratch[...] = jnp.zeros_like(acc_scratch)

    @pl.when(step < cnt)
    def _body():
        q = q_ref[0, 0]
        qs = (q.astype(jnp.float32) * sm_scale).astype(q.dtype)
        k = k_ref[0, 0]
        v = v_ref[0, 0]
        s = mxu_dot_general(qs, k, (((1,), (1,)), ((), ())))
        visible = _mask_tile(mask_fn, None, block_q, block_kv, q_idx, kv_id, s)
        s = jnp.where(visible, s, DEFAULT_MASK_VALUE)

        m_prev = m_scratch[...]
        m_curr = jnp.max(s, axis=-1, keepdims=True)
        m_next = jnp.maximum(m_prev, m_curr)
        alpha = jnp.exp(m_prev - m_next)
        # Zero invisible entries explicitly: a row that is fully masked
        # in EVERY visited block has m == MASK_VALUE, making exp(s - m)
        # collapse to 1 — the where keeps such rows at l == 0 so the
        # epilogue emits (o=0, lse=-inf) like the oracle.
        p = jnp.where(visible, jnp.exp(s - m_next[:, :1]), 0.0)
        l_scratch[...] = alpha * l_scratch[...] + jnp.sum(
            p, axis=-1, keepdims=True
        )
        m_scratch[...] = m_next
        acc_scratch[...] *= alpha[:, :1]
        acc_scratch[...] += mxu_dot_general(p.astype(v.dtype), v, (((1,), (0,)), ((), ())))

    @pl.when(step == max_kv - 1)
    def _store():
        l = l_scratch[...][:, :1]
        l_inv = jnp.where(l == 0.0, 1.0, 1.0 / l)
        o_ref[0, 0, :, :] = (acc_scratch[...] * l_inv).astype(o_ref.dtype)
        if save_lse:
            m = m_scratch[...][:, :1]
            lse = jnp.where(
                l == 0.0,
                -jnp.inf,
                jnp.where(jnp.isneginf(m), -jnp.inf, m)
                + jnp.log(jnp.where(l == 0.0, 1.0, l)),
            )
            lse_ref[0, 0, :, :] = jnp.broadcast_to(lse, lse_ref.shape[2:])


def flash_attention_block_sparse_fwd(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    mask: BlockMask,
    *,
    sm_scale: Optional[float] = None,
    save_lse: bool = False,
    interpret: bool = False,
) -> Union[jax.Array, Tuple[jax.Array, jax.Array]]:
    """Forward flash attention under an arbitrary block-sparse mask.

    Compute and HBM traffic scale with ``mask.density``, not N^2:
    out-of-list grid steps clamp to a repeated KV block (DMA elided)
    and skip their compute.
    """
    batch, heads, n_q, head_dim = q.shape
    n_kv = k.shape[2]
    kv_heads = k.shape[1]
    if heads % kv_heads:
        raise ValueError(
            f"q heads ({heads}) must be a multiple of kv heads ({kv_heads})"
        )
    kv_group = heads // kv_heads
    if (n_q, n_kv) != (mask.n_q, mask.n_kv):
        raise ValueError(
            f"mask compiled for {(mask.n_q, mask.n_kv)}, inputs are "
            f"{(n_q, n_kv)}"
        )
    if sm_scale is None:
        sm_scale = default_scale(head_dim)
    bq, bkv = mask.block_q, mask.block_kv
    max_kv = mask.max_kv

    kv_ids = jnp.asarray(mask.kv_ids)
    kv_cnt = jnp.asarray(mask.q_counts)

    grid = (batch, heads, n_q // bq, max_kv)

    def kv_map(b, h, i, j, ids_ref, cnt_ref):
        # Out-of-list steps repeat the last valid id -> DMA elided.
        return (b, h // kv_group, ids_ref[i, j], 0)

    kernel = functools.partial(
        _fwd_sparse_kernel,
        mask_fn=mask.mask_fn,
        sm_scale=sm_scale,
        block_q=bq,
        block_kv=bkv,
        max_kv=max_kv,
        save_lse=save_lse,
    )
    if not save_lse:
        bound = kernel

        def kernel(ids_r, cnt_r, q_r, k_r, v_r, o_r, *rest):  # noqa: F811
            return bound(ids_r, cnt_r, q_r, k_r, v_r, o_r, None, *rest)

    out_shapes = [jax.ShapeDtypeStruct(q.shape, q.dtype)]
    out_specs = [
        pl.BlockSpec((1, 1, bq, head_dim), lambda b, h, i, j, *_: (b, h, i, 0))
    ]
    if save_lse:
        out_shapes.append(
            jax.ShapeDtypeStruct((batch, heads, n_q, NUM_LANES), jnp.float32)
        )
        out_specs.append(
            pl.BlockSpec(
                (1, 1, bq, NUM_LANES), lambda b, h, i, j, *_: (b, h, i, 0)
            )
        )

    flops = int(4 * batch * heads * n_q * n_kv * head_dim * mask.density)
    results = pl.pallas_call(
        kernel,
        out_shape=out_shapes,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=grid,
            in_specs=[
                pl.BlockSpec(
                    (1, 1, bq, head_dim), lambda b, h, i, j, *_: (b, h, i, 0)
                ),
                pl.BlockSpec((1, 1, bkv, head_dim), kv_map),
                pl.BlockSpec((1, 1, bkv, head_dim), kv_map),
            ],
            out_specs=out_specs,
            scratch_shapes=[
                pltpu.VMEM((bq, NUM_LANES), jnp.float32),
                pltpu.VMEM((bq, NUM_LANES), jnp.float32),
                pltpu.VMEM((bq, head_dim), jnp.float32),
            ],
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel", "arbitrary"),
            vmem_limit_bytes=32 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=max(flops, 1),
            bytes_accessed=(q.size + k.size + v.size + q.size)
            * q.dtype.itemsize,
            transcendentals=max(
                int(batch * heads * n_q * n_kv * mask.density), 1
            ),
        ),
        interpret=interpret,
    )(kv_ids, kv_cnt, q, k, v)
    if save_lse:
        return results[0], results[1]
    return results[0]


# ---------------------------------------------------------------------------
# Backward: the same skip lists drive the FA-2 decomposition — the dKdV
# kernel walks each KV block's Q list, the dQ kernel re-walks the Q
# blocks' KV lists.
# ---------------------------------------------------------------------------


def _dkv_sparse_kernel(
    qids_ref,
    qcnt_ref,
    q_ref,
    k_ref,
    v_ref,
    do_ref,
    lse_ref,
    delta_ref,
    dk_ref,
    dv_ref,
    dk_acc,
    dv_acc,
    *,
    mask_fn: MaskFn,
    sm_scale: float,
    block_q: int,
    block_kv: int,
    max_q: int,
):
    kv_idx = pl.program_id(2)
    step = pl.program_id(3)
    q_id = qids_ref[kv_idx, step]
    cnt = qcnt_ref[kv_idx]

    @pl.when(step == 0)
    def _init():
        dk_acc[...] = jnp.zeros_like(dk_acc)
        dv_acc[...] = jnp.zeros_like(dv_acc)

    @pl.when(step < cnt)
    def _body():
        q = q_ref[0, 0]
        k = k_ref[0, 0]
        v = v_ref[0, 0]
        do = do_ref[0, 0]
        lse = lse_ref[0, 0][:, :1]
        lse = jnp.where(jnp.isneginf(lse), 1e30, lse)
        delta = delta_ref[0, 0][:, :1]
        s = mxu_dot_general(q, k, (((1,), (1,)), ((), ())))
        p = jnp.exp(s * sm_scale - lse)
        visible = _mask_tile(mask_fn, None, block_q, block_kv, q_id, kv_idx, p)
        p = jnp.where(visible, p, 0.0)
        dv_acc[...] += mxu_dot_general(p.astype(do.dtype), do, (((0,), (0,)), ((), ())))
        dp = mxu_dot_general(do, v, (((1,), (1,)), ((), ())))
        ds = p * (dp - delta) * sm_scale
        dk_acc[...] += mxu_dot_general(ds.astype(q.dtype), q, (((0,), (0,)), ((), ())))

    @pl.when(step == max_q - 1)
    def _store():
        dk_ref[0, 0, :, :] = dk_acc[...].astype(dk_ref.dtype)
        dv_ref[0, 0, :, :] = dv_acc[...].astype(dv_ref.dtype)


def _dq_sparse_kernel(
    kvids_ref,
    kvcnt_ref,
    q_ref,
    k_ref,
    v_ref,
    do_ref,
    lse_ref,
    delta_ref,
    dq_ref,
    dq_acc,
    *,
    mask_fn: MaskFn,
    sm_scale: float,
    block_q: int,
    block_kv: int,
    max_kv: int,
):
    q_idx = pl.program_id(2)
    step = pl.program_id(3)
    kv_id = kvids_ref[q_idx, step]
    cnt = kvcnt_ref[q_idx]

    @pl.when(step == 0)
    def _init():
        dq_acc[...] = jnp.zeros_like(dq_acc)

    @pl.when(step < cnt)
    def _body():
        q = q_ref[0, 0]
        k = k_ref[0, 0]
        v = v_ref[0, 0]
        do = do_ref[0, 0]
        lse = lse_ref[0, 0][:, :1]
        lse = jnp.where(jnp.isneginf(lse), 1e30, lse)
        delta = delta_ref[0, 0][:, :1]
        s = mxu_dot_general(q, k, (((1,), (1,)), ((), ())))
        p = jnp.exp(s * sm_scale - lse)
        visible = _mask_tile(mask_fn, None, block_q, block_kv, q_idx, kv_id, p)
        p = jnp.where(visible, p, 0.0)
        dp = mxu_dot_general(do, v, (((1,), (1,)), ((), ())))
        ds = p * (dp - delta) * sm_scale
        dq_acc[...] += mxu_dot_general(ds.astype(k.dtype), k, (((1,), (0,)), ((), ())))

    @pl.when(step == max_kv - 1)
    def _store():
        dq_ref[0, 0, :, :] = dq_acc[...].astype(dq_ref.dtype)


def flash_attention_block_sparse_bwd(
    q, k, v, o, do, lse_lanes, mask: BlockMask, *,
    sm_scale: Optional[float] = None, interpret: bool = False,
):
    """(dQ, dK, dV) under the block-sparse mask (equal head counts)."""
    batch, heads, n_q, head_dim = q.shape
    n_kv = k.shape[2]
    if k.shape[1] != heads:
        raise ValueError("broadcast KV heads before the sparse backward")
    if sm_scale is None:
        sm_scale = default_scale(head_dim)
    bq, bkv = mask.block_q, mask.block_kv

    delta = jnp.sum(
        o.astype(jnp.float32) * do.astype(jnp.float32), axis=-1, keepdims=True
    )
    delta_lanes = jnp.broadcast_to(delta, (*delta.shape[:-1], NUM_LANES))

    q_ids = jnp.asarray(mask.q_ids)
    q_cnt = jnp.asarray(mask.kv_counts)

    def q_map(b, h, j, i, ids_ref, cnt_ref):
        return (b, h, ids_ref[j, i], 0)

    dkv_kernel = functools.partial(
        _dkv_sparse_kernel,
        mask_fn=mask.mask_fn,
        sm_scale=sm_scale,
        block_q=bq,
        block_kv=bkv,
        max_q=mask.max_q,
    )
    dk, dv = pl.pallas_call(
        dkv_kernel,
        out_shape=[
            jax.ShapeDtypeStruct(k.shape, k.dtype),
            jax.ShapeDtypeStruct(v.shape, v.dtype),
        ],
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(batch, heads, n_kv // bkv, mask.max_q),
            in_specs=[
                pl.BlockSpec((1, 1, bq, head_dim), q_map),
                pl.BlockSpec(
                    (1, 1, bkv, head_dim), lambda b, h, j, i, *_: (b, h, j, 0)
                ),
                pl.BlockSpec(
                    (1, 1, bkv, head_dim), lambda b, h, j, i, *_: (b, h, j, 0)
                ),
                pl.BlockSpec((1, 1, bq, head_dim), q_map),
                pl.BlockSpec((1, 1, bq, NUM_LANES), q_map),
                pl.BlockSpec((1, 1, bq, NUM_LANES), q_map),
            ],
            out_specs=[
                pl.BlockSpec(
                    (1, 1, bkv, head_dim), lambda b, h, j, i, *_: (b, h, j, 0)
                ),
                pl.BlockSpec(
                    (1, 1, bkv, head_dim), lambda b, h, j, i, *_: (b, h, j, 0)
                ),
            ],
            scratch_shapes=[
                pltpu.VMEM((bkv, head_dim), jnp.float32),
                pltpu.VMEM((bkv, head_dim), jnp.float32),
            ],
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(q_ids, q_cnt, q, k, v, do, lse_lanes, delta_lanes)

    kv_ids = jnp.asarray(mask.kv_ids)
    kv_cnt = jnp.asarray(mask.q_counts)

    def kv_map(b, h, i, j, ids_ref, cnt_ref):
        return (b, h, ids_ref[i, j], 0)

    dq_kernel = functools.partial(
        _dq_sparse_kernel,
        mask_fn=mask.mask_fn,
        sm_scale=sm_scale,
        block_q=bq,
        block_kv=bkv,
        max_kv=mask.max_kv,
    )
    dq = pl.pallas_call(
        dq_kernel,
        out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(batch, heads, n_q // bq, mask.max_kv),
            in_specs=[
                pl.BlockSpec(
                    (1, 1, bq, head_dim), lambda b, h, i, j, *_: (b, h, i, 0)
                ),
                pl.BlockSpec((1, 1, bkv, head_dim), kv_map),
                pl.BlockSpec((1, 1, bkv, head_dim), kv_map),
                pl.BlockSpec(
                    (1, 1, bq, head_dim), lambda b, h, i, j, *_: (b, h, i, 0)
                ),
                pl.BlockSpec(
                    (1, 1, bq, NUM_LANES), lambda b, h, i, j, *_: (b, h, i, 0)
                ),
                pl.BlockSpec(
                    (1, 1, bq, NUM_LANES), lambda b, h, i, j, *_: (b, h, i, 0)
                ),
            ],
            out_specs=pl.BlockSpec(
                (1, 1, bq, head_dim), lambda b, h, i, j, *_: (b, h, i, 0)
            ),
            scratch_shapes=[pltpu.VMEM((bq, head_dim), jnp.float32)],
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(kv_ids, kv_cnt, q, k, v, do, lse_lanes, delta_lanes)

    return dq, dk, dv


# ---------------------------------------------------------------------------
# Differentiable public entry
# ---------------------------------------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def flash_attention_block_sparse(q, k, v, mask, sm_scale, interpret):
    """Differentiable block-sparse flash attention.

    ``mask``: a ``BlockMask``.  GQA is supported by logical KV broadcast
    in the backward (forward folds heads natively).
    """
    return flash_attention_block_sparse_fwd(
        q, k, v, mask, sm_scale=sm_scale, interpret=interpret
    )


def _sparse_fwd_rule(q, k, v, mask, sm_scale, interpret):
    o, lse_lanes = flash_attention_block_sparse_fwd(
        q, k, v, mask, sm_scale=sm_scale, save_lse=True, interpret=interpret
    )
    return o, (q, k, v, o, lse_lanes)


def _sparse_bwd_rule(mask, sm_scale, interpret, res, do):
    q, k, v, o, lse_lanes = res
    h_q, h_kv = q.shape[1], k.shape[1]
    reps = h_q // h_kv
    kb = jnp.repeat(k, reps, axis=1) if reps > 1 else k
    vb = jnp.repeat(v, reps, axis=1) if reps > 1 else v
    dq, dk, dv = flash_attention_block_sparse_bwd(
        q, kb, vb, o, do, lse_lanes, mask,
        sm_scale=sm_scale, interpret=interpret,
    )
    if reps > 1:
        b, _, n, d = dk.shape
        dk = dk.reshape(b, h_kv, reps, n, d).sum(axis=2).astype(k.dtype)
        dv = dv.reshape(b, h_kv, reps, n, d).sum(axis=2).astype(v.dtype)
    return dq, dk, dv


flash_attention_block_sparse.defvjp(_sparse_fwd_rule, _sparse_bwd_rule)


def block_sparse_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    mask: BlockMask,
    *,
    sm_scale: Optional[float] = None,
    interpret: Optional[bool] = None,
) -> jax.Array:
    """Keyword-friendly front door for ``flash_attention_block_sparse``
    (the custom-vjp op takes its nondiff args positionally)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    return flash_attention_block_sparse(q, k, v, mask, sm_scale, interpret)
