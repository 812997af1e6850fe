"""K1 — naive O(N^2) attention baseline as a Pallas kernel.

TPU-native re-design of the reference's ``naive_attention_kernel``
(``kernels.metal:12-64``): full score row, two-pass safe softmax (pass 1
row max ``kernels.metal:35-42``, pass 2 exp + weighted V ``kernels.metal:
44-58``), no tiling of the KV axis, no online statistics.  Where the Metal
kernel assigns one *thread* per query row with a 64-float register
accumulator, the TPU kernel assigns one *grid step* per (batch, head,
Q-block) and materializes the full ``(block_q, N_kv)`` score tile in VMEM —
the entire K and V for the head are staged into VMEM every Q block, which
is exactly the O(N^2) HBM traffic that makes this the baseline to beat.

This rung exists to anchor the verification ladder and the speedup metric
(reference speedups are all "vs naive", ``main.mm:862-865``).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..config import DEFAULT_MASK_VALUE, default_scale
from ._common import mxu_precision


def _naive_kernel(q_ref, k_ref, v_ref, o_ref, *, sm_scale: float, causal: bool):
    # Block shapes: q (1, 1, block_q, D); k/v (1, 1, N_kv, D).
    q = q_ref[0, 0].astype(jnp.float32)
    k = k_ref[0, 0].astype(jnp.float32)
    v = v_ref[0, 0].astype(jnp.float32)

    s = jax.lax.dot_general(
        q,
        k,
        (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=mxu_precision(q.dtype),
    )
    s = s * sm_scale

    if causal:
        block_q = q.shape[0]
        n_kv = k.shape[0]
        q_blk = pl.program_id(2)
        n_q = pl.num_programs(2) * block_q
        # End-aligned diagonal (decode convention), matching the oracle.
        row = (
            jax.lax.broadcasted_iota(jnp.int32, s.shape, 0)
            + q_blk * block_q
            + (n_kv - n_q)
        )
        col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        s = jnp.where(col <= row, s, DEFAULT_MASK_VALUE)

    # Two-pass softmax (the naive kernel's defining trait).
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    l = jnp.sum(p, axis=-1, keepdims=True)
    o = (
        jnp.dot(
            p, v,
            preferred_element_type=jnp.float32,
            precision=mxu_precision(v.dtype),
        )
        / l
    )
    o_ref[0, 0, :, :] = o.astype(o_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("sm_scale", "causal", "block_q", "interpret")
)
def naive_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    *,
    sm_scale: Optional[float] = None,
    causal: bool = False,
    block_q: int = 128,
    interpret: bool = False,
) -> jax.Array:
    """Naive attention over ``[B, H, N, D]`` inputs."""
    batch, heads, n_q, head_dim = q.shape
    n_kv = k.shape[2]
    if sm_scale is None:
        sm_scale = default_scale(head_dim)
    block_q = min(block_q, n_q)
    if n_q % block_q != 0:
        raise ValueError(f"n_q={n_q} must be divisible by block_q={block_q}")

    grid = (batch, heads, n_q // block_q)
    kernel = functools.partial(_naive_kernel, sm_scale=sm_scale, causal=causal)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (1, 1, block_q, head_dim), lambda b, h, i: (b, h, i, 0)
            ),
            pl.BlockSpec((1, 1, n_kv, head_dim), lambda b, h, i: (b, h, 0, 0)),
            pl.BlockSpec((1, 1, n_kv, head_dim), lambda b, h, i: (b, h, 0, 0)),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, block_q, head_dim), lambda b, h, i: (b, h, i, 0)
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * batch * heads * n_q * n_kv * head_dim,
            bytes_accessed=(
                q.size * q.dtype.itemsize
                + (n_q // block_q) * (k.size + v.size) * k.dtype.itemsize
            ),
            transcendentals=batch * heads * n_q * n_kv,
        ),
        interpret=interpret,
    )(q, k, v)
