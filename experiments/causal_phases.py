"""Round-4 experiment: per-phase cost model of the triangular causal kernel.

The tri kernel (kernels/flash_tri.py) lifted mid-N causal from 45-50% to
~50-70% of the D/128 roofline, but N=1024 sits near 50%.  This measures
WHERE the non-MXU time goes, with paired readings of kernel variants that
differ in exactly one phase:

  full     the production tri kernel (exp2 online softmax, masking)
  noexp    same tiles/matmuls/masking, but P = S (no max/exp2/sum/rescale)
           -> isolates the VPU softmax term
  nomask   full softmax but no diagonal compare/select
           -> isolates the masking term

Model: t_full ~= t_mxu + t_softmax + t_mask + floor, where
t_mxu ~= t_noexp - t_mask.  The VPU exp2+reduce throughput is ~1 elem/
lane/cycle, the MXU at D=64 runs at half width — both scale with the
visible area, so their RATIO is shape-independent and the un-overlapped
VPU fraction is a ceiling on mid-N causal roofline.

Usage: timeout 590 python experiments/causal_phases.py
"""

import functools
import json
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from flash_attention_metal_tpu.config import DEFAULT_MASK_VALUE, default_scale
from flash_attention_metal_tpu.kernels._common import mxu_dot_general
from flash_attention_metal_tpu.kernels.flash_tri import _tri_fold
from flash_attention_metal_tpu.reference import make_qkv
from flash_attention_metal_tpu.utils.comp_cache import enable_compilation_cache
from flash_attention_metal_tpu.utils.timing import measure_kernel_pair

_LOG2E = math.log2(math.e)


def _variant_kernel(q_ref, k_ref, v_ref, o_ref, *, sm_scale, block_q,
                    block_k, n_q, n_kv, q_offset, fold, softmax, mask):
    """Mirror of flash_tri._tri_kernel with the softmax / mask phases
    individually removable (measurement-only; not a production path)."""
    for f in range(fold):
        for i in range(n_q // block_q):
            last_visible = i * block_q + block_q - 1 + q_offset
            ext = min(n_kv, last_visible + 1)
            if ext <= 0:
                o_ref[f, 0, i * block_q : (i + 1) * block_q, :] = jnp.zeros(
                    (block_q, o_ref.shape[-1]), o_ref.dtype
                )
                continue
            n_tiles = -(-ext // block_k)
            q = q_ref[f, 0, i * block_q : (i + 1) * block_q, :]
            q = (q.astype(jnp.float32) * (sm_scale * _LOG2E)).astype(q.dtype)
            m = None
            l = None
            acc = None
            for j in range(n_tiles):
                c0 = j * block_k
                bk = min(block_k, n_kv - c0)
                k = k_ref[f, 0, c0 : c0 + bk, :]
                v = v_ref[f, 0, c0 : c0 + bk, :]
                s = mxu_dot_general(q, k, (((1,), (1,)), ((), ())))
                if mask and c0 + bk - 1 > i * block_q + q_offset:
                    row = (
                        jax.lax.broadcasted_iota(jnp.int32, (block_q, 1), 0)
                        + i * block_q
                        + q_offset
                    )
                    col = (
                        jax.lax.broadcasted_iota(jnp.int32, (1, bk), 1) + c0
                    )
                    s = jnp.where(col <= row, s, DEFAULT_MASK_VALUE)
                if not softmax:
                    pv = mxu_dot_general(
                        (s * 1e-4).astype(v.dtype), v, (((1,), (0,)), ((), ()))
                    )
                    acc = pv if acc is None else acc + pv
                    continue
                if m is None:
                    m_curr = jnp.max(s, axis=-1, keepdims=True)
                    p = jnp.exp2(s - m_curr)
                    pv = mxu_dot_general(
                        p.astype(v.dtype), v, (((1,), (0,)), ((), ()))
                    )
                    l = jnp.sum(p, axis=-1, keepdims=True)
                    acc = pv
                    m = m_curr
                else:
                    p = jnp.exp2(jnp.minimum(s - m[:, :1], 96.0))
                    pv = mxu_dot_general(
                        p.astype(v.dtype), v, (((1,), (0,)), ((), ()))
                    )
                    m_curr = jnp.max(s, axis=-1, keepdims=True)
                    m_next = jnp.maximum(m, m_curr)
                    alpha = jnp.exp2(m - m_next)
                    l = (l + jnp.sum(p, axis=-1, keepdims=True)) * alpha
                    acc = (acc + pv) * alpha[:, :1]
                    m = m_next
            if softmax:
                l_inv = jnp.where(l == 0.0, 1.0, 1.0 / l)
                out = (acc * l_inv).astype(o_ref.dtype)
            else:
                out = acc.astype(o_ref.dtype)
            o_ref[f, 0, i * block_q : (i + 1) * block_q, :] = out


@functools.partial(
    jax.jit, static_argnames=("block_q", "block_k", "softmax", "mask")
)
def tri_variant(q, k, v, *, block_q=256, block_k=256, softmax=True,
                mask=True):
    batch, heads, n_q, head_dim = q.shape
    n_kv = k.shape[2]
    fold = _tri_fold(batch, n_q, n_kv, head_dim)
    if batch % fold:
        fold = 1
    kernel = functools.partial(
        _variant_kernel,
        sm_scale=default_scale(head_dim),
        block_q=min(block_q, n_q),
        block_k=min(block_k, n_kv),
        n_q=n_q,
        n_kv=n_kv,
        q_offset=n_kv - n_q,
        fold=fold,
        softmax=softmax,
        mask=mask,
    )
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
        grid=(batch // fold, heads),
        in_specs=[
            pl.BlockSpec((fold, 1, n_q, head_dim), lambda b, h: (b, h, 0, 0)),
            pl.BlockSpec((fold, 1, n_kv, head_dim), lambda b, h: (b, h, 0, 0)),
            pl.BlockSpec((fold, 1, n_kv, head_dim), lambda b, h: (b, h, 0, 0)),
        ],
        out_specs=pl.BlockSpec(
            (fold, 1, n_q, head_dim), lambda b, h: (b, h, 0, 0)
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
    )(q, k, v)


def main():
    enable_compilation_cache()
    out = {}
    for (b, n) in [(2, 1024), (1, 2048), (16, 2048), (1, 4096)]:
        h = 8 if b == 16 else 1
        q, k, v = make_qkv(
            jax.random.PRNGKey(0), (b, h, n, 64), dtype=jnp.bfloat16
        )
        full = functools.partial(tri_variant, softmax=True, mask=True)
        noexp = functools.partial(tri_variant, softmax=False, mask=True)
        nomask = functools.partial(tri_variant, softmax=True, mask=False)
        r1 = measure_kernel_pair(full, (q, k, v), noexp, (q, k, v), repeats=7)
        r2 = measure_kernel_pair(full, (q, k, v), nomask, (q, k, v), repeats=7)
        key = f"b{b}h{h}n{n}"
        out[key] = {
            "full_us": r1["a_s"] * 1e6,
            "noexp_us": r1["b_s"] * 1e6,
            "nomask_us": r2["b_s"] * 1e6,
            "softmax_share": 1 - r1["b_s"] / r1["a_s"],
            "mask_share": 1 - r2["b_s"] / r2["a_s"],
        }
        print(key, {k2: round(v2, 3) for k2, v2 in out[key].items()})
    json.dump(out, open("experiments/causal_phases.json", "w"), indent=2)


if __name__ == "__main__":
    main()
