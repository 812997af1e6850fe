"""Round-5 experiment 5: transposed-output PV — widen the narrow matmul.

experiments/mxu_rates.py measured the *output-width-64* matmuls as the
slow class (pv_256 [256,256]x[256,64]: 77 TF/s = 39% of dense peak;
dv_2048: 60 TF/s) while contraction-64/wide-output QK^T shapes run at
149-156 TF/s (76-79%).  A [M, 64] output wastes half of every 128-lane
vreg write; the D/128 "width cap" in the roofline model was attributed
to the wrong dimension.

The fix candidate: compute PV TRANSPOSED — o^T = V^T P^T via
dot_general dimension numbers (no materialized transpose), giving a
[64, block_q] WIDE output; the accumulator lives transposed, the
softmax rescale applies per-column, and the kernel stores o^T (the
wrapper transposes in XLA outside, an O(N*D) pass).

Variants (paired vs production tri 256x256, B16 H8 N2048 D64 bf16):
  pvt_pure   matmul chain only, PV transposed (vs pure ~1000 us)
  pvt_full   full online-softmax tri kernel, PV transposed (vs ~1124 us)

Usage: timeout 590 env PYTHONPATH=/root/repo:/root/.axon_site python experiments/tri_pvt.py
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
from flash_attention_metal_tpu.kernels.flash_tri import flash_attention_tri
from flash_attention_metal_tpu.reference import make_qkv
from flash_attention_metal_tpu.utils.comp_cache import enable_compilation_cache
from flash_attention_metal_tpu.utils.timing import measure_kernel_pair

_LOG2E = math.log2(math.e)


def _pvt_kernel(q_ref, k_ref, v_ref, ot_ref, *, sm_scale, block_q,
                block_k, n_q, n_kv, q_offset, softmax):
    """Tri kernel with transposed PV accumulation: ot [1, 1, D, n_q]."""
    for i in range(n_q // block_q):
        last_visible = i * block_q + block_q - 1 + q_offset
        ext = min(n_kv, last_visible + 1)
        cols_out = slice(i * block_q, (i + 1) * block_q)
        if ext <= 0:
            ot_ref[0, 0, :, cols_out] = jnp.zeros(
                (ot_ref.shape[2], block_q), ot_ref.dtype
            )
            continue
        n_tiles = -(-ext // block_k)
        q = q_ref[0, 0, cols_out, :]
        q = (q.astype(jnp.float32) * (sm_scale * _LOG2E)).astype(q.dtype)
        m = None
        l = None
        accT = None  # [D, block_q]
        for j in range(n_tiles):
            c0 = j * block_k
            bk = min(block_k, n_kv - c0)
            k = k_ref[0, 0, c0 : c0 + bk, :]
            v = v_ref[0, 0, c0 : c0 + bk, :]
            s = mxu_dot_general(q, k, (((1,), (1,)), ((), ())))
            if c0 + bk - 1 > i * block_q + q_offset:
                row = (
                    jax.lax.broadcasted_iota(jnp.int32, (block_q, 1), 0)
                    + i * block_q
                    + q_offset
                )
                col = jax.lax.broadcasted_iota(jnp.int32, (1, bk), 1) + c0
                s = jnp.where(col <= row, s, DEFAULT_MASK_VALUE)
            if not softmax:
                p = s * 1e-4
                # o^T += V^T P^T: contract v rows with p columns -> [D, bq]
                pvT = mxu_dot_general(
                    v, p.astype(v.dtype), (((0,), (1,)), ((), ()))
                )
                accT = pvT if accT is None else accT + pvT
                continue
            if m is None:
                m_curr = jnp.max(s, axis=-1, keepdims=True)
                p = jnp.exp2(s - m_curr)
                pvT = mxu_dot_general(
                    v, p.astype(v.dtype), (((0,), (1,)), ((), ()))
                )
                l = jnp.sum(p, axis=-1, keepdims=True)
                accT = pvT
                m = m_curr
            else:
                p = jnp.exp2(jnp.minimum(s - m[:, :1], 96.0))
                pvT = mxu_dot_general(
                    v, p.astype(v.dtype), (((0,), (1,)), ((), ()))
                )
                m_curr = jnp.max(s, axis=-1, keepdims=True)
                m_next = jnp.maximum(m, m_curr)
                alpha = jnp.exp2(m - m_next)
                l = (l + jnp.sum(p, axis=-1, keepdims=True)) * alpha
                # Column-wise rescale of the transposed accumulator.
                accT = (accT + pvT) * alpha[:, 0][None, :]
                m = m_next
        if softmax:
            l_inv = jnp.where(l == 0.0, 1.0, 1.0 / l)
            accT = accT * l_inv[:, 0][None, :]
        ot_ref[0, 0, :, cols_out] = accT.astype(ot_ref.dtype)


def _call_pvt(q, k, v, *, softmax, block_q=256, block_k=256):
    batch, heads, n_q, head_dim = q.shape
    n_kv = k.shape[2]
    kernel = functools.partial(
        _pvt_kernel, sm_scale=default_scale(head_dim), block_q=block_q,
        block_k=block_k, n_q=n_q, n_kv=n_kv, q_offset=0, softmax=softmax,
    )
    spec = lambda n: pl.BlockSpec(
        (1, 1, n, head_dim), lambda b, h: (b, h, 0, 0)
    )
    ot = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(
            (batch, heads, head_dim, n_q), q.dtype
        ),
        grid=(batch, heads),
        in_specs=[spec(n_q), spec(n_kv), spec(n_kv)],
        out_specs=pl.BlockSpec(
            (1, 1, head_dim, n_q), lambda b, h: (b, h, 0, 0)
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
            vmem_limit_bytes=96 * 1024 * 1024,
        ),
    )(q, k, v)
    return ot.swapaxes(-1, -2)


def main():
    enable_compilation_cache()
    B, H, N, D = 16, 8, 2048, 64
    q, k, v = make_qkv(jax.random.PRNGKey(0), (B, H, N, D), dtype=jnp.bfloat16)
    base = functools.partial(flash_attention_tri, block_q=256, block_k=256)

    o_ref = base(q[:1], k[:1], v[:1])
    o_pvt = _call_pvt(q[:1], k[:1], v[:1], softmax=True)
    diff = float(jnp.max(jnp.abs(
        o_pvt.astype(jnp.float32) - o_ref.astype(jnp.float32))))
    print(f"pvt_full vs tri max diff: {diff:.3e}")
    assert diff < 2e-2, diff

    results = {}
    for name, fn in {
        "pvt_pure": functools.partial(_call_pvt, softmax=False),
        "pvt_full": functools.partial(_call_pvt, softmax=True),
        "pvt_full_bq512": functools.partial(
            _call_pvt, softmax=True, block_q=512, block_k=512
        ),
    }.items():
        r = measure_kernel_pair(
            base, (q, k, v), fn, (q, k, v), iters=10, inner_hi=5, repeats=3,
        )
        results[name] = {"tri_us": r["a_s"] * 1e6, "var_us": r["b_s"] * 1e6}
        print(
            f"{name}: tri {r['a_s']*1e6:.1f} us vs {r['b_s']*1e6:.1f} us "
            f"(tri/var {r['ratio']:.3f})"
        )

    with open("experiments/tri_pvt.json", "w") as f:
        json.dump(results, f, indent=2)
    print("wrote experiments/tri_pvt.json")


if __name__ == "__main__":
    main()
