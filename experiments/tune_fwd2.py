"""Decompose the forward-kernel time: MXU floor, exp cost, mask cost.

Run: timeout 590 env PYTHONPATH=/root/repo:/root/.axon_site python experiments/tune_fwd2.py
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from flash_attention_metal_tpu.kernels import flash_attention_fwd
from flash_attention_metal_tpu.reference import make_qkv
from flash_attention_metal_tpu.utils import attention_flops
from flash_attention_metal_tpu.utils.timing import measure_compiled

B, H, N, D = 16, 8, 2048, 64
BQ = BK = 1024


def bench(label, fn, args, flops, iters=14):
    t = measure_compiled(fn, args, iters=iters)["median_s"]
    print(f"{label:48s} {t*1e3:8.3f} ms  {flops/t/1e12:6.1f} TF/s", flush=True)
    return t


def make_kernel(mode):
    """mode: matmul_only | exp_only | full_nomask | full_mask | full_exp2"""

    def kern(q_ref, k_ref, v_ref, o_ref, m_s, l_s, acc_s):
        q_idx, kv = pl.program_id(2), pl.program_id(3)

        @pl.when(kv == 0)
        def _():
            m_s[...] = jnp.full_like(m_s, -jnp.inf)
            l_s[...] = jnp.zeros_like(l_s)
            acc_s[...] = jnp.zeros_like(acc_s)

        q = q_ref[0, 0]
        k = k_ref[0, 0]
        v = v_ref[0, 0]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        if mode == "matmul_only":
            p = s.astype(v.dtype)
            acc_s[...] += jax.lax.dot_general(
                p, v, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
        elif mode == "exp_only":
            p = jnp.exp(s)
            acc_s[...] += jax.lax.dot_general(
                p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
        else:
            if mode == "full_mask":
                row = jax.lax.broadcasted_iota(jnp.int32, s.shape, 0) + q_idx * BQ
                col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) + kv * BK
                s = jnp.where(col <= row, s, -1e30)
            m_prev = m_s[...]
            l_prev = l_s[...]
            m_curr = jnp.max(s, axis=-1, keepdims=True)
            m_next = jnp.maximum(m_prev, m_curr)
            if mode == "full_exp2":
                alpha = jnp.exp2(m_prev - m_next)
                p = jnp.exp2(s - m_next[:, :1])
            else:
                alpha = jnp.exp(m_prev - m_next)
                p = jnp.exp(s - m_next[:, :1])
            l_s[...] = alpha * l_prev + jnp.sum(p, axis=-1, keepdims=True)
            m_s[...] = m_next
            acc_s[...] *= alpha[:, :1]
            acc_s[...] += jax.lax.dot_general(
                p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)

        @pl.when(kv == pl.num_programs(3) - 1)
        def _():
            o_ref[0, 0] = acc_s[...].astype(o_ref.dtype)

    @jax.jit
    def run(q, k, v):
        grid = (B, H, N // BQ, N // BK)
        return pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=0,
                grid=grid,
                in_specs=[
                    pl.BlockSpec((1, 1, BQ, D), lambda b, h, i, j: (b, h, i, 0)),
                    pl.BlockSpec((1, 1, BK, D), lambda b, h, i, j: (b, h, j, 0)),
                    pl.BlockSpec((1, 1, BK, D), lambda b, h, i, j: (b, h, j, 0)),
                ],
                out_specs=pl.BlockSpec(
                    (1, 1, BQ, D), lambda b, h, i, j: (b, h, i, 0)),
                scratch_shapes=[
                    pltpu.VMEM((BQ, 128), jnp.float32),
                    pltpu.VMEM((BQ, 128), jnp.float32),
                    pltpu.VMEM((BQ, D), jnp.float32),
                ],
            ),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel", "parallel", "arbitrary"),
                vmem_limit_bytes=32 * 1024 * 1024,
            ),
        )(q, k, v)

    return run


def main():
    q, k, v = make_qkv(jax.random.PRNGKey(7), (B, H, N, D), dtype=jnp.bfloat16)
    flops = attention_flops(B, H, N, N, D, causal=False)
    for mode in ("matmul_only", "exp_only", "full_nomask", "full_mask",
                 "full_exp2"):
        bench(mode, make_kernel(mode), (q, k, v), flops)
    # production kernel, non-causal, for comparison
    bench("prod non-causal",
          functools.partial(flash_attention_fwd, causal=False),
          (q, k, v), flops)


if __name__ == "__main__":
    main()
