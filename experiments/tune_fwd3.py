"""Causal-path variants: exp2 softmax + index_map clamping for skipped blocks.

Run: timeout 590 env PYTHONPATH=/root/repo:/root/.axon_site python experiments/tune_fwd3.py
"""

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from flash_attention_metal_tpu.kernels import flash_attention_fwd
from flash_attention_metal_tpu.reference import attention_reference, make_qkv
from flash_attention_metal_tpu.utils import attention_flops
from flash_attention_metal_tpu.utils.timing import measure_compiled

B, H, N, D = 16, 8, 2048, 64
BQ = BK = 1024
LOG2E = math.log2(math.e)


def bench(label, fn, args, flops, iters=14):
    t = measure_compiled(fn, args, iters=iters)["median_s"]
    print(f"{label:48s} {t*1e3:8.3f} ms  {flops/t/1e12:6.1f} TF/s", flush=True)
    return t


def make_kernel(use_exp2, clamp):
    scale = (1.0 / math.sqrt(D)) * (LOG2E if use_exp2 else 1.0)
    fexp = jnp.exp2 if use_exp2 else jnp.exp

    def kern(q_ref, k_ref, v_ref, o_ref, m_s, l_s, acc_s):
        q_idx, kv = pl.program_id(2), pl.program_id(3)

        @pl.when(kv == 0)
        def _():
            m_s[...] = jnp.full_like(m_s, -jnp.inf)
            l_s[...] = jnp.zeros_like(l_s)
            acc_s[...] = jnp.zeros_like(acc_s)

        should_run = (q_idx + 1) * BQ - 1 >= kv * BK

        @pl.when(should_run)
        def _():
            q = q_ref[0, 0]
            q = (q.astype(jnp.float32) * scale).astype(q.dtype)
            k = k_ref[0, 0]
            v = v_ref[0, 0]
            s = jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            row = jax.lax.broadcasted_iota(jnp.int32, s.shape, 0) + q_idx * BQ
            col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) + kv * BK
            s = jnp.where(col <= row, s, -1e30)
            m_prev = m_s[...]
            l_prev = l_s[...]
            m_curr = jnp.max(s, axis=-1, keepdims=True)
            m_next = jnp.maximum(m_prev, m_curr)
            alpha = fexp(m_prev - m_next)
            p = fexp(s - m_next[:, :1])
            l_s[...] = alpha * l_prev + jnp.sum(p, axis=-1, keepdims=True)
            m_s[...] = m_next
            acc_s[...] *= alpha[:, :1]
            acc_s[...] += jax.lax.dot_general(
                p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)

        @pl.when(kv == pl.num_programs(3) - 1)
        def _():
            l = l_s[...][:, :1]
            o_ref[0, 0] = (acc_s[...] / l).astype(o_ref.dtype)

    if clamp:
        # Steps above the diagonal re-reference the diagonal block: the
        # pipeline elides the HBM->VMEM DMA when indices repeat.
        def kv_map(b, h, i, j):
            return (b, h, jnp.minimum(j, ((i + 1) * BQ - 1) // BK), 0)
    else:
        def kv_map(b, h, i, j):
            return (b, h, j, 0)

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
                    pl.BlockSpec((1, 1, BK, D), kv_map),
                    pl.BlockSpec((1, 1, BK, D), kv_map),
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
    flops = attention_flops(B, H, N, N, D, causal=True)

    # correctness spot check
    want = attention_reference(
        q.astype(jnp.float32), k.astype(jnp.float32), v.astype(jnp.float32),
        causal=True)[:2, :2]
    for use_exp2 in (False, True):
        for clamp in (False, True):
            fn = make_kernel(use_exp2, clamp)
            got = fn(q, k, v)[:2, :2].astype(jnp.float32)
            err = float(jnp.max(jnp.abs(got - want)))
            assert err < 1e-2, (use_exp2, clamp, err)
            bench(f"exp2={use_exp2} clamp={clamp} (err {err:.1e})",
                  fn, (q, k, v), flops)

    bench("prod causal (baseline)",
          functools.partial(flash_attention_fwd, causal=True),
          (q, k, v), flops)


if __name__ == "__main__":
    main()
