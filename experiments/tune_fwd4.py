"""Lagged-base online softmax: break the max-reduce -> exp dependency.

Instead of p = exp2(s - max(m_prev, max(s))), use the PREVIOUS block's
base b: p = exp2(clamp(s - b)); after PV, rebase acc/l by
exp2(b - b_new) with b_new = max(b, max(s)).  max(s) computes in
parallel with PV instead of serializing before exp.

Run: timeout 590 env PYTHONPATH=/root/repo:/root/.axon_site python experiments/tune_fwd4.py
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
from flash_attention_metal_tpu.utils.timing import measure_kernel_stable

LOG2E = math.log2(math.e)
SCALE = 0.125 * LOG2E
CLAMP = 96.0  # exp2 argument ceiling: keeps p, l, acc finite in f32


def make_kernel(B, H, N, BQ, BK, lazy, clamp):
    def kern(q_ref, k_ref, v_ref, o_ref, b_s, l_s, acc_s):
        q_idx, kv = pl.program_id(2), pl.program_id(3)

        @pl.when(kv == 0)
        def _():
            # Base starts at 0 (safe for |scores| < CLAMP); true max takes
            # over after the first executed block.
            b_s[...] = jnp.zeros_like(b_s)
            l_s[...] = jnp.zeros_like(l_s)
            acc_s[...] = jnp.zeros_like(acc_s)

        should_run = (q_idx + 1) * BQ - 1 >= kv * BK

        @pl.when(should_run)
        def _():
            q = q_ref[0, 0]
            q = (q.astype(jnp.float32) * SCALE).astype(q.dtype)
            k = k_ref[0, 0]
            v = v_ref[0, 0]
            s = jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            row = jax.lax.broadcasted_iota(jnp.int32, s.shape, 0) + q_idx * BQ
            col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) + kv * BK
            s = jnp.where(col <= row, s, -1e30)
            if lazy:
                b_prev = b_s[...]
                e = s - b_prev[:, :1]
                if clamp:
                    e = jnp.minimum(e, CLAMP)
                p = jnp.exp2(e)          # no reduce in the way
                pv = jax.lax.dot_general(
                    p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                m_curr = jnp.max(s, axis=-1, keepdims=True)  # overlaps PV
                b_next = jnp.maximum(b_prev, m_curr)
                alpha = jnp.exp2(b_prev - b_next)
                l_s[...] = (l_s[...] + jnp.sum(p, axis=-1, keepdims=True)) * alpha
                acc_s[...] = (acc_s[...] + pv) * alpha[:, :1]
                b_s[...] = b_next
            else:
                m_prev = b_s[...]
                m_curr = jnp.max(s, axis=-1, keepdims=True)
                m_next = jnp.maximum(m_prev, m_curr)
                alpha = jnp.exp2(m_prev - m_next)
                p = jnp.exp2(s - m_next[:, :1])
                l_s[...] = alpha * l_s[...] + jnp.sum(p, axis=-1, keepdims=True)
                b_s[...] = m_next
                acc_s[...] *= alpha[:, :1]
                acc_s[...] += jax.lax.dot_general(
                    p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)

        @pl.when(kv == pl.num_programs(3) - 1)
        def _():
            l = l_s[...][:, :1]
            o_ref[0, 0] = (acc_s[...] / l).astype(o_ref.dtype)

    def kv_map(b, h, i, j):
        return (b, h, jnp.minimum(j, ((i + 1) * BQ - 1) // BK), 0)

    @jax.jit
    def run(q, k, v):
        D = q.shape[-1]
        grid = (B, H, N // BQ, N // BK)
        init = jnp.full((BQ, 128), -jnp.inf, jnp.float32)  # unused, doc only
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
    for (B, H, N) in ((16, 8, 2048), (1, 1, 16384)):
        q, k, v = make_qkv(jax.random.PRNGKey(7), (B, H, N, 64), dtype=jnp.bfloat16)
        flops = attention_flops(B, H, N, N, 64, causal=True)
        want = attention_reference(
            q[:1, :1].astype(jnp.float32), k[:1, :1].astype(jnp.float32),
            v[:1, :1].astype(jnp.float32), causal=True)
        for lazy, clamp in ((False, False), (True, False), (True, True)):
            fn = make_kernel(B, H, N, 1024, 1024, lazy, clamp)
            got = fn(q, k, v)[:1, :1].astype(jnp.float32)
            err = float(jnp.max(jnp.abs(got - want)))
            t = measure_kernel_stable(fn, (q, k, v), iters=14, inner_hi=5,
                                      repeats=3)["median_s"]
            print(f"B{B} H{H} N{N} lazy={lazy} clamp={clamp}: "
                  f"{t*1e3:7.3f} ms  {flops/t/1e12:5.1f} TF/s  err {err:.1e}",
                  flush=True)
        fn = functools.partial(flash_attention_fwd, causal=True)
        t = measure_kernel_stable(fn, (q, k, v), iters=14, inner_hi=5,
                                  repeats=3)["median_s"]
        print(f"B{B} H{H} N{N} prod: {t*1e3:7.3f} ms  {flops/t/1e12:5.1f} TF/s",
              flush=True)


if __name__ == "__main__":
    main()
