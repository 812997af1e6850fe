"""Stage-2 compile-wall ladder: which tri ingredient fails at N=8192?

Stage 1 (tri_compile_wall.py, committed JSON): at N=8192 a whole-extent
VMEM copy, a single [512,D]x[D,8192] matmul, and a 1-q-block static
-slice matmul chain ALL compile; only the full tri kernel fails (its
exact 1024x1024 config compiles at N=4096).  Stage 2 adds the remaining
ingredients one at a time, all at N=8192, 1024x1024 tiles, B=H=1:

  multi    — 8 q-blocks x causal kv-slices (36 pairs, tri's full unroll),
             plain accumulate, per-q-block static row writes.  Tests the
             unroll-x-extent combination without softmax.
  softmax  — 1 q-block, 8 kv-slices, FULL online softmax (running max,
             exp2, rescale) exactly as tri's inner loop.  Tests the
             softmax chain at the extent with minimal unroll.
  masked   — softmax + the iota diagonal mask on the last slice.
  multisfm — 8 q-blocks x causal slices WITH online softmax = tri minus
             fold indexing and LSE plumbing.

Usage: timeout 590 env PYTHONPATH=/root/repo:/root/.axon_site \
    python experiments/tri_compile_wall2.py
Writes experiments/tri_compile_wall2.json.
"""

import functools
import json

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

D = 64
N = 8192
BQ = BK = 1024
VMEM = 64 * 1024 * 1024
_LOG2E = 1.4426950408889634


def _try(name, fn, args, results):
    try:
        jax.jit(fn).lower(*args).compile()
        results[name] = {"ok": True}
        print(f"{name}: OK", flush=True)
    except Exception as e:  # noqa: BLE001 - ladder records the failure
        lines = [ln for ln in str(e).splitlines() if ln.strip()]
        results[name] = {"ok": False, "err": " | ".join(lines[:2])[:300]}
        print(f"{name}: FAIL {lines[0][:120]}", flush=True)


def _make(kernel_body):
    fn = functools.partial(
        pl.pallas_call,
        kernel_body,
        out_shape=jax.ShapeDtypeStruct((1, 1, N, D), jnp.bfloat16),
        grid=(1, 1),
        in_specs=[
            pl.BlockSpec((1, 1, N, D), lambda b, h: (b, h, 0, 0)),
            pl.BlockSpec((1, 1, N, D), lambda b, h: (b, h, 0, 0)),
            pl.BlockSpec((1, 1, N, D), lambda b, h: (b, h, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, 1, N, D), lambda b, h: (b, h, 0, 0)),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=VMEM),
    )()
    shp = jax.ShapeDtypeStruct((1, 1, N, D), jnp.bfloat16)
    return fn, (shp, shp, shp)


def _inner(q, k_ref, v_ref, n_kv_vis, softmax, mask_last, row0):
    """One q-block's kv loop; returns the [BQ, D] fp32 output block."""
    acc = jnp.zeros((BQ, D), jnp.float32)
    m = jnp.full((BQ, 1), -jnp.inf, jnp.float32)
    l = jnp.zeros((BQ, 1), jnp.float32)
    n_tiles = -(-n_kv_vis // BK)
    for t in range(n_tiles):
        s = t * BK
        ks = k_ref[0, 0, s : s + BK, :].astype(jnp.float32)
        p = jax.lax.dot_general(q, ks, (((1,), (1,)), ((), ()))) * _LOG2E
        if mask_last and t == n_tiles - 1:
            rows = row0 + jax.lax.broadcasted_iota(jnp.int32, (BQ, BK), 0)
            cols = s + jax.lax.broadcasted_iota(jnp.int32, (BQ, BK), 1)
            p = jnp.where(cols <= rows, p, -jnp.inf)
        vs = v_ref[0, 0, s : s + BK, :].astype(jnp.float32)
        if softmax:
            m_curr = jnp.max(p, axis=-1, keepdims=True)
            m_next = jnp.maximum(m, m_curr)
            e = jnp.exp2(p - m_next)
            alpha = jnp.exp2(m - m_next)
            l = l * alpha + jnp.sum(e, axis=-1, keepdims=True)
            acc = acc * alpha + jax.lax.dot_general(
                e, vs, (((1,), (0,)), ((), ()))
            )
            m = m_next
        else:
            acc = acc + jax.lax.dot_general(p, vs, (((1,), (0,)), ((), ())))
    if softmax:
        l_inv = jnp.where(l == 0.0, 1.0, 1.0 / l)
        acc = acc * l_inv
    return acc


def _body(q_ref, k_ref, v_ref, o_ref, *, n_qblocks, softmax, mask_last):
    for i in range(n_qblocks):
        r0 = i * BQ
        q = q_ref[0, 0, r0 : r0 + BQ, :].astype(jnp.float32)
        n_vis = min(N, r0 + BQ)
        acc = _inner(q, k_ref, v_ref, n_vis, softmax, mask_last, r0)
        o_ref[0, 0, r0 : r0 + BQ, :] = acc.astype(o_ref.dtype)


def main():
    from flash_attention_metal_tpu.utils.comp_cache import (
        enable_compilation_cache,
    )

    enable_compilation_cache()
    print("devices:", jax.devices(), flush=True)
    results = {}
    cases = {
        "multi": dict(n_qblocks=8, softmax=False, mask_last=False),
        "softmax": dict(n_qblocks=1, softmax=True, mask_last=False),
        "masked": dict(n_qblocks=1, softmax=True, mask_last=True),
        "multisfm": dict(n_qblocks=8, softmax=True, mask_last=True),
    }
    for name, cfg in cases.items():
        fn, args = _make(functools.partial(_body, **cfg))
        _try(f"{name}_n{N}", fn, args, results)
    with open("experiments/tri_compile_wall2.json", "w") as f:
        json.dump(results, f, indent=2)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
