"""Round-5 experiment: close the unattributed ~30% at the flagship causal shape.

Round 4's phase model (experiments/causal_phases.py) left ~0.3 ms of the
B16 H8 N2048 tri-kernel time unexplained: with softmax deleted the
36-tile matmul chain still measured 1.022 ms against a 0.70 ms D/128
speed-of-light.  Two structural suspects:

1. **Tile-chain MXU efficiency.** The production tri kernel runs 36
   (QK^T, PV) pairs of [256,64]x[64,256] / [256,256]x[256,64] matmuls
   with online-softmax state updates between them.  Each matmul is
   shallow (contraction 64) or narrow (output 64); the per-tile m/l/acc
   chain serializes VPU work between MXU ops.
2. **Diagonal overhang.** Executed area is sum_i ext_i * bq =
   N^2/2 * (1 + bq/N) — 12.5% above the modeled causal FLOPs at bq=256.

This measures a "lean-inner" variant: per q block, ONE wide QK^T over
the whole static visible extent [bq, ext], one full-width two-pass
softmax, ONE deep PV [bq,ext]x[ext,64] — the structure of the 95%-of-
roofline lean path, but on visible-area slices (no square FLOPs).  No
online state at all; q blocks are independent so Mosaic can overlap
block i's VPU softmax with block i+1's MXU.

Variants (paired vs the production tri kernel):
  lean       lean-inner, full softmax+mask
  lean_ne    lean-inner, no exp (isolates the matmul chain)
  tiled_ne   production tiling, no exp (round-4 baseline, re-measured)
at block_q in {128, 256, 512}.

Usage: timeout 590 env PYTHONPATH=/root/repo:/root/.axon_site python experiments/tri_lean.py
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


def _lean_kernel(q_ref, k_ref, v_ref, o_ref, *, sm_scale, block_q,
                 n_q, n_kv, q_offset, softmax):
    for i in range(n_q // block_q):
        last_visible = i * block_q + block_q - 1 + q_offset
        ext = min(n_kv, last_visible + 1)
        # Pad the static extent to a lane multiple.
        ext = -(-ext // 128) * 128
        if ext <= 0:
            o_ref[0, 0, i * block_q : (i + 1) * block_q, :] = jnp.zeros(
                (block_q, o_ref.shape[-1]), o_ref.dtype
            )
            continue
        q = q_ref[0, 0, i * block_q : (i + 1) * block_q, :]
        q = (q.astype(jnp.float32) * (sm_scale * _LOG2E)).astype(q.dtype)
        k = k_ref[0, 0, :ext, :]
        v = v_ref[0, 0, :ext, :]
        s = mxu_dot_general(q, k, (((1,), (1,)), ((), ())))
        if ext - 1 > i * block_q + q_offset:
            row = (
                jax.lax.broadcasted_iota(jnp.int32, (block_q, 1), 0)
                + i * block_q
                + q_offset
            )
            col = jax.lax.broadcasted_iota(jnp.int32, (1, ext), 1)
            s = jnp.where(col <= row, s, DEFAULT_MASK_VALUE)
        if softmax:
            m = jnp.max(s, axis=-1, keepdims=True)
            p = jnp.exp2(s - m)
            l = jnp.sum(p, axis=-1, keepdims=True)
            l_inv = jnp.where(l == 0.0, 1.0, 1.0 / l)
            o = mxu_dot_general(
                p.astype(v.dtype), v, (((1,), (0,)), ((), ()))
            )
            o = o * l_inv
        else:
            o = mxu_dot_general(
                (s * 1e-4).astype(v.dtype), v, (((1,), (0,)), ((), ()))
            )
        o_ref[0, 0, i * block_q : (i + 1) * block_q, :] = o.astype(
            o_ref.dtype
        )


def _tiled_ne_kernel(q_ref, k_ref, v_ref, o_ref, *, sm_scale, block_q,
                     block_k, n_q, n_kv, q_offset):
    """Production tri tiling, softmax stripped (round-4 noexp re-run)."""
    for i in range(n_q // block_q):
        last_visible = i * block_q + block_q - 1 + q_offset
        ext = min(n_kv, last_visible + 1)
        if ext <= 0:
            o_ref[0, 0, i * block_q : (i + 1) * block_q, :] = jnp.zeros(
                (block_q, o_ref.shape[-1]), o_ref.dtype
            )
            continue
        n_tiles = -(-ext // block_k)
        q = q_ref[0, 0, i * block_q : (i + 1) * block_q, :]
        q = (q.astype(jnp.float32) * (sm_scale * _LOG2E)).astype(q.dtype)
        acc = None
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
            pv = mxu_dot_general(
                (s * 1e-4).astype(v.dtype), v, (((1,), (0,)), ((), ()))
            )
            acc = pv if acc is None else acc + pv
        o_ref[0, 0, i * block_q : (i + 1) * block_q, :] = acc.astype(
            o_ref.dtype
        )


def _call(kernel_fn, q, k, v, **kw):
    batch, heads, n_q, head_dim = q.shape
    n_kv = k.shape[2]
    kernel = functools.partial(
        kernel_fn, sm_scale=default_scale(head_dim), n_q=n_q, n_kv=n_kv,
        q_offset=0, **kw,
    )
    spec = lambda n: pl.BlockSpec((1, 1, n, head_dim), lambda b, h: (b, h, 0, 0))
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
        grid=(batch, heads),
        in_specs=[spec(n_q), spec(n_kv), spec(n_kv)],
        out_specs=spec(n_q),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
            vmem_limit_bytes=96 * 1024 * 1024,
        ),
    )(q, k, v)


def main():
    enable_compilation_cache()
    B, H, N, D = 16, 8, 2048, 64
    q, k, v = make_qkv(jax.random.PRNGKey(0), (B, H, N, D), dtype=jnp.bfloat16)
    results = {}

    base = functools.partial(
        flash_attention_tri, block_q=256, block_k=256
    )
    # Correctness spot-check of the lean variant vs the production tri.
    o_ref = base(q[:1], k[:1], v[:1])
    o_lean = _call(functools.partial(_lean_kernel, softmax=True),
                   q[:1], k[:1], v[:1], block_q=256)
    diff = float(jnp.max(jnp.abs(
        o_lean.astype(jnp.float32) - o_ref.astype(jnp.float32)
    )))
    print(f"lean vs tri max diff: {diff:.3e}")
    assert diff < 2e-2, diff

    variants = {}
    for bq in (128, 256, 512):
        variants[f"lean_bq{bq}"] = functools.partial(
            _call, functools.partial(_lean_kernel, softmax=True), block_q=bq
        )
        variants[f"lean_ne_bq{bq}"] = functools.partial(
            _call, functools.partial(_lean_kernel, softmax=False), block_q=bq
        )
    variants["tiled_ne_256"] = functools.partial(
        _call, _tiled_ne_kernel, block_q=256, block_k=256
    )

    for name, fn in variants.items():
        r = measure_kernel_pair(
            base, (q, k, v), fn, (q, k, v),
            iters=10, inner_hi=5, repeats=3,
        )
        results[name] = {
            "tri_us": r["a_s"] * 1e6,
            "var_us": r["b_s"] * 1e6,
            "ratio_tri_over_var": r["ratio"],
        }
        print(
            f"{name}: tri {r['a_s']*1e6:.1f} us vs {r['b_s']*1e6:.1f} us "
            f"(tri/var {r['ratio']:.3f})"
        )

    with open("experiments/tri_lean.json", "w") as f:
        json.dump(results, f, indent=2)
    print("wrote experiments/tri_lean.json")


if __name__ == "__main__":
    main()
