"""Round-5 experiment 2: close the tri-kernel cost model term by term.

tri_lean.py ruled the wide-matmul restructure OUT (lean_ne 967-1058 us
vs tiled_ne 1019 us — a few % — while full lean LOST to the production
online softmax).  The remaining suspects for the ~220 us gap between
the no-softmax chain (1.02 ms) and the overhang-adjusted MXU SOL
(0.79 ms at bq=256):

  * VPU passes riding the chain even without exp: the diagonal mask
    compare+select, the measurement scale multiply, and the fp32->bf16
    astype feeding PV.
  * Per-grid-step cost: 128 (b,h) steps per call; the round-4 grid
    model put 4-D steps at ~0.4-0.5 us, but tri's 2-D steps carry
    786 KB of DMA each.

Variants (paired vs production tri 256x256):
  pure        matmuls + astype only (no mask, no scale)
  pure_mask   + diagonal-tile mask
  pure_ms     + scale multiply (== tiled_ne, consistency check)
  fold2/fold4 the PRODUCTION kernel body with 2/4 batch elements per
              grid step (64/32 steps instead of 128)

Usage: timeout 590 env PYTHONPATH=/root/repo:/root/.axon_site python experiments/tri_decomp.py
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
from flash_attention_metal_tpu.kernels.flash_tri import (
    _tri_kernel,
    flash_attention_tri,
)
from flash_attention_metal_tpu.reference import make_qkv
from flash_attention_metal_tpu.utils.comp_cache import enable_compilation_cache
from flash_attention_metal_tpu.utils.timing import measure_kernel_pair

_LOG2E = math.log2(math.e)


def _chain_kernel(q_ref, k_ref, v_ref, o_ref, *, sm_scale, block_q,
                  block_k, n_q, n_kv, q_offset, mask, scale):
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
            if mask and c0 + bk - 1 > i * block_q + q_offset:
                row = (
                    jax.lax.broadcasted_iota(jnp.int32, (block_q, 1), 0)
                    + i * block_q
                    + q_offset
                )
                col = jax.lax.broadcasted_iota(jnp.int32, (1, bk), 1) + c0
                s = jnp.where(col <= row, s, DEFAULT_MASK_VALUE)
            if scale:
                s = s * 1e-4
            pv = mxu_dot_general(
                s.astype(v.dtype), v, (((1,), (0,)), ((), ()))
            )
            acc = pv if acc is None else acc + pv
        o_ref[0, 0, i * block_q : (i + 1) * block_q, :] = acc.astype(
            o_ref.dtype
        )


def _call_chain(q, k, v, *, mask, scale, block_q=256, block_k=256):
    batch, heads, n_q, head_dim = q.shape
    n_kv = k.shape[2]
    kernel = functools.partial(
        _chain_kernel, sm_scale=default_scale(head_dim), block_q=block_q,
        block_k=block_k, n_q=n_q, n_kv=n_kv, q_offset=0, mask=mask,
        scale=scale,
    )
    spec = lambda n: pl.BlockSpec(
        (1, 1, n, head_dim), lambda b, h: (b, h, 0, 0)
    )
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


def _call_fold(q, k, v, *, fold, block_q=256, block_k=256):
    """The PRODUCTION _tri_kernel body at an explicit batch fold."""
    batch, heads, n_q, head_dim = q.shape
    n_kv = k.shape[2]
    kernel = functools.partial(
        _tri_kernel, sm_scale=default_scale(head_dim), block_q=block_q,
        block_k=block_k, n_q=n_q, n_kv=n_kv, q_offset=0, save_lse=False,
        fold=fold,
    )

    def wrapped(q_ref, k_ref, v_ref, o_ref):
        return kernel(q_ref, k_ref, v_ref, o_ref, None)

    spec = lambda n: pl.BlockSpec(
        (fold, 1, n, head_dim), lambda b, h: (b, h, 0, 0)
    )
    return pl.pallas_call(
        wrapped,
        out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
        grid=(batch // fold, heads),
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
    base = functools.partial(flash_attention_tri, block_q=256, block_k=256)

    # fold variants must match production output exactly.
    o_ref = base(q, k, v)
    for f in (2, 4):
        of = _call_fold(q, k, v, fold=f)
        d = float(jnp.max(jnp.abs(
            of.astype(jnp.float32) - o_ref.astype(jnp.float32))))
        print(f"fold{f} vs production tri max diff: {d:.3e}")
        assert d < 1e-6, d

    variants = {
        "pure": functools.partial(_call_chain, mask=False, scale=False),
        "pure_mask": functools.partial(_call_chain, mask=True, scale=False),
        "pure_ms": functools.partial(_call_chain, mask=True, scale=True),
        "fold2": functools.partial(_call_fold, fold=2),
        "fold4": functools.partial(_call_fold, fold=4),
        "fold2_bq512": functools.partial(
            _call_fold, fold=2, block_q=512, block_k=512
        ),
    }
    results = {}
    for name, fn in variants.items():
        r = measure_kernel_pair(
            base, (q, k, v), fn, (q, k, v), iters=10, inner_hi=5, repeats=3,
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

    with open("experiments/tri_decomp.json", "w") as f:
        json.dump(results, f, indent=2)
    print("wrote experiments/tri_decomp.json")


if __name__ == "__main__":
    main()
