"""Round-5 experiment 3: attribute the 212 us tile-chain inefficiency.

tri_decomp.py pinned the flagship causal budget: 788 us executed-area
MXU SOL + 212 us chain inefficiency + 14 us mask + 110 us softmax =
1124 us measured.  This separates the 212 us between (a) the fp32->bf16
astype pass feeding PV and (b) MXU granularity at 256-tiles:

  pure_bf16out   QK^T emits bf16 directly (preferred_element_type) —
                 no separate astype pass in the chain
  pure_512       the pure chain at 512x512 tiles (4x fewer, 4x larger
                 matmuls)
  pure_128k512   block_q=128 (minimal diagonal overhang 1.0625)

Also: the V1-vs-naive mid-N race after the base-2 softmax change
(VERDICT task 7) at the amortized sweep shapes.

Usage: timeout 590 env PYTHONPATH=/root/repo:/root/.axon_site python experiments/tri_chain_attrib.py
"""

import functools
import json

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from flash_attention_metal_tpu.config import default_scale
from flash_attention_metal_tpu.kernels._common import mxu_dot_general
from flash_attention_metal_tpu.kernels.flash_tri import flash_attention_tri
from flash_attention_metal_tpu.reference import make_qkv
from flash_attention_metal_tpu.utils.comp_cache import enable_compilation_cache
from flash_attention_metal_tpu.utils.timing import measure_kernel_pair

import math

_LOG2E = math.log2(math.e)


def _chain_kernel(q_ref, k_ref, v_ref, o_ref, *, sm_scale, block_q,
                  block_k, n_q, n_kv, q_offset, bf16_out):
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
            if bf16_out:
                p = jax.lax.dot_general(
                    q, k, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.bfloat16,
                )
            else:
                s = mxu_dot_general(q, k, (((1,), (1,)), ((), ())))
                p = s.astype(v.dtype)
            pv = mxu_dot_general(p, v, (((1,), (0,)), ((), ())))
            acc = pv if acc is None else acc + pv
        o_ref[0, 0, i * block_q : (i + 1) * block_q, :] = acc.astype(
            o_ref.dtype
        )


def _call_chain(q, k, v, *, bf16_out, block_q=256, block_k=256):
    batch, heads, n_q, head_dim = q.shape
    n_kv = k.shape[2]
    kernel = functools.partial(
        _chain_kernel, sm_scale=default_scale(head_dim), block_q=block_q,
        block_k=block_k, n_q=n_q, n_kv=n_kv, q_offset=0, bf16_out=bf16_out,
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


def main():
    enable_compilation_cache()
    B, H, N, D = 16, 8, 2048, 64
    q, k, v = make_qkv(jax.random.PRNGKey(0), (B, H, N, D), dtype=jnp.bfloat16)
    base = functools.partial(flash_attention_tri, block_q=256, block_k=256)
    results = {}

    # NOTE: a bf16-output QK^T (preferred_element_type=bfloat16) does NOT
    # lower — Mosaic requires a 32-bit matmul accumulator ("Expected
    # matmul acc to be 32-bit"), so the astype pass cannot be folded into
    # the matmul.  The astype cost is instead bounded via the
    # experiments/mxu_rates.py per-shape matmul rates.
    variants = {
        "pure_again": functools.partial(_call_chain, bf16_out=False),
        "pure_512": functools.partial(
            _call_chain, bf16_out=False, block_q=512, block_k=512
        ),
        "pure_128k512": functools.partial(
            _call_chain, bf16_out=False, block_q=128, block_k=512
        ),
    }
    for name, fn in variants.items():
        r = measure_kernel_pair(
            base, (q, k, v), fn, (q, k, v), iters=10, inner_hi=5, repeats=3,
        )
        results[name] = {
            "tri_us": r["a_s"] * 1e6,
            "var_us": r["b_s"] * 1e6,
        }
        print(
            f"{name}: tri {r['a_s']*1e6:.1f} us vs {r['b_s']*1e6:.1f} us "
            f"(tri/var {r['ratio']:.3f})"
        )

    # --- V1 vs naive after the base-2 change (amortized mid-N shapes) ---
    from flash_attention_metal_tpu.harness.benchmark import amortizing_batch
    from flash_attention_metal_tpu.kernels import (
        flash_attention_v1,
        naive_attention,
    )

    for n in (1024, 2048, 4096, 8192):
        b = amortizing_batch(n)
        qf, kf, vf = make_qkv(jax.random.PRNGKey(1), (b, 1, n, 64))
        r = measure_kernel_pair(
            naive_attention, (qf, kf, vf),
            flash_attention_v1, (qf, kf, vf),
            iters=10, inner_hi=5, repeats=3,
        )
        results[f"v1_n{n}"] = {
            "naive_us": r["a_s"] * 1e6,
            "v1_us": r["b_s"] * 1e6,
            "speedup": r["ratio"],
        }
        print(
            f"V1 n={n} b={b}: naive {r['a_s']*1e6:.1f} us vs v1 "
            f"{r['b_s']*1e6:.1f} us (speedup {r['ratio']:.3f})"
        )

    with open("experiments/tri_chain_attrib.json", "w") as f:
        json.dump(results, f, indent=2)
    print("wrote experiments/tri_chain_attrib.json")


if __name__ == "__main__":
    main()
