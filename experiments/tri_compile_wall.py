"""Minimal-repro ladder for the N=8192 triangular-kernel Mosaic compile wall.

Round-5 observation (flash_tri.py:185): EVERY tri config at N=8192 fails
AOT compilation with "tpu_compile_helper subprocess exit code 1", while
N=4096 configs with the SAME visible-pair count compile fine — so the
wall tracks the sequence extent, not the static-unroll size.  This
script isolates which ingredient trips it, compiling (never executing)
a ladder of stripped-down kernels at N=4096 (control) and N=8192:

  copy      — one grid step, whole [1,1,N,D] VMEM block copied through.
              Tests: is an extent-N VMEM block itself illegal?
  widedot   — one [512,D] x [D,N] matmul (N-wide MXU output, no slicing).
              Tests: is a single N-extent matmul operand/result illegal?
  chain     — ONE 1024-row q block, static 1024-slices over the N-extent
              K/V refs, dot(q,k_s^T) + dot(p,v_s) accumulated: the tri
              kernel's inner loop with unroll = N/1024 pairs (8 at 8192,
              far under the 36-pair N=4096 configs that compile).
              Tests: is static slicing of an N-extent ref the trigger?
  tri       — the real flash_attention_tri at 1024x1024 tiles, B=H=1.

Usage: timeout 590 python experiments/tri_compile_wall.py
Writes experiments/tri_compile_wall.json.
"""

import functools
import json

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

D = 64
VMEM = 64 * 1024 * 1024


def _try(name, fn, args, results):
    try:
        jax.jit(fn).lower(*args).compile()
        results[name] = {"ok": True}
        print(f"{name}: OK", flush=True)
    except Exception as e:  # noqa: BLE001 - ladder records the failure
        lines = [ln for ln in str(e).splitlines() if ln.strip()]
        results[name] = {"ok": False, "err": " | ".join(lines[:4])[:400]}
        print(f"{name}: FAIL {lines[0][:160]}", flush=True)


def _copy_kernel(x_ref, o_ref):
    o_ref[...] = x_ref[...]


def copy_case(n):
    spec = pl.BlockSpec((1, 1, n, D), lambda b, h: (b, h, 0, 0))
    fn = functools.partial(
        pl.pallas_call,
        _copy_kernel,
        out_shape=jax.ShapeDtypeStruct((1, 1, n, D), jnp.bfloat16),
        grid=(1, 1),
        in_specs=[spec],
        out_specs=spec,
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=VMEM),
    )()
    return fn, (jax.ShapeDtypeStruct((1, 1, n, D), jnp.bfloat16),)


def _widedot_kernel(q_ref, k_ref, o_ref):
    q = q_ref[0, 0, :, :].astype(jnp.float32)  # [512, D]
    k = k_ref[0, 0, :, :].astype(jnp.float32)  # [N, D]
    p = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())))  # [512, N]
    o_ref[0, 0, :, :] = p.astype(o_ref.dtype)


def widedot_case(n):
    fn = functools.partial(
        pl.pallas_call,
        _widedot_kernel,
        out_shape=jax.ShapeDtypeStruct((1, 1, 512, n), jnp.float32),
        grid=(1, 1),
        in_specs=[
            pl.BlockSpec((1, 1, 512, D), lambda b, h: (b, h, 0, 0)),
            pl.BlockSpec((1, 1, n, D), lambda b, h: (b, h, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, 1, 512, n), lambda b, h: (b, h, 0, 0)),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=VMEM),
    )()
    return fn, (
        jax.ShapeDtypeStruct((1, 1, 512, D), jnp.bfloat16),
        jax.ShapeDtypeStruct((1, 1, n, D), jnp.bfloat16),
    )


def _chain_kernel(q_ref, k_ref, v_ref, o_ref, *, n, bk):
    q = q_ref[0, 0, :, :].astype(jnp.float32)  # [1024, D]
    acc = jnp.zeros((1024, D), jnp.float32)
    for s in range(0, n, bk):
        ks = k_ref[0, 0, s : s + bk, :].astype(jnp.float32)
        p = jax.lax.dot_general(q, ks, (((1,), (1,)), ((), ())))
        vs = v_ref[0, 0, s : s + bk, :].astype(jnp.float32)
        acc = acc + jax.lax.dot_general(p, vs, (((1,), (0,)), ((), ())))
    o_ref[0, 0, :, :] = acc.astype(o_ref.dtype)


def chain_case(n, bk=1024):
    fn = functools.partial(
        pl.pallas_call,
        functools.partial(_chain_kernel, n=n, bk=bk),
        out_shape=jax.ShapeDtypeStruct((1, 1, 1024, D), jnp.bfloat16),
        grid=(1, 1),
        in_specs=[
            pl.BlockSpec((1, 1, 1024, D), lambda b, h: (b, h, 0, 0)),
            pl.BlockSpec((1, 1, n, D), lambda b, h: (b, h, 0, 0)),
            pl.BlockSpec((1, 1, n, D), lambda b, h: (b, h, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, 1, 1024, D), lambda b, h: (b, h, 0, 0)),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=VMEM),
    )()
    return fn, (
        jax.ShapeDtypeStruct((1, 1, 1024, D), jnp.bfloat16),
        jax.ShapeDtypeStruct((1, 1, n, D), jnp.bfloat16),
        jax.ShapeDtypeStruct((1, 1, n, D), jnp.bfloat16),
    )


def tri_case(n):
    from flash_attention_metal_tpu.kernels.flash_tri import flash_attention_tri

    fn = functools.partial(
        flash_attention_tri, block_q=1024, block_k=1024
    )
    shp = jax.ShapeDtypeStruct((1, 1, n, D), jnp.bfloat16)
    return fn, (shp, shp, shp)


def main():
    from flash_attention_metal_tpu.utils.comp_cache import (
        enable_compilation_cache,
    )

    enable_compilation_cache()
    print("devices:", jax.devices(), flush=True)
    results = {}
    for n in (4096, 8192):
        for name, case in (
            ("copy", copy_case),
            ("widedot", widedot_case),
            ("chain", chain_case),
            ("tri", tri_case),
        ):
            fn, args = case(n)
            _try(f"{name}_n{n}", fn, args, results)
    with open("experiments/tri_compile_wall.json", "w") as f:
        json.dump(results, f, indent=2)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
