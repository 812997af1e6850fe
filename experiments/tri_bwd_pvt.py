"""Round-5 experiment 6: transposed-output gradient matmuls in the tri backward.

The forward's PV fix (experiments/tri_pvt.py: [D=64]-narrow matmul
outputs run at 39-49% of peak; transposing them to [64, block]-wide
outputs won 1.09x) applies three times over in the backward: dV, dK and
dQ all have D-narrow outputs.  In the fused triangular backward
(kernels/flash_tri.py:flash_attention_bwd_tri) those are 3 of the 5
matmuls per visible pair:

  dV^T = dO^T P   dot_general(do, p,  ((0,),(0,)))  -> [64, bk] wide
  dK^T = Q^T dS   dot_general(q,  ds, ((0,),(0,)))  -> [64, bk] wide
  dQ^T = K^T dS^T dot_general(k,  ds, ((0,),(1,)))  -> [64, bq] wide

The kernel stores the three gradients transposed [B, H, D, N]; the
wrapper transposes outside (3 O(N*D) XLA passes, ~100 us total at the
flagship — the measured times INCLUDE them).

Baselines: the production split FA-2 pair at its tuned 1024x1024 blocks
(autotune winner, 2414 us recorded) and the current untransposed tri
backward at 512x512 (2459 us recorded in round 4's race).

Usage: timeout 590 env PYTHONPATH=/root/repo:/root/.axon_site python experiments/tri_bwd_pvt.py
"""

import functools
import json
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from flash_attention_metal_tpu.config import BlockSizes, NUM_LANES, default_scale
from flash_attention_metal_tpu.kernels import (
    flash_attention_bwd,
    flash_attention_fwd,
)
from flash_attention_metal_tpu.kernels._common import mxu_dot_general
from flash_attention_metal_tpu.kernels.flash_tri import flash_attention_bwd_tri
from flash_attention_metal_tpu.reference import make_qkv
from flash_attention_metal_tpu.utils.comp_cache import enable_compilation_cache
from flash_attention_metal_tpu.utils.timing import measure_kernel_pair

_LOG2E = math.log2(math.e)


def _tri_bwd_pvt_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref,
                        dqt_ref, dkt_ref, dvt_ref, *, sm_scale, block_q,
                        block_k, n_q, n_kv, q_offset):
    nkb = -(-n_kv // block_k)
    dkt_accs = [None] * nkb  # [64, bk] each
    dvt_accs = [None] * nkb
    for i in range(n_q // block_q):
        last_visible = i * block_q + block_q - 1 + q_offset
        ext = min(n_kv, last_visible + 1)
        rows = slice(i * block_q, (i + 1) * block_q)
        if ext <= 0:
            dqt_ref[0, 0, :, rows] = jnp.zeros(
                (dqt_ref.shape[2], block_q), dqt_ref.dtype
            )
            continue
        n_tiles = -(-ext // block_k)
        q = q_ref[0, 0, rows, :]
        qs = (q.astype(jnp.float32) * (sm_scale * _LOG2E)).astype(q.dtype)
        do = do_ref[0, 0, rows, :]
        lse = lse_ref[0, 0, rows, :][:, :1]
        lse = jnp.where(jnp.isneginf(lse), 1e30, lse)
        lse2 = lse * _LOG2E
        delta = delta_ref[0, 0, rows, :][:, :1]
        dqt = None  # [64, block_q]
        for j in range(n_tiles):
            c0 = j * block_k
            bk = min(block_k, n_kv - c0)
            k = k_ref[0, 0, c0 : c0 + bk, :]
            v = v_ref[0, 0, c0 : c0 + bk, :]
            s = mxu_dot_general(qs, k, (((1,), (1,)), ((), ())))
            p = jnp.exp2(s - lse2)
            if c0 + bk - 1 > i * block_q + q_offset:
                row = (
                    jax.lax.broadcasted_iota(jnp.int32, (block_q, 1), 0)
                    + i * block_q
                    + q_offset
                )
                col = jax.lax.broadcasted_iota(jnp.int32, (1, bk), 1) + c0
                p = jnp.where(col <= row, p, 0.0)
            # dV^T += dO^T P : [64, bk] wide output.
            dvT = mxu_dot_general(
                do, p.astype(do.dtype), (((0,), (0,)), ((), ()))
            )
            dvt_accs[j] = dvT if dvt_accs[j] is None else dvt_accs[j] + dvT
            dp = mxu_dot_general(do, v, (((1,), (1,)), ((), ())))
            ds = p * (dp - delta)
            # dK^T += Q^T dS : [64, bk].
            dkT = mxu_dot_general(
                q, ds.astype(q.dtype), (((0,), (0,)), ((), ()))
            )
            dkt_accs[j] = dkT if dkt_accs[j] is None else dkt_accs[j] + dkT
            # dQ^T += K^T dS^T : [64, bq].
            dqT = mxu_dot_general(
                k, ds.astype(k.dtype), (((0,), (1,)), ((), ()))
            )
            dqt = dqT if dqt is None else dqt + dqT
        dqt_ref[0, 0, :, rows] = (dqt * sm_scale).astype(dqt_ref.dtype)
    for j in range(nkb):
        c0 = j * block_k
        bk = min(block_k, n_kv - c0)
        cols = slice(c0, c0 + bk)
        if dkt_accs[j] is None:
            dkt_ref[0, 0, :, cols] = jnp.zeros(
                (dkt_ref.shape[2], bk), dkt_ref.dtype
            )
            dvt_ref[0, 0, :, cols] = jnp.zeros(
                (dvt_ref.shape[2], bk), dvt_ref.dtype
            )
        else:
            dkt_ref[0, 0, :, cols] = (dkt_accs[j] * sm_scale).astype(
                dkt_ref.dtype
            )
            dvt_ref[0, 0, :, cols] = dvt_accs[j].astype(dvt_ref.dtype)


def bwd_pvt(q, k, v, o, do, lse_lanes, *, block_q=512, block_k=512):
    batch, heads, n_q, head_dim = q.shape
    n_kv = k.shape[2]
    delta = jnp.sum(
        o.astype(jnp.float32) * do.astype(jnp.float32), axis=-1,
        keepdims=True,
    )
    delta_lanes = jnp.broadcast_to(delta, (*delta.shape[:-1], NUM_LANES))
    kernel = functools.partial(
        _tri_bwd_pvt_kernel, sm_scale=default_scale(head_dim),
        block_q=block_q, block_k=block_k, n_q=n_q, n_kv=n_kv, q_offset=0,
    )
    spec = lambda n: pl.BlockSpec(
        (1, 1, n, head_dim), lambda b, h: (b, h, 0, 0)
    )
    lanespec = pl.BlockSpec(
        (1, 1, n_q, NUM_LANES), lambda b, h: (b, h, 0, 0)
    )
    tspec = lambda n: pl.BlockSpec(
        (1, 1, head_dim, n), lambda b, h: (b, h, 0, 0)
    )
    dqt, dkt, dvt = pl.pallas_call(
        kernel,
        out_shape=[
            jax.ShapeDtypeStruct((batch, heads, head_dim, n_q), q.dtype),
            jax.ShapeDtypeStruct((batch, heads, head_dim, n_kv), jnp.float32),
            jax.ShapeDtypeStruct((batch, heads, head_dim, n_kv), jnp.float32),
        ],
        grid=(batch, heads),
        in_specs=[spec(n_q), spec(n_kv), spec(n_kv), spec(n_q), lanespec,
                  lanespec],
        out_specs=[tspec(n_q), tspec(n_kv), tspec(n_kv)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
            vmem_limit_bytes=96 * 1024 * 1024,
        ),
    )(q, k, v, do, lse_lanes, delta_lanes)
    return (
        dqt.swapaxes(-1, -2),
        dkt.swapaxes(-1, -2),
        dvt.swapaxes(-1, -2),
    )


def main():
    enable_compilation_cache()
    B, H, N, D = 16, 8, 2048, 64
    q, k, v = make_qkv(jax.random.PRNGKey(0), (B, H, N, D), dtype=jnp.bfloat16)
    o, lse = flash_attention_fwd(q, k, v, causal=True, save_lse=True)
    do = (q * 0.01).astype(jnp.bfloat16)

    # Correctness vs the production tri backward.
    r_tri = flash_attention_bwd_tri(
        q[:1], k[:1], v[:1], o[:1], do[:1], lse[:1], block_q=512,
        block_k=512,
    )
    r_pvt = bwd_pvt(q[:1], k[:1], v[:1], o[:1], do[:1], lse[:1])
    for a, b, name in zip(r_pvt, r_tri, ("dq", "dk", "dv")):
        d = float(jnp.max(jnp.abs(
            a.astype(jnp.float32) - b.astype(jnp.float32))))
        print(f"pvt {name} vs tri: {d:.3e}")
        assert d < 1e-2, (name, d)

    split = functools.partial(
        flash_attention_bwd, causal=True,
        block_sizes=BlockSizes(
            block_q_dkv=1024, block_kv_dkv=1024,
            block_q_dq=1024, block_kv_dq=1024,
        ),
    )
    args = (q, k, v, o, do, lse)
    results = {}
    for name, fn in {
        "pvt_512": functools.partial(bwd_pvt, block_q=512, block_k=512),
        "pvt_256": functools.partial(bwd_pvt, block_q=256, block_k=256),
        "pvt_512x1024": functools.partial(
            bwd_pvt, block_q=512, block_k=1024
        ),
        "tri_512": functools.partial(
            flash_attention_bwd_tri, block_q=512, block_k=512
        ),
    }.items():
        r = measure_kernel_pair(
            split, args, fn, args, iters=10, inner_hi=5, repeats=3,
        )
        results[name] = {"split_us": r["a_s"] * 1e6, "var_us": r["b_s"] * 1e6}
        print(
            f"{name}: split {r['a_s']*1e6:.1f} us vs {r['b_s']*1e6:.1f} us "
            f"(split/var {r['ratio']:.3f})"
        )

    with open("experiments/tri_bwd_pvt.json", "w") as f:
        json.dump(results, f, indent=2)
    print("wrote experiments/tri_bwd_pvt.json")


if __name__ == "__main__":
    main()
