"""Round-4: paired measurement of the native-GQA backward row-fold.

VERDICT r3 item 3: the backward used to broadcast K/V with ``jnp.repeat``
(group-x HBM on K/V reads) and materialize group-x dK/dV before a reduce.
The row-fold path (the backward twin of the round-3 decode head-fold)
reads each K/V block once per KV head and group-sums dK/dV in the dKdV
kernel's VMEM accumulator.  This measures both paths PAIRED at the
flagship training attention shape (B16 Hq16 Hkv8 N2048 D64, causal).

Usage: timeout 590 python experiments/gqa_bwd_pair.py
"""

import functools
import json

import jax
import jax.numpy as jnp

from flash_attention_metal_tpu.kernels.flash_bwd import flash_attention_bwd_auto
from flash_attention_metal_tpu.kernels.flash_fwd import flash_attention_fwd
from flash_attention_metal_tpu.ops.attention import fold_gqa_rows, unfold_gqa_rows
from flash_attention_metal_tpu.reference import make_qkv
from flash_attention_metal_tpu.utils.comp_cache import enable_compilation_cache
from flash_attention_metal_tpu.utils.timing import measure_kernel_pair

B, HQ, HKV, N, D = 16, 16, 8, 2048, 64
GROUP = HQ // HKV


@jax.jit
def bwd_fold(q, k, v, o, do, lse):
    dqf, dk, dv = flash_attention_bwd_auto(
        fold_gqa_rows(q, HKV), k, v, fold_gqa_rows(o, HKV),
        fold_gqa_rows(do, HKV), fold_gqa_rows(lse, HKV),
        causal=True, pos_div=GROUP,
    )
    return unfold_gqa_rows(dqf, HQ, N), dk, dv


@jax.jit
def bwd_broadcast(q, k, v, o, do, lse):
    kb = jnp.repeat(k, GROUP, axis=1)
    vb = jnp.repeat(v, GROUP, axis=1)
    dq, dk, dv = flash_attention_bwd_auto(q, kb, vb, o, do, lse, causal=True)
    dk = dk.reshape(B, HKV, GROUP, N, D).sum(axis=2)
    dv = dv.reshape(B, HKV, GROUP, N, D).sum(axis=2)
    return dq, dk, dv


def main():
    enable_compilation_cache()
    q, _, _ = make_qkv(jax.random.PRNGKey(0), (B, HQ, N, D),
                       dtype=jnp.bfloat16)
    _, k, v = make_qkv(jax.random.PRNGKey(1), (B, HKV, N, D),
                       dtype=jnp.bfloat16)
    kb = jnp.repeat(k, GROUP, axis=1)
    vb = jnp.repeat(v, GROUP, axis=1)
    o, lse = flash_attention_fwd(q, kb, vb, causal=True, save_lse=True)
    do = q * 0.01

    # Numerics first: the two paths must agree.
    a = bwd_fold(q, k, v, o, do, lse)
    b = bwd_broadcast(q, k, v, o, do, lse)
    diffs = [
        float(jnp.max(jnp.abs(x.astype(jnp.float32) - y.astype(jnp.float32))))
        for x, y in zip(a, b)
    ]
    print("fold-vs-broadcast max diffs (dq, dk, dv):",
          [f"{d:.2e}" for d in diffs])

    r = measure_kernel_pair(
        bwd_fold, (q, k, v, o, do, lse),
        bwd_broadcast, (q, k, v, o, do, lse),
        iters=12, inner_hi=3, repeats=7,
    )
    out = {
        "shape": f"B{B} Hq{HQ} Hkv{HKV} N{N} D{D} causal",
        "fold_ms": r["a_s"] * 1e3,
        "broadcast_ms": r["b_s"] * 1e3,
        "speedup": r["b_s"] / r["a_s"],
        "ratio_samples": r.get("ratio_samples"),
        "max_diffs": diffs,
    }
    print(json.dumps({k2: v2 for k2, v2 in out.items()
                      if k2 != "ratio_samples"}, indent=2))
    json.dump(out, open("experiments/gqa_bwd_pair.json", "w"), indent=2)

    # Persist the paired winner as the GQA-backward route for this head
    # topology (consulted by ops.attention._grads_from_residuals).
    from flash_attention_metal_tpu.harness.autotune import _gqa_route_key

    route = "fold" if out["speedup"] > 1.0 else "broadcast"
    key = _gqa_route_key(HQ, HKV, N, D, True, jnp.bfloat16)
    cache = json.load(open("autotune_cache.json"))
    cache[key] = {"route": route, "speedup_fold_over_broadcast":
                  out["speedup"]}
    json.dump(cache, open("autotune_cache.json", "w"), indent=2,
              sort_keys=True)
    print(f"persisted route={route} under {key}")


if __name__ == "__main__":
    main()
