"""Round-4: race the fused tri backward at the GQA-fold training shape.

The flagship training config (L8 d2048, GQA 16/8, N=2048) sends its
backward through the row-fold path: folded operands B16 Hkv8 n_q=4096
n_kv=2048, pos_div=2.  ``autotune_bwd`` only sweeps square shapes, so
this races the split fold path vs the tri fold path PAIRED at exactly
that shape, checks numerics on-chip, and persists an
``{"impl": "tri"}`` backward cache entry iff tri wins the paired ratio.

Usage: timeout 590 python experiments/tri_bwd_fold_race.py
"""

import json

import jax
import jax.numpy as jnp

from flash_attention_metal_tpu.harness.autotune import _key
from flash_attention_metal_tpu.kernels.flash_bwd import flash_attention_bwd
from flash_attention_metal_tpu.kernels.flash_fwd import flash_attention_fwd
from flash_attention_metal_tpu.kernels.flash_tri import flash_attention_bwd_tri
from flash_attention_metal_tpu.ops.attention import fold_gqa_rows
from flash_attention_metal_tpu.reference import make_qkv
from flash_attention_metal_tpu.utils.comp_cache import enable_compilation_cache
from flash_attention_metal_tpu.utils.timing import measure_kernel_pair

B, HQ, HKV, N, D = 16, 16, 8, 2048, 64
GROUP = HQ // HKV


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
    qf, of, dof, lsef = (fold_gqa_rows(x, HKV) for x in (q, o, do, lse))

    best = None
    results = {}
    split = jax.jit(lambda *a: flash_attention_bwd(
        *a, causal=True, pos_div=GROUP
    ))
    base = None
    # Round 5: transposed-gradient variants race too (the square-shape
    # winner, experiments/tri_bwd_pvt.py).
    for bq, bk, pvt in (
        (256, 256, False), (256, 512, False), (512, 256, False),
        (512, 512, False), (512, 512, True), (512, 1024, True),
        (1024, 512, True),
    ):
        tri = jax.jit(
            lambda *a, _bq=bq, _bk=bk, _p=pvt: flash_attention_bwd_tri(
                *a, pos_div=GROUP, block_q=_bq, block_k=_bk,
                pv_transposed=_p,
            )
        )
        # numerics vs the split fold path first
        g_t = tri(qf, k, v, of, dof, lsef)
        g_s = split(qf, k, v, of, dof, lsef)
        diff = max(
            float(jnp.max(jnp.abs(a.astype(jnp.float32)
                                  - b.astype(jnp.float32))))
            for a, b in zip(g_t, g_s)
        )
        r = measure_kernel_pair(
            tri, (qf, k, v, of, dof, lsef),
            split, (qf, k, v, of, dof, lsef),
            iters=10, inner_hi=3, repeats=5,
        )
        base = r["b_s"]
        results[f"tri {bq}x{bk}{'T' if pvt else ''}"] = {
            "tri_ms": r["a_s"] * 1e3, "split_ms": r["b_s"] * 1e3,
            "speedup": r["b_s"] / r["a_s"], "max_diff": diff,
        }
        print(f"tri {bq}x{bk}{'T' if pvt else ''}: {r['a_s']*1e3:.3f} ms vs split "
              f"{r['b_s']*1e3:.3f} ms (x{r['b_s']/r['a_s']:.2f}), "
              f"diff {diff:.2e}")
        if diff < 1e-2 and r["b_s"] / r["a_s"] > 1.02 and (
            best is None or r["a_s"] < best[3]
        ):
            best = (bq, bk, pvt, r["a_s"])

    key = _key("bwd", B, HKV, N * GROUP, N, D, True, jnp.bfloat16)
    cache = json.load(open("autotune_cache.json"))
    if best is not None:
        cache[key] = {
            "impl": "tri",
            "blocks": {
                "block_q": best[0], "block_k": best[1], "pvt": best[2],
            },
            "us": best[3] * 1e6,
        }
        print(f"persisted tri {best[0]}x{best[1]}"
              f"{'T' if best[2] else ''} under {key}")
    else:
        cache.pop(key, None)
        print("tri did not win; no cache entry")
    json.dump(cache, open("autotune_cache.json", "w"), indent=2,
              sort_keys=True)
    results["split_ms"] = None if base is None else base * 1e3
    json.dump(results, open("experiments/tri_bwd_fold_race.json", "w"),
              indent=2)


if __name__ == "__main__":
    main()
