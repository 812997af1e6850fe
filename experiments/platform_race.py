"""Race the production-routed forward against the platform's own kernels.

The round-2..4 claims cited ad-hoc readings (jax flash 2.05 ms, splash
2.14 ms at B16 H8 N2048 causal); this persists the comparison as a
reproducible artifact with PAIRED interleaved measurement, racing our
router (whatever it ships: tri-pvt after round 5) against
`jax.experimental.pallas.ops.tpu.flash_attention` and
`splash_attention`, each at a small sweep of their own block sizes.

Usage: timeout 590 env PYTHONPATH=/root/repo:/root/.axon_site python experiments/platform_race.py
"""

import functools
import json

import jax
import jax.numpy as jnp

from flash_attention_metal_tpu.kernels import flash_attention_fwd
from flash_attention_metal_tpu.reference import make_qkv
from flash_attention_metal_tpu.utils.comp_cache import enable_compilation_cache
from flash_attention_metal_tpu.utils.timing import measure_kernel_pair


def main():
    enable_compilation_cache()
    B, H, N, D = 16, 8, 2048, 64
    q, k, v = make_qkv(jax.random.PRNGKey(0), (B, H, N, D), dtype=jnp.bfloat16)
    ours = functools.partial(flash_attention_fwd, causal=True)
    results = {}

    # --- jax.experimental flash_attention ---
    try:
        from jax.experimental.pallas.ops.tpu.flash_attention import (
            BlockSizes as JBlock,
            flash_attention as jax_flash,
        )

        cands = [
            dict(block_q=bq, block_k_major=bk, block_k=bk, block_b=1)
            for bq, bk in ((512, 512), (1024, 1024), (512, 1024))
        ]
        for c in cands:
            fn = functools.partial(
                jax_flash, causal=True, block_sizes=JBlock(**c)
            )
            try:
                r = measure_kernel_pair(
                    ours, (q, k, v), fn, (q, k, v),
                    iters=10, inner_hi=5, repeats=3,
                )
            except Exception as e:  # noqa: BLE001 - race skips
                print(f"jax_flash {c}: SKIP {str(e).splitlines()[0][:80]}")
                continue
            tag = f"jax_flash_{c['block_q']}x{c['block_k_major']}"
            results[tag] = {
                "ours_us": r["a_s"] * 1e6,
                "theirs_us": r["b_s"] * 1e6,
                "ours_over_theirs_speedup": r["b_s"] / r["a_s"],
            }
            print(
                f"{tag}: ours {r['a_s']*1e6:.0f} us vs {r['b_s']*1e6:.0f} us"
                f" (we are {r['b_s']/r['a_s']:.2f}x faster)"
            )
    except ImportError as e:
        print(f"jax flash unavailable: {e}")

    # --- splash attention ---
    try:
        from jax.experimental.pallas.ops.tpu.splash_attention import (
            splash_attention_kernel as sk,
            splash_attention_mask as sm,
        )

        mask = sm.MultiHeadMask(
            [sm.CausalMask((N, N)) for _ in range(H)]
        )
        for bq, bkv in ((512, 512), (1024, 1024)):
            block_sizes = sk.BlockSizes(
                block_q=bq, block_kv=bkv, block_kv_compute=bkv,
            )
            kernel = sk.make_splash_mha(
                mask=mask, head_shards=1, q_seq_shards=1,
                block_sizes=block_sizes,
            )

            def splash(qq, kk, vv, _kernel=kernel):
                return jax.vmap(_kernel)(qq, kk, vv)

            try:
                r = measure_kernel_pair(
                    ours, (q, k, v), splash, (q, k, v),
                    iters=10, inner_hi=5, repeats=3,
                )
            except Exception as e:  # noqa: BLE001
                print(f"splash {bq}x{bkv}: SKIP {str(e).splitlines()[0][:80]}")
                continue
            tag = f"splash_{bq}x{bkv}"
            results[tag] = {
                "ours_us": r["a_s"] * 1e6,
                "theirs_us": r["b_s"] * 1e6,
                "ours_over_theirs_speedup": r["b_s"] / r["a_s"],
            }
            print(
                f"{tag}: ours {r['a_s']*1e6:.0f} us vs {r['b_s']*1e6:.0f} us"
                f" (we are {r['b_s']/r['a_s']:.2f}x faster)"
            )
    except ImportError as e:
        print(f"splash unavailable: {e}")

    with open("experiments/platform_race.json", "w") as f:
        json.dump(results, f, indent=2)
    print("wrote experiments/platform_race.json")


if __name__ == "__main__":
    main()
