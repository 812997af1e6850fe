"""Round-5 experiment 4: measured MXU rates for attention's matmul shapes.

The roofline model caps attention at D/128 of dense peak (utils/
roofline.py:mxu_width_factor) on the argument that one dimension is
pinned to head_dim.  But the split backward's executed matmul area
(~5.25 full squares at 1024-tiles, 7 matmuls with 0.75 visible-pair
area) at that cap would take 3.66 ms — and it MEASURES 2.41 ms.  At
least the deep-contraction gradient matmuls (dV/dK/dQ: [N,N]x[N,64])
must run well above 98.5 TF/s, i.e. the D/128 cap applies per *pinned
dimension kind*, not uniformly.

This measures effective TF/s for each shape class (bf16, fp32 accum,
batched to amortize):

  qk_256    [256,64]x[64,256]    contraction 64   (fwd S tile)
  pv_256    [256,256]x[256,64]   output width 64  (fwd PV tile)
  qk_1024   [1024,64]x[64,1024]  contraction 64   (bwd S at 1024-tiles)
  dv_1024   [1024,1024]x[1024,64] deep contraction, narrow output
  dv_2048   [2048,2048]x[2048,64]
  ctrl_2048 [2048,2048]x[2048,2048]  dense control (~182 TF/s expected)

Rates feed the corrected per-shape cost models for both directions
(docs/optimization_narrative.md round-5 section).

Usage: timeout 590 env PYTHONPATH=/root/repo:/root/.axon_site python experiments/mxu_rates.py
"""

import functools
import json

import jax
import jax.numpy as jnp

from flash_attention_metal_tpu.utils.comp_cache import enable_compilation_cache
from flash_attention_metal_tpu.utils.timing import measure_kernel


def _bmm(a, b):
    return jax.lax.dot_general(
        a, b, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )


def main():
    enable_compilation_cache()
    key = jax.random.PRNGKey(0)
    shapes = {
        "qk_256": ((256, 64), (64, 256)),
        "pv_256": ((256, 256), (256, 64)),
        "qk_1024": ((1024, 64), (64, 1024)),
        "dv_1024": ((1024, 1024), (1024, 64)),
        "qk_2048": ((2048, 64), (64, 2048)),
        "dv_2048": ((2048, 2048), (2048, 64)),
        "pv_2048x256": ((2048, 256), (256, 64)),
        "sq_2048x512": ((2048, 512), (512, 2048)),
        "ctrl_2048": ((2048, 2048), (2048, 2048)),
    }
    results = {}
    for name, ((m, kk), (k2, n)) in shapes.items():
        flops_each = 2.0 * m * kk * n
        # Batch to ~5e9 FLOPs per call (~30-50 us at 100-200 TF/s).
        batch = max(1, int(5e9 // flops_each))
        a = jax.random.normal(key, (batch, m, kk), jnp.bfloat16)
        b = jax.random.normal(key, (batch, k2, n), jnp.bfloat16)
        t = measure_kernel(_bmm, (a, b), iters=10, inner_hi=5, repeats=3)[
            "median_s"
        ]
        tf = flops_each * batch / t / 1e12
        results[name] = {
            "batch": batch,
            "us": t * 1e6,
            "tflops": tf,
            "pct_dense_peak": tf / 197.0,
        }
        print(
            f"{name} x{batch}: {t*1e6:.1f} us, {tf:.1f} TF/s "
            f"({tf/197.0:.0%} of dense peak)"
        )

    with open("experiments/mxu_rates.json", "w") as f:
        json.dump(results, f, indent=2)
    print("wrote experiments/mxu_rates.json")


if __name__ == "__main__":
    main()
