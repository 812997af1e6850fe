"""Forward-kernel tuning experiments on the real chip.

Compares our flash_attention_fwd against jax's reference Pallas TPU flash
kernel and sweeps block sizes at the high-occupancy benchmark shape.
Run: timeout 590 python experiments/tune_fwd.py
"""

import functools
import sys

import jax
import jax.numpy as jnp

from flash_attention_metal_tpu.config import BlockSizes
from flash_attention_metal_tpu.kernels import flash_attention_fwd
from flash_attention_metal_tpu.reference import make_qkv
from flash_attention_metal_tpu.utils import attention_flops
from flash_attention_metal_tpu.utils.timing import measure_compiled

B, H, N, D = 16, 8, 2048, 64
CAUSAL = True


def bench(label, fn, args, flops, iters=14):
    t = measure_compiled(fn, args, iters=iters)["median_s"]
    print(f"{label:55s} {t*1e3:8.3f} ms  {flops/t/1e12:6.1f} TF/s", flush=True)
    return t


def main():
    q, k, v = make_qkv(jax.random.PRNGKey(7), (B, H, N, D), dtype=jnp.bfloat16)
    flops = attention_flops(B, H, N, N, D, causal=CAUSAL)

    # jax reference kernel
    try:
        from jax.experimental.pallas.ops.tpu import flash_attention as jfa

        fn = functools.partial(jfa.flash_attention, causal=CAUSAL)
        bench("jax pallas ops flash (defaults)", fn, (q, k, v), flops)
        bs = jfa.BlockSizes(
            block_q=512, block_k_major=512, block_k=512, block_b=1
        )
        fn = functools.partial(jfa.flash_attention, causal=CAUSAL, block_sizes=bs)
        bench("jax pallas ops flash (512 blocks)", fn, (q, k, v), flops)
    except Exception as e:  # pragma: no cover
        print("jax ref kernel failed:", e)

    # ours: default + save_lse
    for lse in (False, True):
        fn = functools.partial(
            flash_attention_fwd, causal=CAUSAL, save_lse=lse
        )
        bench(f"ours default blocks save_lse={lse}", fn, (q, k, v), flops)

    # block sweep (no lse)
    sweeps = [
        (256, 512, 512),
        (512, 512, 512),
        (512, 1024, 512),
        (512, 1024, 1024),
        (512, 2048, 512),
        (1024, 512, 512),
        (1024, 1024, 512),
        (1024, 2048, 512),
        (2048, 512, 512),
        (2048, 1024, 1024),
    ]
    for bq, bkM, bk in sweeps:
        bs = BlockSizes(block_q=bq, block_k_major=bkM, block_k=bk)
        fn = functools.partial(
            flash_attention_fwd, causal=CAUSAL, block_sizes=bs
        )
        try:
            bench(f"ours bq={bq} bkM={bkM} bk={bk}", fn, (q, k, v), flops)
        except Exception as e:
            print(f"ours bq={bq} bkM={bkM} bk={bk} FAILED: {type(e).__name__}",
                  file=sys.stderr)


if __name__ == "__main__":
    main()
