"""Round-5 experiment 7: V1 block-size race at the mid-N sweep shapes.

V1 loses to naive at N=2048-8192 (CSV SpeedupV1 0.95-0.98; 0.84 at the
new 2^23-amortized N=2048 after the base-2 change fixed N=1024).  The
TPU "naive" is structurally lean — one wide QK^T + two-pass softmax per
q block — so V1's online-softmax streaming must amortize its per-KV-step
state updates over larger blocks to match it.  This races (block_q,
block_k) pairs that keep >= 2 KV streaming steps (the defining FA-1
trait; a single-KV-block config would collapse the online recurrence
and stop being V1).

Usage: timeout 590 env PYTHONPATH=/root/repo:/root/.axon_site python experiments/v1_blocks.py
"""

import functools
import json

import jax

from flash_attention_metal_tpu.harness.benchmark import amortizing_batch
from flash_attention_metal_tpu.kernels import (
    flash_attention_v1,
    naive_attention,
)
from flash_attention_metal_tpu.reference import make_qkv
from flash_attention_metal_tpu.utils.comp_cache import enable_compilation_cache
from flash_attention_metal_tpu.utils.timing import measure_kernel_pair


def main():
    enable_compilation_cache()
    results = {}
    for n in (1024, 2048, 4096, 8192):
        b = amortizing_batch(n)
        q, k, v = make_qkv(jax.random.PRNGKey(1), (b, 1, n, 64))
        cands = [
            (bq, bk)
            for bq in (512, 1024)
            for bk in (512, 1024, 2048, 4096)
            if bq <= n and bk <= n // 2 and n % bq == 0 and n % bk == 0
        ]
        for bq, bk in cands:
            fn = functools.partial(
                flash_attention_v1, block_q=bq, block_k=bk
            )
            try:
                r = measure_kernel_pair(
                    naive_attention, (q, k, v), fn, (q, k, v),
                    iters=10, inner_hi=5, repeats=3,
                )
            except (jax.errors.JaxRuntimeError, ValueError) as e:
                print(f"n={n} v1 {bq}x{bk}: SKIP "
                      f"{str(e).splitlines()[0][:90]}", flush=True)
                continue
            results[f"n{n}_{bq}x{bk}"] = {
                "naive_us": r["a_s"] * 1e6,
                "v1_us": r["b_s"] * 1e6,
                "speedup": r["ratio"],
            }
            print(
                f"n={n} b={b} v1 {bq}x{bk}: naive {r['a_s']*1e6:.1f} vs "
                f"{r['b_s']*1e6:.1f} us (speedup {r['ratio']:.3f})"
            )

    with open("experiments/v1_blocks.json", "w") as f:
        json.dump(results, f, indent=2)
    print("wrote experiments/v1_blocks.json")


if __name__ == "__main__":
    main()
