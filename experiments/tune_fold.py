"""One-off sweep: lean-path batch-fold size on the real chip.

Paired interleaved measurement (CLAUDE.md discipline) of the small-N
dispatch-amortized sweep points with _FOLD_ROWS overridden, to pick the
shipped fold heuristic.
Run: timeout 590 env PYTHONPATH=/root/repo python experiments/tune_fold.py N
"""

import functools
import sys

import jax
import jax.numpy as jnp

from flash_attention_metal_tpu.utils.comp_cache import enable_compilation_cache

enable_compilation_cache()

from flash_attention_metal_tpu.kernels import flash_attention_mxu, naive_attention
from flash_attention_metal_tpu.kernels import flash_fwd as ff
from flash_attention_metal_tpu.reference import make_qkv
from flash_attention_metal_tpu.utils.timing import measure_kernel_pair


def main():
    assert jax.default_backend() == "tpu"
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    b = max(1, (1 << 21) // (n * n))
    q, k, v = make_qkv(jax.random.PRNGKey(42), (b, 1, n, 64))
    qh, kh, vh = (x.astype(jnp.bfloat16) for x in (q, k, v))
    for causal in (False, True):
        for rows in (n, 1024, 2048, 4096):
            if rows < n:
                continue
            ff._FOLD_ROWS = rows
            fold = ff._lean_batch_fold(b, n, n)
            ff.flash_attention_fwd.clear_cache()
            flash_attention_mxu.clear_cache()
            pair = measure_kernel_pair(
                functools.partial(naive_attention, causal=causal),
                (q, k, v),
                functools.partial(flash_attention_mxu, causal=causal),
                (qh, kh, vh),
                iters=16,
                inner_hi=17,
                repeats=5,
            )
            print(
                f"N={n} B={b} causal={causal} rows={rows} fold={fold}: "
                f"naive {pair['a_s']*1e6:.1f} us, flash {pair['b_s']*1e6:.1f} us, "
                f"speedup {pair['ratio']:.2f}x",
                flush=True,
            )


if __name__ == "__main__":
    main()
