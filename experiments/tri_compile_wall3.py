"""Stage-3 compile-wall ladder: threshold search + the 2048-tile escape.

Stage 2 isolated the N=8192 Mosaic failure to the COMBINATION of
static-unrolled online-softmax chains and the 8192 extent: 36 pairs
without softmax compile, 8 softmax pairs compile, 36 softmax pairs fail
(the same 36 softmax pairs at N=4096 compile).  Stage 3 searches the
pair threshold at N=8192 (n_qblocks x causal slices at 1024-tiles:
2 -> 3 pairs, 4 -> 10, 6 -> 21, 8 -> 36) and tests the escape hatch:
the REAL flash_attention_tri at 2048x2048 tiles (4 q-blocks -> 10
visible pairs) at N=8192.

Usage: timeout 590 env PYTHONPATH=/root/repo:/root/.axon_site \
    python experiments/tri_compile_wall3.py
Writes experiments/tri_compile_wall3.json.
"""

import functools
import json

import jax
import jax.numpy as jnp

from tri_compile_wall2 import N, _body, _make, _try


def main():
    from flash_attention_metal_tpu.utils.comp_cache import (
        enable_compilation_cache,
    )

    enable_compilation_cache()
    print("devices:", jax.devices(), flush=True)
    results = {}
    for nq in (2, 4, 6):
        fn, args = _make(
            functools.partial(
                _body, n_qblocks=nq, softmax=True, mask_last=True
            )
        )
        _try(f"multisfm_q{nq}_n{N}", fn, args, results)

    from flash_attention_metal_tpu.kernels.flash_tri import (
        flash_attention_tri,
    )

    shp = jax.ShapeDtypeStruct((1, 1, N, 64), jnp.bfloat16)
    fn = functools.partial(flash_attention_tri, block_q=2048, block_k=2048)
    _try(f"tri2048_n{N}", fn, (shp, shp, shp), results)
    fn = functools.partial(
        flash_attention_tri, block_q=2048, block_k=2048, pv_transposed=True
    )
    _try(f"tri2048pvt_n{N}", fn, (shp, shp, shp), results)

    import os

    out = os.path.join(os.path.dirname(__file__), "tri_compile_wall3.json")
    with open(out, "w") as f:
        json.dump(results, f, indent=2)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
