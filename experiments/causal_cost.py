"""Round-4 experiment: where does the mid-N causal time go?

The BASELINE metric is causal roofline over N=128-16K; the r3 CSV sits
at 0.455/0.500/0.481 for N=1024/2048/4096 (vs 0.95 non-causal).  This
script measures, on the real chip with paired dual-slope readings:

  phase A  per-grid-step floor — same-FLOPs non-causal configs with
           1x/2x/4x/8x the grid steps (split on the q axis and on the
           kv-major axis separately);
  phase B  causal block-size sweep at the sweep shapes (B amortized),
           incl. rectangular configs the autotuner's pruned grid skips.

Usage: timeout 590 python experiments/causal_cost.py [A|B]
"""

import functools
import json
import sys

import jax
import jax.numpy as jnp

from flash_attention_metal_tpu.config import BlockSizes
from flash_attention_metal_tpu.kernels import flash_attention_fwd
from flash_attention_metal_tpu.reference import make_qkv
from flash_attention_metal_tpu.utils.comp_cache import enable_compilation_cache
from flash_attention_metal_tpu.utils.timing import measure_kernel_stable

MCFG = dict(iters=20, inner_hi=33, repeats=3)


def t_us(shape, causal, bs, lazy=True):
    q, k, v = make_qkv(jax.random.PRNGKey(0), shape, dtype=jnp.bfloat16)
    fn = functools.partial(
        flash_attention_fwd, causal=causal, block_sizes=bs,
        lazy_softmax=lazy,
    )
    try:
        r = measure_kernel_stable(fn, (q, k, v), **MCFG)
    except Exception as e:  # noqa: BLE001 - experiment script
        return None, f"{type(e).__name__}: {str(e).splitlines()[0][:60]}"
    return r["median_s"] * 1e6, None


def phase_a():
    print("== phase A: per-grid-step floor (non-causal, same FLOPs) ==")
    shape = (2, 1, 1024, 64)
    # (bq, bkM, bk): q-splits multiply grid steps via the q axis;
    # kv-major splits via the kv axis.  bk < bkM forces the general
    # (non-lean) path so the 2-step baseline is like-for-like.
    configs = [
        (1024, 1024, 512),   # 2 steps (general path, 1 kv major)
        (512, 1024, 512),    # 4 steps
        (256, 1024, 512),    # 8
        (128, 1024, 512),    # 16
        (1024, 512, 512),    # 4 (kv split)
        (1024, 256, 256),    # 8
        (1024, 128, 128),    # 16
        (1024, 1024, 1024),  # lean/single-block reference
        (512, 512, 512),     # 8 (both split)
        (256, 256, 256),     # 32
    ]
    out = {}
    for bq, bkM, bk in configs:
        steps = 2 * (1024 // bq) * (1024 // bkM)
        t, err = t_us(shape, False, BlockSizes(block_q=bq, block_k_major=bkM, block_k=bk))
        out[f"{bq}x{bkM}x{bk}"] = t
        print(f"  bq={bq:5d} bkM={bkM:5d} bk={bk:5d} steps={steps:3d}: "
              f"{t:.2f} us" if t else f"  {bq}x{bkM}x{bk}: {err}")
    return out


def phase_b():
    print("== phase B: causal block sweep at the sweep shapes ==")
    out = {}
    for n, b in ((1024, 2), (2048, 1), (4096, 1)):
        shape = (b, 1, n, 64)
        print(f"-- N={n} B={b} --")
        t_nc, _ = t_us(shape, False, None)
        print(f"  non-causal default: {t_nc:.2f} us")
        cands = [None]
        for bq in (256, 512, 1024):
            for bkM in (256, 512, 1024):
                if bq > n or bkM > n:
                    continue
                cands.append(BlockSizes(block_q=bq, block_k_major=bkM, block_k=bkM))
        # rectangular inner splits
        cands.append(BlockSizes(block_q=min(512, n), block_k_major=min(2048, n), block_k=512))
        for bs in cands:
            tag = "default" if bs is None else (
                f"{bs.block_q}x{bs.block_k_major}x{bs.block_k}")
            t, err = t_us(shape, True, bs)
            if t is None:
                print(f"  causal {tag}: {err}")
                continue
            out[f"n{n}/{tag}"] = t
            print(f"  causal {tag}: {t:.2f} us  (vs nc {t_nc/t:.2f}x)")
    return out


def main():
    enable_compilation_cache()
    which = sys.argv[1] if len(sys.argv) > 1 else "AB"
    res = {}
    if "A" in which:
        res["A"] = phase_a()
    if "B" in which:
        res["B"] = phase_b()
    if "C" in which:
        only = int(sys.argv[2]) if len(sys.argv) > 2 else None
        phase_c(only)
    with open("experiments/causal_cost.json", "w") as f:
        json.dump(res, f, indent=1)



def phase_c(only_n=None):
    """Triangular kernel vs current causal path, paired (per-shape)."""
    from flash_attention_metal_tpu.kernels.flash_tri import flash_attention_tri
    from flash_attention_metal_tpu.utils.timing import measure_kernel_pair

    print("== phase C: triangular kernel vs shipped causal ==", flush=True)
    import os
    path = "experiments/causal_tri.json"
    out = json.load(open(path)) if os.path.exists(path) else {}
    shapes = [(2, 1, 1024), (1, 1, 2048), (1, 1, 4096), (1, 1, 8192),
              (16, 8, 2048)]
    for b, h, n in shapes:
        if only_n is not None and n * b * h != only_n:
            continue
        shape = (b, h, n, 64)
        q, k, v = make_qkv(jax.random.PRNGKey(0), shape, dtype=jnp.bfloat16)
        cfgs = {(256, 256), (512, 512), (min(1024, n // 4), 256),
                (min(1024, n // 4), 512)}
        for bq, bk in sorted(cfgs):
            if bq > n or n % bq or bq < 128:
                continue
            tag = f"b{b}h{h}n{n}/tri{bq}x{bk}"
            if tag in out:
                print(f"  {tag}: cached {out[tag]['b_s']*1e6:.2f} us", flush=True)
                continue
            try:
                r = measure_kernel_pair(
                    functools.partial(flash_attention_fwd, causal=True),
                    (q, k, v),
                    functools.partial(
                        flash_attention_tri, block_q=bq, block_k=bk
                    ),
                    (q, k, v),
                    iters=16, inner_hi=17 if n <= 4096 else 5, repeats=3,
                )
            except Exception as e:  # noqa: BLE001
                print(f"  {tag}: {type(e).__name__}: "
                      f"{str(e).splitlines()[0][:70]}", flush=True)
                continue
            out[tag] = r
            print(f"  {tag}: cur {r['a_s']*1e6:.2f} us vs tri "
                  f"{r['b_s']*1e6:.2f} us  ratio {r['ratio']:.2f}x", flush=True)
            with open(path, "w") as f:
                json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
