"""Block-size autotuner — the reference's occupancy study, automated.

The reference hand-swept 16x16 vs 32x32 threadgroup tiles and recorded
the result in prose (``README.md:25-28``, ``project_narrative.md:36-37``);
here the sweep is a harness: measure candidate ``BlockSizes`` for a
given attention shape on the current backend, pick the fastest, and
persist the decision keyed by (chip, direction, shape, flags) so later
runs can load it.

Run: ``timeout 590 python -m flash_attention_metal_tpu.harness.autotune``
Writes/updates ``autotune_cache.json``.
"""

from __future__ import annotations

import argparse
import functools
import itertools
import json
import os
from typing import List, Tuple

import jax
import jax.numpy as jnp

from ..config import BlockSizes
from ..kernels import flash_attention_bwd, flash_attention_fwd
from ..reference import make_qkv
from ..utils import detect_chip
from ..utils.timing import measure_kernel_stable

DEFAULT_CACHE = "autotune_cache.json"

# Candidate tile sizes (multiples of the 128-lane minimum).
_FWD_TILES = (256, 512, 1024, 2048)
_BWD_TILES = (256, 512, 1024)


def _key(kind: str, b, h, n_q, n_kv, d, causal, dtype) -> str:
    chip = detect_chip().name
    return (
        f"{chip}/{kind}/b{b}h{h}q{n_q}kv{n_kv}d{d}"
        f"/causal{int(causal)}/{jnp.dtype(dtype).name}"
    )


def _load(path: str) -> dict:
    if os.path.exists(path):
        with open(path) as f:
            return json.load(f)
    return {}


def _store(path: str, cache: dict) -> None:
    with open(path, "w") as f:
        json.dump(cache, f, indent=2, sort_keys=True)


def fwd_candidates(n_q: int, n_kv: int) -> List[BlockSizes]:
    out = []
    for bq, bk in itertools.product(_FWD_TILES, _FWD_TILES):
        if bq > n_q or bk > n_kv or n_q % bq or n_kv % bk:
            continue
        out.append(BlockSizes(block_q=bq, block_k_major=bk, block_k=bk))
    return out or [BlockSizes.for_seq_len(n_q, n_kv)]


def bwd_candidates(n_q: int, n_kv: int) -> List[BlockSizes]:
    out = []
    for bq, bk in itertools.product(_BWD_TILES, _BWD_TILES):
        if bq > n_q or bk > n_kv or n_q % bq or n_kv % bk:
            continue
        out.append(
            BlockSizes(
                block_q_dkv=bq,
                block_kv_dkv=bk,
                block_q_dq=bq,
                block_kv_dq=bk,
            )
        )
    return out or [BlockSizes.for_seq_len(n_q, n_kv)]


def autotune_fwd(
    shape: Tuple[int, int, int, int],
    *,
    causal: bool = True,
    dtype=jnp.bfloat16,
    cache_path: str = DEFAULT_CACHE,
    force: bool = False,
    log=print,
) -> BlockSizes:
    """Pick the fastest forward BlockSizes for ``(B, H, N, D)``."""
    b, h, n, d = shape
    key = _key("fwd", b, h, n, n, d, causal, dtype)
    cache = _load(cache_path)
    if key in cache and not force:
        return BlockSizes(**cache[key]["blocks"])

    q, k, v = make_qkv(jax.random.PRNGKey(0), shape, dtype=dtype)
    interpret = jax.default_backend() != "tpu"
    best, best_t = None, float("inf")
    for bs in fwd_candidates(n, n):
        fn = functools.partial(
            flash_attention_fwd,
            causal=causal,
            block_sizes=bs,
            interpret=interpret,
        )
        try:
            t = measure_kernel_stable(fn, (q, k, v), iters=10, inner_hi=5,
                                      repeats=3)["median_s"]
        except Exception as e:  # compile failure (e.g. VMEM) -> skip
            log(f"  {bs.block_q}x{bs.block_k_major}: FAIL {type(e).__name__}")
            continue
        log(f"  fwd {key} {bs.block_q}x{bs.block_k_major}: {t*1e6:.1f} us")
        if t < best_t:
            best, best_t = bs, t
    if best is None:
        # Every candidate failed to compile (e.g. VMEM limit on a novel
        # shape): fall back to the heuristic default and do NOT persist —
        # best_t=inf would serialize as invalid JSON and the fallback is
        # not a measured decision.
        log(f"  fwd {key}: all candidates failed; using heuristic default")
        return BlockSizes.for_seq_len(n, n)
    cache[key] = {
        "blocks": {
            "block_q": best.block_q,
            "block_k_major": best.block_k_major,
            "block_k": best.block_k,
        },
        "us": best_t * 1e6,
    }
    _store(cache_path, cache)
    return best


def autotune_bwd(
    shape: Tuple[int, int, int, int],
    *,
    causal: bool = True,
    dtype=jnp.bfloat16,
    cache_path: str = DEFAULT_CACHE,
    force: bool = False,
    log=print,
) -> BlockSizes:
    """Pick the fastest backward BlockSizes for ``(B, H, N, D)``."""
    b, h, n, d = shape
    key = _key("bwd", b, h, n, n, d, causal, dtype)
    cache = _load(cache_path)
    if key in cache and not force:
        return BlockSizes(**cache[key]["blocks"])

    q, k, v = make_qkv(jax.random.PRNGKey(0), shape, dtype=dtype)
    interpret = jax.default_backend() != "tpu"
    o, lse = flash_attention_fwd(
        q, k, v, causal=causal, save_lse=True, interpret=interpret
    )
    do = q * 0.01
    best, best_t = None, float("inf")
    for bs in bwd_candidates(n, n):
        fn = functools.partial(
            flash_attention_bwd,
            causal=causal,
            block_sizes=bs,
            interpret=interpret,
        )
        try:
            t = measure_kernel_stable(
                fn, (q, k, v, o, do, lse), iters=8, inner_hi=3, repeats=3
            )["median_s"]
        except Exception as e:
            log(f"  {bs.block_q_dkv}x{bs.block_kv_dkv}: FAIL {type(e).__name__}")
            continue
        log(
            f"  bwd {key} {bs.block_q_dkv}x{bs.block_kv_dkv}: {t*1e6:.1f} us"
        )
        if t < best_t:
            best, best_t = bs, t
    if best is None:
        log(f"  bwd {key}: all candidates failed; using heuristic default")
        return BlockSizes.for_seq_len(n, n)
    cache[key] = {
        "blocks": {
            "block_q_dkv": best.block_q_dkv,
            "block_kv_dkv": best.block_kv_dkv,
            "block_q_dq": best.block_q_dq,
            "block_kv_dq": best.block_kv_dq,
        },
        "us": best_t * 1e6,
    }
    _store(cache_path, cache)
    return best


def main() -> int:
    from ..utils.comp_cache import enable_compilation_cache

    enable_compilation_cache()

    ap = argparse.ArgumentParser()
    ap.add_argument("--cache", default=DEFAULT_CACHE)
    ap.add_argument("--force", action="store_true")
    args = ap.parse_args()
    # Flagship shapes: the high-occupancy benchmark and long single-head.
    for shape in ((16, 8, 2048, 64), (1, 1, 8192, 64), (1, 1, 16384, 64)):
        bs = autotune_fwd(shape, cache_path=args.cache, force=args.force)
        print(f"fwd {shape}: block_q={bs.block_q} block_k={bs.block_k_major}")
    bs = autotune_bwd((16, 8, 2048, 64), cache_path=args.cache, force=args.force)
    print(
        f"bwd (16,8,2048,64): dkv {bs.block_q_dkv}x{bs.block_kv_dkv}, "
        f"dq {bs.block_q_dq}x{bs.block_kv_dq}"
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())


_MEMO = None


def lookup(kind: str, b, h, n_q, n_kv, d, causal, dtype,
           cache_path: str = DEFAULT_CACHE):
    """Cached lookup of a tuned BlockSizes; None if never tuned.

    Loads the JSON once per process (re-load by resetting the module
    global).  Safe to call at trace time.
    """
    global _MEMO
    if _MEMO is None:
        _MEMO = _load(cache_path)
    entry = _MEMO.get(_key(kind, b, h, n_q, n_kv, d, causal, dtype))
    if entry is None:
        return None
    return BlockSizes(**entry["blocks"])
