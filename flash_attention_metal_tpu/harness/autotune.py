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
from ..kernels import (
    flash_attention_bwd,
    flash_attention_bwd_fused,
    flash_attention_fwd,
)
from ..reference import make_qkv
from ..utils import detect_chip
from ..utils.timing import measure_kernel_stable

DEFAULT_CACHE = "autotune_cache.json"

# Candidate tile sizes (multiples of the 128-lane minimum).
_FWD_TILES = (128, 256, 512, 1024, 2048)
_BWD_TILES = (128, 256, 512, 1024)

# Errors that mean "this candidate doesn't compile/fit" (VMEM overflow
# surfaces as XlaRuntimeError/RESOURCE_EXHAUSTED under
# jax.errors.JaxRuntimeError; Mosaic lowering rejections raise
# NotImplementedError/ValueError).  Config typos (TypeError/KeyError/
# AttributeError) must propagate, not masquerade as skips.
_COMPILE_ERRORS = (jax.errors.JaxRuntimeError, ValueError, NotImplementedError)


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
    """Forward tile candidates: block_q x block_k_major combos plus
    whole-KV (lean-path) variants, VMEM-guarded.

    Round 1's grid was square-only (bq == bk, 4 sizes); the winning
    configs on v5e are frequently rectangular (small block_q against a
    large KV major for DMA depth), so the grid now covers the full
    product, the 128-row minimum tile, and — for shapes whose whole KV
    fits one major block — the two-pass lean variants.
    """
    out = []
    for bq, bk in itertools.product(_FWD_TILES, _FWD_TILES):
        if bq > n_q or bk > n_kv or n_q % bq or n_kv % bk:
            continue
        # Live fp32 score tile must fit scoped VMEM alongside staging.
        if bq * bk * 4 > 20 * 1024 * 1024:
            continue
        # Prune the never-wins corners at large N (sub-256 rows starve
        # the MXU; sub-512 KV majors make DMAs too shallow) — each
        # candidate costs two remote scan-harness compiles, so the grid
        # must stay ~a dozen per shape.
        if n_q >= 2048 and bq < 256:
            continue
        if n_kv >= 2048 and bk < 512:
            continue
        out.append(BlockSizes(block_q=bq, block_k_major=bk, block_k=bk))
    if n_kv <= 4096:
        # Whole-KV major: single_block / lean path when bq covers n_q too.
        # Each config also races its transposed-PV twin (round 5 —
        # lean_pv_t widens the PV output; experiments/mxu_rates.py).
        for bq in _FWD_TILES:
            if bq <= n_q and n_q % bq == 0 and bq * n_kv * 4 <= 20 * 1024 * 1024:
                for pvt in (False, True):
                    bs = BlockSizes(
                        block_q=bq, block_k_major=n_kv, block_k=n_kv,
                        lean_pv_t=pvt,
                    )
                    if bs not in out:
                        out.append(bs)
    return out or [BlockSizes.for_seq_len(n_q, n_kv)]


def bwd_candidates(n_q: int, n_kv: int) -> List[Tuple[str, BlockSizes]]:
    """(impl, blocks) candidates over BOTH backward implementations:
    the FA-2 two-kernel split and the fused 5-matmul variant."""
    out = []
    for bq, bk in itertools.product(_BWD_TILES, _BWD_TILES):
        if bq > n_q or bk > n_kv or n_q % bq or n_kv % bk:
            continue
        if n_q >= 2048 and (bq < 256 or bk < 256):
            continue
        out.append((
            "split",
            BlockSizes(
                block_q_dkv=bq,
                block_kv_dkv=bk,
                block_q_dq=bq,
                block_kv_dq=bk,
            ),
        ))
    for bq in _BWD_TILES:
        if bq > n_q or n_q % bq or (n_q >= 2048 and bq < 256):
            continue
        for bkv in (1024, 2048):
            if bkv > n_kv or n_kv % bkv:
                continue
            out.append((
                "fused",
                BlockSizes(block_q_fused=bq, block_kv_fused=bkv),
            ))
    return out or [("split", BlockSizes.for_seq_len(n_q, n_kv))]


def _measure_cfg(b, h, n_q, n_kv, d) -> dict:
    """Size-scaled measurement effort: microsecond-scale kernels need a
    high inner-repeat count for the dual-slope difference to rise above
    tunnel noise (same policy as harness.benchmark)."""
    est_s = 4 * b * h * n_q * n_kv * d / 50e12
    if jax.default_backend() != "tpu":
        return dict(iters=2, inner_hi=2, repeats=1)
    if est_s < 5e-6:
        return dict(iters=20, inner_hi=65, repeats=3)
    if est_s < 5e-5:
        return dict(iters=20, inner_hi=17, repeats=3)
    return dict(iters=10, inner_hi=5, repeats=2)


def tri_candidates(n: int) -> List[Tuple[int, int, bool]]:
    """(block_q, block_k, pv_transposed) candidates for the triangular
    causal kernel (``kernels.flash_tri``): one grid step per (b, h),
    static unroll, so tiles can be small without paying grid-step
    floors.  The unroll size (visible block pairs) is capped to bound
    compile time.  Transposed-PV variants race only at >=512 q tiles —
    at 256-tiles pv_t measured 16-29% slower (Mosaic materializes a
    transpose; experiments/tri_pvt.py)."""
    from ..kernels.flash_tri import _TRI_MAX_N

    out = []
    if n > _TRI_MAX_N:
        # Measured Mosaic compile wall: every tri config at N=8192 fails
        # AOT compilation on v5e (round-5 race log) regardless of unroll
        # size — don't waste race time on candidates that cannot build.
        return out
    for bq in (128, 256, 512):
        for bk in (128, 256, 512):
            if bq > n or n % bq:
                continue
            # pairs ~ (n/bq)*(n/bk)/2; cap the static unroll at ~300.
            if (n // bq) * (n // bk) > 600:
                continue
            out.append((bq, bk, False))
            if bq >= 512 and bk >= 256:
                out.append((bq, bk, True))
    return out


def autotune_fwd(
    shape: Tuple[int, int, int, int],
    *,
    causal: bool = True,
    dtype=jnp.bfloat16,
    cache_path: str = DEFAULT_CACHE,
    force: bool = False,
    log=print,
) -> BlockSizes:
    """Pick the fastest forward implementation + tiles for ``(B,H,N,D)``.

    Causal shapes race BOTH the grid kernel (``flash_attention_fwd``
    block configs) and the triangular statically-unrolled kernel
    (``flash_attention_tri`` tile configs); the winner's ``impl`` is
    persisted and ``flash_attention_fwd`` routes through it at trace
    time (``lookup_fwd_impl``).
    """
    from ..kernels.flash_tri import flash_attention_tri

    b, h, n, d = shape
    key = _key("fwd", b, h, n, n, d, causal, dtype)
    cache = _load(cache_path)
    if key in cache and not force:
        entry = cache[key]
        if entry.get("impl") == "tri":
            # tri entries carry (block_q, block_k, pvt) tile configs, not
            # grid BlockSizes — the router reads them via lookup_fwd_impl.
            return BlockSizes.for_seq_len(n, n)
        return BlockSizes(**entry["blocks"])

    q, k, v = make_qkv(jax.random.PRNGKey(0), shape, dtype=dtype)
    interpret = jax.default_backend() != "tpu"
    mcfg = _measure_cfg(b, h, n, n, d)
    best, best_t, best_impl = None, float("inf"), "grid"
    cands = [("grid", bs) for bs in fwd_candidates(n, n)]
    if causal and not interpret:
        # Interpreter-mode timings are meaningless; racing the unrolled
        # tri kernel there is also minutes-slow.  Real-chip runs only.
        cands += [("tri", bqbk) for bqbk in tri_candidates(n)]
    for impl, cfg in cands:
        if impl == "tri":
            bq, bk, pvt = cfg
            fn = functools.partial(
                flash_attention_tri, block_q=bq, block_k=bk,
                pv_transposed=pvt, interpret=interpret,
            )
            tag = f"tri {bq}x{bk}" + ("T" if pvt else "")
        else:
            fn = functools.partial(
                flash_attention_fwd,
                causal=causal,
                block_sizes=cfg,
                interpret=interpret,
            )
            tag = f"{cfg.block_q}x{cfg.block_k_major}x{cfg.block_k}" + (
                "T" if cfg.lean_pv_t else ""
            )
        try:
            t = measure_kernel_stable(fn, (q, k, v), **mcfg)["median_s"]
        except _COMPILE_ERRORS as e:
            # Compile/lowering failure (VMEM overflow, unsupported Mosaic
            # op) — a legitimate "candidate doesn't fit" skip.  Anything
            # else (config typo -> TypeError/KeyError) propagates.
            log(
                f"  {tag}: SKIP "
                f"{type(e).__name__}: {str(e).splitlines()[0][:100]}"
            )
            continue
        log(f"  fwd {key} {tag}: {t*1e6:.1f} us")
        if t < best_t:
            best, best_t, best_impl = cfg, t, impl
    if best is None:
        # Every candidate failed to compile (e.g. VMEM limit on a novel
        # shape): fall back to the heuristic default and do NOT persist —
        # best_t=inf would serialize as invalid JSON and the fallback is
        # not a measured decision.
        log(f"  fwd {key}: all candidates failed; using heuristic default")
        return BlockSizes.for_seq_len(n, n)
    if best_impl == "tri":
        cache[key] = {
            "impl": "tri",
            "blocks": {
                "block_q": best[0], "block_k": best[1], "pvt": best[2],
            },
            "us": best_t * 1e6,
        }
        _store(cache_path, cache)
        return BlockSizes.for_seq_len(n, n)
    cache[key] = {
        "blocks": {
            "block_q": best.block_q,
            "block_k_major": best.block_k_major,
            "block_k": best.block_k,
            "lean_pv_t": best.lean_pv_t,
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
        entry = cache[key]
        if entry.get("impl") == "tri":
            return BlockSizes.for_seq_len(n, n)
        return BlockSizes(**entry["blocks"])

    q, k, v = make_qkv(jax.random.PRNGKey(0), shape, dtype=dtype)
    interpret = jax.default_backend() != "tpu"
    o, lse = flash_attention_fwd(
        q, k, v, causal=causal, save_lse=True, interpret=interpret
    )
    do = q * 0.01
    mcfg = _measure_cfg(b, h, n, n, d)
    cands = list(bwd_candidates(n, n))
    if causal and not interpret:
        # Race the fused triangular static-unroll backward too (same
        # mechanism as the forward tri race; causal static offsets only;
        # real-chip runs only, as in autotune_fwd).  Same sub-256-tile
        # exclusion at n>=2048 as bwd_candidates: the unrolled-backward
        # compiles are minutes-scale and 128-tiles measured far off the
        # split winner (5080 vs 2393 us at B16 H8 N2048).
        cands += [
            ("tri", (bq, bk, pvt))
            for bq, bk, pvt in tri_candidates(n)
            if not (n >= 2048 and (bq < 256 or bk < 256))
        ]
    best, best_impl, best_t = None, "split", float("inf")
    for impl, bs in cands:
        if impl == "tri":
            bq, bk, pvt = bs
            from ..kernels.flash_tri import flash_attention_bwd_tri

            fn = functools.partial(
                flash_attention_bwd_tri, block_q=bq, block_k=bk,
                pv_transposed=pvt, interpret=interpret,
            )
            tag = f"tri {bq}x{bk}" + ("T" if pvt else "")
        else:
            kern = (
                flash_attention_bwd_fused if impl == "fused"
                else flash_attention_bwd
            )
            fn = functools.partial(
                kern, causal=causal, block_sizes=bs, interpret=interpret
            )
            tag = (
                f"fused {bs.block_q_fused}x{bs.block_kv_fused}"
                if impl == "fused"
                else f"split {bs.block_q_dkv}x{bs.block_kv_dkv}"
            )
        try:
            t = measure_kernel_stable(
                fn, (q, k, v, o, do, lse), **mcfg
            )["median_s"]
        except _COMPILE_ERRORS as e:
            log(
                f"  {tag}: SKIP {type(e).__name__}: "
                f"{str(e).splitlines()[0][:100]}"
            )
            continue
        log(f"  bwd {key} {tag}: {t*1e6:.1f} us")
        if t < best_t:
            best, best_impl, best_t = bs, impl, t
    if best is None:
        log(f"  bwd {key}: all candidates failed; using heuristic default")
        return BlockSizes.for_seq_len(n, n)
    if best_impl == "tri":
        cache[key] = {
            "impl": "tri",
            "blocks": {
                "block_q": best[0], "block_k": best[1], "pvt": best[2],
            },
            "us": best_t * 1e6,
        }
        _store(cache_path, cache)
        return BlockSizes.for_seq_len(n, n)
    cache[key] = {
        "impl": best_impl,
        "blocks": {
            "block_q_dkv": best.block_q_dkv,
            "block_kv_dkv": best.block_kv_dkv,
            "block_q_dq": best.block_q_dq,
            "block_kv_dq": best.block_kv_dq,
            "block_q_fused": best.block_q_fused,
            "block_kv_fused": best.block_kv_fused,
        },
        "us": best_t * 1e6,
    }
    _store(cache_path, cache)
    return best


def _fallback_fwd_fn(b, h, n_q, n_kv, d, causal, interpret):
    """The fn the router would run on a cache MISS for this shape — the
    baseline any cache entry must beat to stay (round 5: for plain
    causal shapes that is the heuristic-tiled tri kernel, the shipped
    default; grid for_seq_len otherwise).  Returns (fn, tag, entry)
    where ``entry`` is the cache payload recording the fallback as the
    measured decision (validate() persists it when a tuned entry loses,
    so the shape stays marked as raced for the coverage audit)."""
    if causal:
        from ..kernels.flash_tri import flash_attention_tri, tri_heuristic

        heur = tri_heuristic(b, h, n_q, n_kv, d, n_kv - n_q)
        if heur is not None:
            return (
                functools.partial(
                    flash_attention_tri,
                    block_q=heur[0],
                    block_k=heur[1],
                    pv_transposed=heur[2],
                    interpret=interpret,
                ),
                f"tri-heur {heur[0]}x{heur[1]}" + ("T" if heur[2] else ""),
                {
                    "impl": "tri",
                    "blocks": {
                        "block_q": heur[0],
                        "block_k": heur[1],
                        "pvt": heur[2],
                    },
                },
            )
    default = BlockSizes.for_seq_len(n_q, n_kv)
    return (
        functools.partial(
            flash_attention_fwd, causal=causal, block_sizes=default,
            interpret=interpret,
        ),
        f"grid {default.block_q}x{default.block_k_major}",
        {
            "blocks": {
                "block_q": default.block_q,
                "block_k_major": default.block_k_major,
                "block_k": default.block_k,
                "lean_pv_t": default.lean_pv_t,
            },
        },
    )


def validate(cache_path: str = DEFAULT_CACHE, log=print) -> None:
    """Paired re-check of every fwd cache entry against the shipped
    cache-miss fallback; entries that do not beat it are dropped.

    Single-shot tuner readings on a tunneled chip can bounce +-50% and
    crown a bad candidate; the drift-matched paired ratio is the
    authoritative comparison (same policy as bench.py).  The baseline is
    whatever the router would do WITHOUT the entry — heuristic-tiled tri
    for plain causal shapes, grid for_seq_len otherwise — so a kept
    entry is a measured improvement over the actual default, and a
    dropped one falls back to something at least as fast.
    """
    from ..utils.timing import measure_kernel_pair

    cache = _load(cache_path)
    interpret = jax.default_backend() != "tpu"
    chip = detect_chip().name
    drop = []
    for key, entry in sorted(cache.items()):
        parts = key.split("/")
        if len(parts) != 5 or parts[0] != chip or parts[1] != "fwd":
            continue
        import re

        m = re.match(r"b(\d+)h(\d+)q(\d+)kv(\d+)d(\d+)", parts[2])
        if not m:
            continue
        b, h, n_q, n_kv, d = map(int, m.groups())
        causal = parts[3].startswith("causal1")
        dtype = jnp.bfloat16 if "bfloat16" in key else jnp.float32
        fn_base, base_tag, base_entry = _fallback_fwd_fn(
            b, h, n_q, n_kv, d, causal, interpret
        )
        if entry.get("impl") == "tri":
            from ..kernels.flash_tri import flash_attention_tri, tri_heuristic

            blocks = (
                entry["blocks"]["block_q"],
                entry["blocks"]["block_k"],
                entry["blocks"].get("pvt", False),
            )
            if causal and tri_heuristic(b, h, n_q, n_kv, d, n_kv - n_q) == blocks:
                continue  # entry == the shipped fallback; nothing to race
            fn_tuned = functools.partial(
                flash_attention_tri,
                block_q=blocks[0],
                block_k=blocks[1],
                pv_transposed=blocks[2],
                interpret=interpret,
            )
        else:
            tuned = BlockSizes(**entry["blocks"])
            if tuned == BlockSizes.for_seq_len(n_q, n_kv) and not causal:
                continue
            fn_tuned = functools.partial(
                flash_attention_fwd, causal=causal, block_sizes=tuned,
                interpret=interpret,
            )
        q, k, v = make_qkv(jax.random.PRNGKey(0), (b, h, n_q, d), dtype=dtype)
        mcfg = _measure_cfg(b, h, n_q, n_kv, d)
        r = measure_kernel_pair(
            fn_base,
            (q, k, v),
            fn_tuned,
            (q, k, v),
            iters=mcfg["iters"],
            inner_hi=mcfg["inner_hi"],
            repeats=5,
        )
        verdict = "keep" if r["ratio"] > 1.0 else "REPLACE-with-fallback"
        log(
            f"  {key}: fallback [{base_tag}] {r['a_s']*1e6:.1f} us vs tuned "
            f"{r['b_s']*1e6:.1f} us (ratio {r['ratio']:.2f}) -> {verdict}"
        )
        if r["ratio"] <= 1.0:
            # The fallback won the paired race: persist IT as the
            # measured decision (identical runtime behavior to a cache
            # miss, but the shape stays marked as raced for the
            # coverage audit).
            drop.append(key)
            cache[key] = dict(base_entry, us=r["a_s"] * 1e6)
    _store(cache_path, cache)
    log(f"validate: replaced {len(drop)} noise-crowned entries with their fallbacks")


def audit(cache_path: str = DEFAULT_CACHE, log=print) -> List[str]:
    """Coverage guard: every shape the benchmark harness runs must have
    been raced by the tuner on this chip (round-4 post-mortem: the N=512
    causal sweep point shipped unraced and sat at 0.32 of roofline with
    nothing flagging it).  Returns the list of missing cache keys;
    ``--phase audit`` exits non-zero when any are missing.
    """
    from .benchmark import DEFAULT_SWEEP, amortizing_batch

    cache = _load(cache_path)
    missing = []
    for causal in (False, True):
        for n in DEFAULT_SWEEP:
            b = amortizing_batch(n)
            key = _key("fwd", b, 1, n, n, 64, causal, jnp.bfloat16)
            if key not in cache:
                missing.append(key)
    for kind_key in (
        _key("fwd", 16, 8, 2048, 2048, 64, True, jnp.bfloat16),
        _key("bwd", 16, 8, 2048, 2048, 64, True, jnp.bfloat16),
    ):
        if kind_key not in cache:
            missing.append(kind_key)
    for key in missing:
        log(f"  UNRACED: {key}")
    log(
        f"audit: {len(missing)} benchmark shapes missing from the tuner "
        f"cache" + ("" if missing else " — all covered")
    )
    return missing


def main() -> int:
    from ..utils.comp_cache import enable_compilation_cache

    enable_compilation_cache()

    ap = argparse.ArgumentParser()
    ap.add_argument("--cache", default=DEFAULT_CACHE)
    ap.add_argument("--force", action="store_true")
    ap.add_argument(
        "--phase",
        default="all",
        choices=("sweep", "sweep-causal", "train", "validate", "audit", "all"),
        help="which shape family to tune (split phases to bound runtime)",
    )
    args = ap.parse_args()
    # The reference-parity N-sweep shapes (B=H=1) in both mask modes plus
    # the high-occupancy training shape.  Each phase is resumable: tuned
    # keys are cached, so re-running skips completed shapes.
    from .benchmark import amortizing_batch

    if args.phase in ("sweep", "all"):
        for n in (128, 256, 512, 1024, 2048, 4096, 8192, 16384):
            # Tune the shape the benchmark actually runs (dispatch-
            # amortized batch), so its lookups hit.
            bs = autotune_fwd((amortizing_batch(n), 1, n, 64), causal=False,
                              cache_path=args.cache, force=args.force)
            print(f"fwd n={n} non-causal: {bs.block_q}x{bs.block_k_major}"
                  f"x{bs.block_k}")
    if args.phase in ("sweep-causal", "all"):
        for n in (128, 256, 512, 1024, 2048, 4096, 8192, 16384):
            bs = autotune_fwd((amortizing_batch(n), 1, n, 64), causal=True,
                              cache_path=args.cache, force=args.force)
            print(f"fwd n={n} causal: {bs.block_q}x{bs.block_k_major}"
                  f"x{bs.block_k}")
    if args.phase == "validate":
        validate(cache_path=args.cache)
        return 0
    if args.phase == "audit":
        return 1 if audit(cache_path=args.cache) else 0
    if args.phase in ("train", "all"):
        bs = autotune_fwd((16, 8, 2048, 64), cache_path=args.cache,
                          force=args.force)
        print(f"fwd (16,8,2048,64): block_q={bs.block_q} "
              f"block_k={bs.block_k_major}")
        bs = autotune_bwd((16, 8, 2048, 64), cache_path=args.cache,
                          force=args.force)
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
    if entry is None or entry.get("impl") == "tri":
        # Tri-kernel decisions carry (block_q, block_k) tile pairs, not
        # grid BlockSizes — the router reads them via lookup_fwd_impl.
        return None
    return BlockSizes(**entry["blocks"])


def lookup_fwd_impl(b, h, n_q, n_kv, d, causal, dtype,
                    cache_path: str = DEFAULT_CACHE):
    """("tri", {"block_q","block_k"}) if the tuner picked the triangular
    kernel for this shape; None otherwise (grid kernel / untuned)."""
    global _MEMO
    if _MEMO is None:
        _MEMO = _load(cache_path)
    entry = _MEMO.get(_key("fwd", b, h, n_q, n_kv, d, causal, dtype))
    if entry is None or entry.get("impl") != "tri":
        return None
    return "tri", dict(entry["blocks"])


def _gqa_route_key(h_q, h_kv, n, d, causal, dtype) -> str:
    """Cache key for the GQA-backward route (fold vs broadcast).

    Batch is deliberately absent: both paths' overheads (fold/unfold
    transposes vs jnp.repeat + group-reduce) scale linearly with batch,
    so the winner is batch-invariant to first order — one race covers
    every training batch size at the same head topology."""
    chip = detect_chip().name
    return (
        f"{chip}/gqabwd/hq{h_q}kv{h_kv}n{n}d{d}"
        f"/causal{int(causal)}/{jnp.dtype(dtype).name}"
    )


def lookup_gqa_bwd_route(h_q, h_kv, n, d, causal, dtype,
                         cache_path: str = DEFAULT_CACHE):
    """"fold" | "broadcast" if raced on this chip (experiments/
    gqa_bwd_pair.py persists the paired winner); None if unraced."""
    global _MEMO
    if _MEMO is None:
        _MEMO = _load(cache_path)
    entry = _MEMO.get(_gqa_route_key(h_q, h_kv, n, d, causal, dtype))
    return None if entry is None else entry.get("route")


def lookup_bwd(b, h, n_q, n_kv, d, causal, dtype,
               cache_path: str = DEFAULT_CACHE):
    """(impl, blocks) for the backward, or None if never tuned.

    ``impl`` is "split" (FA-2 two-kernel), "fused" (5-matmul single
    kernel) or "tri" (fused triangular static unroll); entries tuned
    before the fused variant existed default to "split".  ``blocks`` is
    a BlockSizes for split/fused, a plain {"block_q","block_k"} dict for
    tri.
    """
    global _MEMO
    if _MEMO is None:
        _MEMO = _load(cache_path)
    entry = _MEMO.get(_key("bwd", b, h, n_q, n_kv, d, causal, dtype))
    if entry is None:
        return None
    impl = entry.get("impl", "split")
    if impl == "tri":
        return "tri", dict(entry["blocks"])
    return impl, BlockSizes(**entry["blocks"])
