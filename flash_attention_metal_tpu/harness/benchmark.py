"""Benchmark harness (reference parity: H5, ``main.mm:596-1207``).

Same contract as the reference — an N-sweep over the kernel ladder with a
CSV artifact and speedup-vs-naive columns (schema analog of
``main.mm:598-606``) plus a high-occupancy batched phase
(``main.mm:881-1204``) — with the methodology fixed, not replicated:
warmup + multi-iteration medians instead of single-shot timing, and
absolute TFLOP/s + %-of-roofline columns (the BASELINE.json metric the
reference never computed).

Run: ``python -m flash_attention_metal_tpu.harness.benchmark [--quick]``
"""

from __future__ import annotations

import argparse
import dataclasses
import json
from typing import List, Optional

import jax
import jax.numpy as jnp

from ..config import BlockSizes
from ..kernels import (
    flash_attention_bwd_auto,
    flash_attention_fwd,
    flash_attention_mxu,
    flash_attention_v1,
    flash_attention_v2,
    naive_attention,
)
from ..reference import make_qkv
from ..utils import (
    attention_bytes,
    attention_flops,
    detect_chip,
    roofline_fraction,
)
from ..utils.timing import measure_kernel_stable

# Reference sweep (main.mm:608); naive skipped above 8192 (main.mm:673).
DEFAULT_SWEEP = (128, 256, 512, 1024, 2048, 4096, 8192, 16384)
NAIVE_MAX_N = 8192

CSV_HEADER = (
    "N,B,Naive(ms),FlashV1(ms),FlashV2(ms),FlashMXU(ms),FlashMXU-causal(ms),"
    "SpeedupV1,SpeedupV2,SpeedupMXU,TFLOPs_MXU,TFLOPs_MXU_causal,"
    "Roofline_MXU,Roofline_MXU_causal"
)


def amortizing_batch(n: int) -> int:
    """Batch that lifts a sweep point well above the per-launch floor
    (B*N^2 ~ 2^23, i.e. B=512 at N=128 down to B=1 from N=4096).

    The reference's B=H=1 sweep on its GPU ran its *naive* kernel for
    milliseconds even at N=128 (``resume_defense.md``: 8.58 ms at 512),
    so its ratios were never dispatch-bound; at TPU speeds a lone
    128x128 attention IS the dispatch floor for both kernels and a
    ratio of two floors measures nothing.  Batching both sides
    identically keeps the speedup like-for-like per shape while
    measuring kernels, not launch latency.

    Round 4 raised the target from 2^21 to 2^23: a batch-slope fit on
    the real chip put the per-launch device floor at ~2 us, which was
    20-25% of a 2^21-amortized mid-N reading (8-11 us) — enough to
    understate the roofline columns by a fifth and to let cross-process
    drift swamp point comparisons.  At 2^23 every point is 30+ us of
    real kernel work (floor <= 5%).
    """
    return max(1, (1 << 23) // (n * n))


@dataclasses.dataclass
class SweepRow:
    n: int
    b: int
    naive_ms: Optional[float]
    v1_ms: float
    v2_ms: float
    mxu_ms: float
    mxu_causal_ms: float
    speedup_v1: Optional[float]
    speedup_v2: Optional[float]
    speedup_mxu: Optional[float]
    tflops_mxu: float
    tflops_mxu_causal: float
    roofline_mxu: float
    roofline_mxu_causal: float

    def csv(self) -> str:
        f = lambda x: f"{x:.4f}" if x is not None else ""
        return ",".join(
            [
                str(self.n),
                str(self.b),
                f(self.naive_ms),
                f(self.v1_ms),
                f(self.v2_ms),
                f(self.mxu_ms),
                f(self.mxu_causal_ms),
                f(self.speedup_v1),
                f(self.speedup_v2),
                f(self.speedup_mxu),
                f"{self.tflops_mxu:.2f}",
                f"{self.tflops_mxu_causal:.2f}",
                f"{self.roofline_mxu:.3f}",
                f"{self.roofline_mxu_causal:.3f}",
            ]
        )


def _time_ms(fn, args, iters=20, inner_hi=5, repeats=1) -> float:
    """Marginal per-call kernel ms (median of ``repeats`` dual-slope reads).

    Floored at 0.2us: below that the dual-difference is inside timer
    noise and ratios would be meaningless.  Use repeats=3 for
    microsecond-scale kernels; a single reading is stable above ~50us.
    """
    t = measure_kernel_stable(
        fn, args, iters=iters, inner_hi=inner_hi, repeats=repeats
    )["median_s"]
    return t * 1e3


def run_sweep(
    sweep=DEFAULT_SWEEP,
    head_dim: int = 64,
    *,
    warmup: int = 2,
    iters: int = 20,
    interpret: Optional[bool] = None,
    log=print,
) -> List[SweepRow]:
    """Single-head N-sweep matching the reference setup (B=H=1, D=64)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if interpret:
        # Interpreter-mode smoke: minimal measurement effort.
        iters = min(iters, 2)
    spec = detect_chip()
    rows = []
    for n in sweep:
        key = jax.random.PRNGKey(42)
        b = 1 if interpret else amortizing_batch(n)
        q, k, v = make_qkv(key, (b, 1, n, head_dim))
        qh, kh, vh = (x.astype(jnp.bfloat16) for x in (q, k, v))
        # block_sizes=None -> the kernels consult the autotuner's persisted
        # per-chip decisions (harness.autotune.lookup) with the heuristic
        # for_seq_len defaults as fallback — the benchmark measures the
        # framework's actual shipped block policy.
        bs = None

        import functools as _ft

        from ..utils.timing import measure_kernel_pair

        inner_hi = 17 if n <= 2048 else 5
        repeats = 5 if n <= 4096 else 3
        if interpret:
            inner_hi, repeats = 2, 1
        naive_fn = _ft.partial(naive_attention, interpret=interpret)

        def paired(fn, args):
            # Drift-matched speedups: each repeat reads naive and the
            # variant back to back (same policy as bench.py).
            return measure_kernel_pair(
                naive_fn,
                (q, k, v),
                fn,
                args,
                iters=iters,
                inner_hi=inner_hi,
                repeats=repeats,
            )

        if n <= NAIVE_MAX_N:
            p1 = paired(
                _ft.partial(flash_attention_v1, interpret=interpret), (q, k, v)
            )
            p2 = paired(
                _ft.partial(
                    flash_attention_v2, block_sizes=bs, interpret=interpret
                ),
                (q, k, v),
            )
            pm = paired(
                _ft.partial(
                    flash_attention_mxu, block_sizes=bs, interpret=interpret
                ),
                (qh, kh, vh),
            )
            naive_ms = pm["a_s"] * 1e3
            v1_ms, sp1 = p1["b_s"] * 1e3, p1["ratio"]
            v2_ms, sp2 = p2["b_s"] * 1e3, p2["ratio"]
            mxu_ms, spm = pm["b_s"] * 1e3, pm["ratio"]
        else:
            naive_ms = sp1 = sp2 = spm = None
            v1_ms = _time_ms(
                _ft.partial(flash_attention_v1, interpret=interpret),
                (q, k, v), iters, inner_hi, repeats,
            )
            v2_ms = _time_ms(
                _ft.partial(
                    flash_attention_v2, block_sizes=bs, interpret=interpret
                ),
                (q, k, v), iters, inner_hi, repeats,
            )
            mxu_ms = _time_ms(
                _ft.partial(
                    flash_attention_mxu, block_sizes=bs, interpret=interpret
                ),
                (qh, kh, vh), iters, inner_hi, repeats,
            )
        mxuc_ms = _time_ms(
            _ft.partial(
                flash_attention_mxu,
                causal=True,
                block_sizes=bs,
                interpret=interpret,
            ),
            (qh, kh, vh),
            iters,
            inner_hi,
            repeats,
        )

        flops = attention_flops(b, 1, n, n, head_dim)
        flops_c = attention_flops(b, 1, n, n, head_dim, causal=True)
        bts = attention_bytes(b, 1, n, n, head_dim, 2)
        row = SweepRow(
            n=n,
            b=b,
            naive_ms=naive_ms,
            v1_ms=v1_ms,
            v2_ms=v2_ms,
            mxu_ms=mxu_ms,
            mxu_causal_ms=mxuc_ms,
            speedup_v1=sp1,
            speedup_v2=sp2,
            speedup_mxu=spm,
            tflops_mxu=flops / (mxu_ms * 1e-3) / 1e12,
            tflops_mxu_causal=flops_c / (mxuc_ms * 1e-3) / 1e12,
            roofline_mxu=roofline_fraction(
                mxu_ms * 1e-3, flops, bts, spec, head_dim=head_dim
            ),
            roofline_mxu_causal=roofline_fraction(
                mxuc_ms * 1e-3, flops_c, bts, spec, head_dim=head_dim
            ),
        )
        rows.append(row)
        log(row.csv())
    return rows


def run_high_occupancy(
    batch: int = 16,
    heads: int = 8,
    n: int = 2048,
    head_dim: int = 64,
    *,
    warmup: int = 2,
    iters: int = 20,
    interpret: Optional[bool] = None,
    log=print,
) -> dict:
    """Batched fwd+bwd phase (reference parity: main.mm:881-1204, B=16 H=8).

    Inputs are scaled by 0.01 like the reference's overflow guard
    (main.mm:951-954) — bf16 has fp32's range so it is belt-and-braces here.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if interpret:
        iters = min(iters, 2)
    spec = detect_chip()
    key = jax.random.PRNGKey(42)
    q, k, v = make_qkv(key, (batch, heads, n, head_dim), dtype=jnp.bfloat16)
    q, k, v = (x * 0.01 for x in (q, k, v))
    do = (
        jax.random.normal(jax.random.PRNGKey(9), q.shape, jnp.float32) * 0.01
    ).astype(jnp.bfloat16)

    import functools as _ft

    fwd_ms = _time_ms(
        _ft.partial(
            flash_attention_fwd, causal=True, save_lse=True, interpret=interpret
        ),
        (q, k, v),
        iters,
    )
    o, lse_lanes = flash_attention_fwd(
        q, k, v, causal=True, save_lse=True, interpret=interpret
    )
    bwd_ms = _time_ms(
        _ft.partial(flash_attention_bwd_auto, causal=True, interpret=interpret),
        (q, k, v, o, do, lse_lanes),
        iters,
    )

    # In-benchmark backward spot-verification (reference parity: the
    # high-occupancy phase re-verifies its backward against the CPU
    # oracle, main.mm:1087-1195, N<=128 there for CPU-time reasons; the
    # XLA oracle lets us verify a 2-batch slice at the FULL benchmark
    # sequence length).  Guards against the bench and the ladder drifting
    # onto different code paths.
    from ..reference import attention_reference_bwd

    sl = slice(0, min(2, batch))
    dq, dk, dv = flash_attention_bwd_auto(
        q[sl], k[sl], v[sl], o[sl], do[sl], lse_lanes[sl],
        causal=True, interpret=interpret,
    )
    dq_r, dk_r, dv_r = attention_reference_bwd(
        q[sl], k[sl], v[sl], do[sl], causal=True
    )
    bwd_diff = max(
        float(jnp.max(jnp.abs(a.astype(jnp.float32) - b.astype(jnp.float32))))
        for a, b in ((dq, dq_r), (dk, dk_r), (dv, dv_r))
    )
    bwd_tol = 1e-1  # the reference's backward rung tolerance, main.mm:1191
    log(
        f"[{'PASS' if bwd_diff < bwd_tol else 'FAIL'}] high-occupancy "
        f"backward vs oracle (B=2 slice): max diff {bwd_diff:.3e} "
        f"(tol {bwd_tol:.0e})"
    )

    flops_f = attention_flops(batch, heads, n, n, head_dim, causal=True)
    flops_b = attention_flops(
        batch, heads, n, n, head_dim, causal=True, backward=True
    )
    bts = attention_bytes(batch, heads, n, n, head_dim, 2)
    result = {
        "batch": batch,
        "heads": heads,
        "n": n,
        "fwd_ms": fwd_ms,
        "bwd_ms": bwd_ms,
        "bwd_verify_max_diff": bwd_diff,
        "bwd_verify_pass": bwd_diff < bwd_tol,
        "fwd_tflops": flops_f / (fwd_ms * 1e-3) / 1e12,
        "bwd_tflops": flops_b / (bwd_ms * 1e-3) / 1e12,
        "fwd_roofline": roofline_fraction(
            fwd_ms * 1e-3, flops_f, bts, spec, head_dim=head_dim
        ),
        "bwd_roofline": roofline_fraction(
            bwd_ms * 1e-3, flops_b, 2 * bts, spec, head_dim=head_dim
        ),
    }
    log(
        f"high-occupancy B={batch} H={heads} N={n}: "
        f"fwd {fwd_ms:.3f} ms ({result['fwd_tflops']:.1f} TFLOP/s, "
        f"{result['fwd_roofline']:.0%} roofline), "
        f"bwd {bwd_ms:.3f} ms ({result['bwd_tflops']:.1f} TFLOP/s)"
    )
    return result


def main() -> int:
    from ..utils.comp_cache import enable_compilation_cache

    enable_compilation_cache()

    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true", help="short sweep")
    ap.add_argument("--csv", default="benchmark_results.csv")
    ap.add_argument("--json", default=None)
    args = ap.parse_args()

    spec = detect_chip()
    print(f"== benchmark on {spec.name} ({jax.default_backend()}) ==")
    on_tpu = jax.default_backend() == "tpu"
    calib = None
    if on_tpu:
        from ..utils.timing import calibrate

        calib = calibrate()
        print(
            f"calibration: 8192^3 matmul {calib['matmul8192_ms']:.3f} ms "
            f"({calib['tflops']:.0f} TF/s, expect "
            f"{calib['expected_ms']:.3f} ms)"
            + ("" if calib["ok"] else "  ** DEGRADED TUNNEL — timings in "
               "this run are inflated; re-run when quiet **")
        )
    if not on_tpu:
        # Interpreter mode: numbers are meaningless and big sizes take
        # minutes per call -- run a pure functional smoke.
        print("(non-TPU backend: functional smoke only, timings not meaningful)")
        sweep = (128, 256)
    else:
        sweep = (128, 512, 2048) if args.quick else DEFAULT_SWEEP
    print(CSV_HEADER)

    # Incremental CSV: each completed row lands on disk immediately, so
    # a driver-timeout kill still leaves a complete-so-far artifact.
    with open(args.csv, "w") as f:
        f.write(CSV_HEADER + "\n")
    rows = []

    def _log_row(line: str) -> None:
        print(line)
        with open(args.csv, "a") as f:
            f.write(line + "\n")

    rows = run_sweep(sweep, log=_log_row)
    hi = run_high_occupancy(
        n=256 if not on_tpu else (1024 if args.quick else 2048),
        batch=2 if not on_tpu else 16,
        heads=2 if not on_tpu else 8,
    )

    # CSV emission through the native host extension when built (parity
    # with the reference's native host writer, main.mm:867-878); Python
    # fallback otherwise.
    try:
        from ..utils import _native_timer

        _native_timer.write_csv(
            args.csv,
            CSV_HEADER,
            [r.csv().split(",") for r in rows],
        )
    except ImportError:
        with open(args.csv, "w") as f:
            f.write(CSV_HEADER + "\n")
            for r in rows:
                f.write(r.csv() + "\n")
    print(f"wrote {args.csv}")
    if args.json:
        payload = {
            "chip": spec.name,
            "calibration": calib,
            "sweep": [dataclasses.asdict(r) for r in rows],
            "high_occupancy": hi,
        }
        with open(args.json, "w") as f:
            json.dump(payload, f, indent=2)
        print(f"wrote {args.json}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
