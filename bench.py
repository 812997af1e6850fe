"""Driver benchmark: ONE JSON line on stdout.

Metric: geometric-mean speedup of the production MXU flash kernel (bf16
in/out, fp32 stats) over the naive O(N^2) fp32 baseline across the
reference's sequence sweep — the same "speedup vs naive" contract the
Metal reference publishes (``main.mm:862-865``, BASELINE.md), measured
with warmed, fenced, slope-based per-iteration timing instead of the
reference's single-shot wall clock.

The headline is the **non-causal** sweep — strictly like-for-like with
the reference's published V2 numbers (its sweep is non-causal, B=H=1,
D=64; BASELINE.md rows 2-4) — so ``vs_baseline`` divides by the
reference V2 geomean of 3.56x on the same axis.  The causal sweep
(where flash's block-skip halves its work while naive still pays full
N^2) is reported alongside in the detail, not as the headline.

Extra detail (absolute TFLOP/s, %-of-roofline, high-occupancy fwd/bwd)
goes to stderr and bench_detail.json.
"""

import functools
import json
import math
import sys
import time

import jax
import jax.numpy as jnp

from flash_attention_metal_tpu.utils.comp_cache import enable_compilation_cache

enable_compilation_cache()

from flash_attention_metal_tpu.kernels import (
    flash_attention_bwd_auto,
    flash_attention_fwd,
    flash_attention_mxu,
    naive_attention,
)
from flash_attention_metal_tpu.reference import make_qkv
from flash_attention_metal_tpu.utils import (
    attention_flops,
    attention_bytes,
    detect_chip,
    roofline_fraction,
)
from flash_attention_metal_tpu.utils.timing import (
    measure_compiled,
    measure_kernel_pair,
)

# Reference V2 speedups over its N sweep (BASELINE.md): geomean = 3.56.
REFERENCE_GEOMEAN_SPEEDUP = 3.56

# The reference's published sweep (BASELINE.md, naive capped at 8192).
SWEEP = (128, 256, 512, 1024, 2048, 4096, 8192)


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def main():
    interpret = jax.default_backend() != "tpu"
    spec = detect_chip()
    log(f"bench on {spec.name} backend={jax.default_backend()}")
    t_start = time.perf_counter()

    def budget_repeats(full: int) -> int:
        # The driver runs this under a ~10-minute timeout and tunnel
        # latency varies run to run; degrade measurement repeats
        # gracefully instead of risking a timeout.
        elapsed = time.perf_counter() - t_start
        if elapsed > 420:
            return 1
        if elapsed > 300:
            return max(full // 3, 1)
        return full

    from flash_attention_metal_tpu.harness.benchmark import amortizing_batch

    detail = {"chip": spec.name, "sweep": [], "sweep_causal": []}
    if not interpret:
        # Tunnel-health reference (utils/timing.py:calibrate): a slow run
        # is self-identifying in the artifact instead of reading as a
        # code regression.
        from flash_attention_metal_tpu.utils.timing import calibrate

        detail["calibration"] = calibrate()
        log(
            f"calibration: 8192^3 matmul "
            f"{detail['calibration']['matmul8192_ms']:.3f} ms "
            f"(expect {detail['calibration']['expected_ms']:.3f}; "
            f"ok={detail['calibration']['ok']})"
        )
    speedups = {False: [], True: []}
    for n in SWEEP:
        # Dispatch-floor amortization: small N runs batched (B*N^2 ~ 2^21,
        # disclosed per point) so the ratio measures the kernels, not two
        # ~1.3us launch floors; both sides get the identical shape.
        b = amortizing_batch(n)
        q, k, v = make_qkv(jax.random.PRNGKey(42), (b, 1, n, 64))
        qh, kh, vh = (x.astype(jnp.bfloat16) for x in (q, k, v))
        iters = max(12, min(24, (1 << 21) // n))
        # Small kernels need more inner repeats for timing resolution: the
        # signal is (inner_hi - 1) * t_kernel per scan step, and must rise
        # above the per-step noise of the tunneled dispatch floor.
        inner_hi = 17 if n <= 2048 else 5
        repeats = 5 if n <= 2048 else 3

        for causal in (False, True):
            # Paired, interleaved measurement: each repeat reads naive and
            # flash back to back, so tunnel/clock drift cancels out of the
            # per-repeat ratio; the speedup is the median of those ratios.
            pair = measure_kernel_pair(
                functools.partial(
                    naive_attention, causal=causal, interpret=interpret
                ),
                (q, k, v),
                functools.partial(
                    flash_attention_mxu, causal=causal, interpret=interpret
                ),
                (qh, kh, vh),
                iters=iters,
                inner_hi=inner_hi,
                repeats=budget_repeats(repeats),
            )
            t_naive, t_flash, sp = pair["a_s"], pair["b_s"], pair["ratio"]
            speedups[causal].append(sp)
            flops = attention_flops(b, 1, n, n, 64, causal=causal)
            # Per-point confidence band: the drift-matched per-repeat
            # ratio samples (sorted).  Round-over-round geomean swings
            # (r1-r3: 4.47/3.96/4.64) can now be read against the
            # per-point spread instead of guessed at.
            rs = pair.get("ratio_samples", [sp])
            detail["sweep_causal" if causal else "sweep"].append(
                {
                    "n": n,
                    "batch": b,
                    "naive_ms": t_naive * 1e3,
                    "flash_ms": t_flash * 1e3,
                    "speedup": sp,
                    "speedup_min": rs[0],
                    "speedup_max": rs[-1],
                    "ratio_samples": rs,
                    "paired": pair.get("paired", False),
                    "flash_tflops_exec": flops / t_flash / 1e12,
                }
            )
            log(
                f"N={n} B={b}{' causal' if causal else ''}: "
                f"naive {t_naive*1e3:.3f} ms, flash {t_flash*1e3:.3f} ms,"
                f" speedup {sp:.2f}x"
            )

    def _geomean(xs):
        return math.exp(sum(math.log(s) for s in xs) / len(xs))

    geomean = _geomean(speedups[False])  # headline: like-for-like non-causal
    geomean_causal = _geomean(speedups[True])
    detail["geomean_speedup_causal"] = geomean_causal
    # Geomean confidence band from the per-point extremes: the spread a
    # future regression has to clear before it means anything.
    detail["geomean_band"] = [
        _geomean([p["speedup_min"] for p in detail["sweep"]]),
        _geomean([p["speedup_max"] for p in detail["sweep"]]),
    ]
    log(
        f"geomean: non-causal {geomean:.2f}x "
        f"(band {detail['geomean_band'][0]:.2f}-"
        f"{detail['geomean_band'][1]:.2f}), causal {geomean_causal:.2f}x"
    )

    # High-occupancy phase (reference main.mm:881-1204 analog): B=16 H=8.
    # Skipped if the sweep ate the time budget (the driver metric needs
    # only the geomean; this block is bench_detail.json enrichment).
    if time.perf_counter() - t_start > 450:
        log("skipping high-occupancy phase (time budget)")
        detail["geomean_speedup"] = geomean
        with open("bench_detail.json", "w") as f:
            json.dump(detail, f, indent=2)
        print(
            json.dumps(
                {
                    "metric": "non-causal flash-attn (bf16 MXU) geomean speedup vs naive, N=128-8192, D=64, dispatch-amortized batches",
                    "value": round(geomean, 3),
                    "unit": "x",
                    "vs_baseline": round(geomean / REFERENCE_GEOMEAN_SPEEDUP, 3),
                }
            )
        )
        return

    B, H, N, D = 16, 8, 2048, 64
    q, k, v = make_qkv(jax.random.PRNGKey(7), (B, H, N, D), dtype=jnp.bfloat16)
    do = q * 0.01
    t_fwd = measure_compiled(
        functools.partial(
            flash_attention_fwd, causal=True, save_lse=True, interpret=interpret
        ),
        (q, k, v),
        iters=20,
    )["median_s"]
    o, lse = flash_attention_fwd(
        q, k, v, causal=True, save_lse=True, interpret=interpret
    )
    t_bwd = measure_compiled(
        functools.partial(
            flash_attention_bwd_auto,
            causal=True,
            interpret=interpret,
        ),
        (q, k, v, o, do, lse),
        iters=20,
    )["median_s"]
    f_fwd = attention_flops(B, H, N, N, D, causal=True)
    f_bwd = attention_flops(B, H, N, N, D, causal=True, backward=True)
    bts = attention_bytes(B, H, N, N, D, 2)
    # Backward moves ~2.5x the forward's tensors: reads q,k,v,o,do + lse,
    # writes dq,dk,dv (all bf16 except the fp32 lse/delta rows).
    tensor = B * H * N * D * 2
    bts_bwd = 8 * tensor + 2 * B * H * N * 4
    detail["high_occupancy"] = {
        "fwd_ms": t_fwd * 1e3,
        "bwd_ms": t_bwd * 1e3,
        "fwd_tflops": f_fwd / t_fwd / 1e12,
        "bwd_tflops": f_bwd / t_bwd / 1e12,
        "fwd_roofline": roofline_fraction(t_fwd, f_fwd, bts, spec, head_dim=D),
        "bwd_roofline": roofline_fraction(
            t_bwd, f_bwd, bts_bwd, spec, head_dim=D
        ),
    }
    log(
        f"high-occupancy B{B} H{H} N{N}: fwd {t_fwd*1e3:.3f} ms "
        f"({f_fwd/t_fwd/1e12:.1f} TF/s, "
        f"{detail['high_occupancy']['fwd_roofline']:.0%} roofline), "
        f"bwd {t_bwd*1e3:.3f} ms ({f_bwd/t_bwd/1e12:.1f} TF/s)"
    )

    # In-benchmark backward spot-verification (main.mm:1087-1195 analog):
    # the reference re-verifies its big-batch backward against the CPU
    # oracle at N<=128 inside the benchmark binary, so the bench and the
    # ladder can't silently drift apart.  Same here: a 128-row slice of
    # the exact tensors the timed kernel ran on, vs the closed-form
    # oracle gradient, at the ladder's bf16 tolerance.
    from flash_attention_metal_tpu.reference import attention_reference_bwd

    ns = 128
    qs, ks, vs, dos = (x[:1, :2, :ns] for x in (q, k, v, do))
    os_, lses = flash_attention_fwd(
        qs, ks, vs, causal=True, save_lse=True, interpret=interpret
    )
    dq_s, dk_s, dv_s = flash_attention_bwd_auto(
        qs, ks, vs, os_, dos, lses, causal=True, interpret=interpret
    )
    dq_r, dk_r, dv_r = attention_reference_bwd(qs, ks, vs, dos, causal=True)
    bwd_diff = max(
        float(jnp.max(jnp.abs(a.astype(jnp.float32) - b)))
        for a, b in ((dq_s, dq_r), (dk_s, dk_r), (dv_s, dv_r))
    )
    detail["high_occupancy"]["bwd_spot_verify_max_diff"] = bwd_diff
    detail["high_occupancy"]["bwd_spot_verify_pass"] = bool(bwd_diff < 1e-2)
    log(
        f"bwd spot-verify (N={ns} slice vs oracle): max diff {bwd_diff:.2e} "
        f"({'PASS' if bwd_diff < 1e-2 else 'FAIL'} @ 1e-2)"
    )

    detail["geomean_speedup"] = geomean
    with open("bench_detail.json", "w") as f:
        json.dump(detail, f, indent=2)

    print(
        json.dumps(
            {
                "metric": "non-causal flash-attn (bf16 MXU) geomean speedup vs naive, N=128-8192, D=64, dispatch-amortized batches",
                "value": round(geomean, 3),
                "unit": "x",
                "vs_baseline": round(geomean / REFERENCE_GEOMEAN_SPEEDUP, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
