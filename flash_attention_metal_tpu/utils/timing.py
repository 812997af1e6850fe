"""Benchmark timing discipline.

The reference times a single iteration of encode+commit+wait with no
warmup (``main.mm:676-698``) and its own docs show the resulting noise
(6.6x vs 9.29x peak across runs, SURVEY.md §6).  Here: explicit warmup
(compile excluded), multi-iteration medians, and a *device-get fence*.

Why device_get and not ``block_until_ready``: on remote-tunneled TPU
platforms (like this environment's axon plugin) ``block_until_ready`` can
return before the device work drains, which silently produces
faster-than-roofline nonsense (observed: an 8192^3 matmul "measured" at
28,000 TFLOP/s on a 197 TFLOP/s chip).  Fetching a scalar reduction of an
output forces the full dependency chain to execute and the result to cross
back to the host.  Each repetition block enqueues ``chunk`` back-to-back
executions (device work serializes on the single TPU stream) and the fence
cost amortizes across the chunk.
"""

from __future__ import annotations

import statistics
import time
from typing import Callable, Sequence

import jax
import jax.numpy as jnp

try:  # pragma: no cover - exercised when the native lib is built
    from . import _native_timer

    def _now_s() -> float:
        return _native_timer.monotonic_ns() * 1e-9

except ImportError:  # pragma: no cover
    _now_s = time.perf_counter


def fence(out) -> None:
    """Force all enqueued device work feeding ``out`` to complete."""
    leaves = [x for x in jax.tree_util.tree_leaves(out) if hasattr(x, "dtype")]
    if not leaves:
        return
    # A scalar reduction enqueues after everything else on the stream; the
    # host transfer cannot complete until the device has drained.
    x = leaves[-1]
    if jnp.issubdtype(x.dtype, jnp.floating) or jnp.issubdtype(
        x.dtype, jnp.integer
    ):
        jax.device_get(jnp.sum(x.astype(jnp.float32)))
    else:
        jax.device_get(x)


def measure(
    fn: Callable[[], Sequence[jax.Array]],
    *,
    warmup: int = 2,
    iters: int = 10,
    chunk: int = 10,
) -> dict:
    """Median/min/mean seconds per call of ``fn`` with device-get fencing.

    Each timed repetition enqueues ``chunk`` calls and fences once, so the
    reported per-call time amortizes host->device dispatch and the fence
    round-trip over the chunk.
    """
    for _ in range(max(warmup, 1)):
        out = fn()
    fence(out)

    times = []
    for _ in range(iters):
        t0 = _now_s()
        for _ in range(chunk):
            out = fn()
        fence(out)
        times.append((_now_s() - t0) / chunk)
    return {
        "median_s": statistics.median(times),
        "min_s": min(times),
        "mean_s": statistics.fmean(times),
        "std_s": statistics.pstdev(times) if len(times) > 1 else 0.0,
        "iters": iters,
        "chunk": chunk,
    }


def _make_scan_runner(fn, args, inner: int, warmup: int = 1):
    """Compile-once scan harness; returns ``timed_total(n) -> seconds``.

    Wraps ``fn`` in a jitted ``lax.scan``.  Each scan step perturbs the
    first input with a per-step scalar (zeros at runtime) so the body
    cannot be hoisted or CSE'd, and folds the output into a carried
    checksum so nothing is dead-code-eliminated.  The returned closure
    reuses the compiled executable across calls (jit caches per deltas
    shape), so repeated timings cost device time only.
    """
    leaves0, treedef = jax.tree_util.tree_flatten(args)

    @jax.jit
    def run(leaves, deltas):
        def body(carry, d):
            acc = carry
            for rep in range(inner):
                stepped = list(leaves)
                # Distinct per-repeat perturbation (zeros at runtime) so
                # repeats cannot be CSE'd into one execution.
                stepped[0] = stepped[0] + (d * (rep + 1)).astype(
                    stepped[0].dtype
                )
                out = fn(*jax.tree_util.tree_unflatten(treedef, stepped))
                first = jax.tree_util.tree_leaves(out)[0]
                acc = acc + jnp.sum(first.astype(jnp.float32))
            return acc, None

        total, _ = jax.lax.scan(body, jnp.float32(0.0), deltas)
        return total

    deltas_cache = {}
    warmed = set()

    def timed_total(n: int) -> float:
        if n not in deltas_cache:
            deltas_cache[n] = jnp.zeros((n,), jnp.float32)
        deltas = deltas_cache[n]
        if n not in warmed:
            for _ in range(max(warmup, 1)):
                fence(run(leaves0, deltas))
            warmed.add(n)
        ts = []
        for _ in range(3):
            t0 = _now_s()
            fence(run(leaves0, deltas))
            ts.append(_now_s() - t0)
        return min(ts)

    return timed_total


def calibrate(*, iters: int = 6) -> dict:
    """Tunnel-health reference: device time of an 8192^3 bf16 matmul.

    On a healthy v5e this measures ~0.75 ms (~182 TF/s of the 197 TF/s
    chip).  Tunnel degradation inflates every reading in a run by a
    common factor; benchmarks persist this number next to their results
    so a slow run is self-identifying instead of masquerading as a code
    regression (round-over-round driver-metric swings were +-9% before
    this).  ``ok`` is True within a +-15% band.
    """
    import jax
    import jax.numpy as jnp

    n = 8192
    x = jnp.ones((n, n), jnp.bfloat16)
    r = measure_compiled(lambda a: a @ a, (x,), iters=iters)
    tf = 2 * n**3 / r["median_s"] / 1e12
    expect = 2 * n**3 / 182e12
    return {
        "matmul8192_ms": r["median_s"] * 1e3,
        "tflops": tf,
        "expected_ms": expect * 1e3,
        "ok": abs(r["median_s"] / expect - 1.0) < 0.15,
    }


def measure_compiled(
    fn: Callable[..., object],
    args: tuple,
    *,
    iters: int = 40,
    warmup: int = 1,
    inner: int = 1,
) -> dict:
    """Marginal per-iteration device time of ``fn(*args)``.

    Remote-tunneled platforms add large fixed overheads per launch (host
    dispatch, fence round-trip) and a small per-loop-iteration cost, which
    swamp sub-millisecond kernels.  Measures a jitted scan at two
    iteration counts (``iters`` and ``3*iters``); the slope
    ``(T2 - T1) / (N2 - N1)`` cancels every iteration-count-independent
    overhead.
    """
    timed_total = _make_scan_runner(fn, args, inner, warmup)
    n1, n2 = iters, 3 * iters
    t1, t2 = timed_total(n1), timed_total(n2)
    per_iter = max((t2 - t1) / (n2 - n1), 1e-9)
    return {
        "median_s": per_iter,
        "min_s": per_iter,
        "mean_s": per_iter,
        "std_s": 0.0,
        "iters": iters,
        "chunk": 1,
    }


def measure_kernel_stable(
    fn: Callable[..., object],
    args: tuple,
    *,
    iters: int = 24,
    inner_hi: int = 5,
    repeats: int = 3,
    floor_s: float = 2e-7,
) -> dict:
    """Median of ``repeats`` independent ``measure_kernel`` readings.

    Individual dual-slope readings bounce +-2x at the microsecond scale on
    tunneled platforms; sub-``floor_s`` readings are pure noise (the slope
    collapsed below resolution) and are dropped.  Use this for anything
    under ~50us per call.
    """
    return measure_kernel(
        fn,
        args,
        iters=iters,
        inner_hi=inner_hi,
        repeats=repeats,
        floor_s=floor_s,
    )


def measure_kernel(
    fn: Callable[..., object],
    args: tuple,
    *,
    iters: int = 30,
    inner_hi: int = 5,
    repeats: int = 1,
    floor_s: float = 0.0,
) -> dict:
    """Per-call kernel time with BOTH fixed and per-iteration overheads
    cancelled.

    Measures the iteration slope at two inner-repeat counts (1 and
    ``inner_hi``); the difference divided by ``inner_hi - 1`` is the pure
    marginal cost of one kernel execution — immune to the scan-step floor
    that dominates sub-100us kernels on remote-tunneled platforms.

    ``repeats`` independent slope readings share the two compiled scan
    harnesses (compilation happens once), so extra repeats cost device
    time only; the median of above-``floor_s`` readings is reported.
    """
    tt1 = _make_scan_runner(fn, args, 1)
    tth = _make_scan_runner(fn, args, inner_hi)
    n1, n2 = iters, 3 * iters
    reads = []
    for _ in range(max(repeats, 1)):
        s1 = max((tt1(n2) - tt1(n1)) / (n2 - n1), 1e-9)
        s2 = max((tth(n2) - tth(n1)) / (n2 - n1), 1e-9)
        per = max((s2 - s1) / (inner_hi - 1), 1e-9)
        if per > floor_s:
            reads.append(per)
    if not reads:
        per = max(floor_s, 1e-9)
    else:
        reads.sort()
        per = reads[len(reads) // 2]
    return {
        "median_s": per,
        "min_s": reads[0] if reads else per,
        "mean_s": per,
        "std_s": 0.0,
        "iters": iters,
        "chunk": inner_hi,
        "samples_s": reads,  # sorted independent slope readings
    }


def measure_kernel_pair(
    fn_a: Callable[..., object],
    args_a: tuple,
    fn_b: Callable[..., object],
    args_b: tuple,
    *,
    iters: int = 24,
    inner_hi: int = 5,
    repeats: int = 3,
    floor_s: float = 2e-7,
) -> dict:
    """Paired slope measurement of two kernels with interleaved repeats.

    Speedup benchmarks divide two microsecond-scale readings; measuring
    all of A then all of B lets tunnel/clock drift between the twoblocks
    masquerade as a speed difference.  Interleaving the repeats (A, B,
    A, B, ...) makes each ratio sample drift-matched; the reported ratio
    is the median of per-repeat ratios, alongside median absolute times.
    """
    a1 = _make_scan_runner(fn_a, args_a, 1)
    ah = _make_scan_runner(fn_a, args_a, inner_hi)
    b1 = _make_scan_runner(fn_b, args_b, 1)
    bh = _make_scan_runner(fn_b, args_b, inner_hi)
    n1, n2 = iters, 3 * iters

    def one(tt1, tth):
        s1 = max((tt1(n2) - tt1(n1)) / (n2 - n1), 1e-9)
        s2 = max((tth(n2) - tth(n1)) / (n2 - n1), 1e-9)
        return max((s2 - s1) / (inner_hi - 1), 1e-9)

    ta, tb, ratios = [], [], []
    budget = 3 * max(repeats, 1)  # retry drift-collapsed reads, bounded
    attempts = 0
    while len(ratios) < max(repeats, 1) and attempts < budget:
        attempts += 1
        ra = one(a1, ah)
        rb = one(b1, bh)
        if ra > floor_s and rb > floor_s:
            ta.append(ra)
            tb.append(rb)
            ratios.append(ra / rb)
    if not ratios:
        # Every read collapsed below the floor (pathological drift): fall
        # back to the unpaired stable estimates rather than fabricating a
        # 1.0 ratio — a silent 1.0 poisons downstream geomeans.
        sa = measure_kernel(fn_a, args_a, iters=iters, inner_hi=inner_hi,
                            repeats=3, floor_s=floor_s)["median_s"]
        sb = measure_kernel(fn_b, args_b, iters=iters, inner_hi=inner_hi,
                            repeats=3, floor_s=floor_s)["median_s"]
        return {"a_s": sa, "b_s": sb, "ratio": sa / sb, "paired": False}
    ta.sort(), tb.sort(), ratios.sort()
    return {
        "a_s": ta[len(ta) // 2],
        "b_s": tb[len(tb) // 2],
        "ratio": ratios[len(ratios) // 2],
        "paired": True,
        # Full per-repeat spread so callers can persist a confidence
        # band per point (round-over-round geomean swings were otherwise
        # indistinguishable from tunnel weather — VERDICT r3 item 5).
        "ratio_samples": ratios,
        "a_samples": ta,
        "b_samples": tb,
    }
