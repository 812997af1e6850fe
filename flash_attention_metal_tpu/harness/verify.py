"""Verification ladder (reference parity: H4, ``main.mm:231-594,1181-1194``).

Each rung is compared with max-abs-diff at the reference's tolerance, and
rungs chain exactly like the reference: fp32 kernels anchor to the golden
oracle, upper rungs difference against the verified naive rung, causal and
backward get dedicated fixtures.  Per-rung PASS/FAIL lines mirror the
reference binary's stdout contract.

Run: ``python -m flash_attention_metal_tpu.harness.verify``
"""

from __future__ import annotations

import dataclasses
from typing import Callable, List, Optional

import jax
import jax.numpy as jnp

from ..kernels import (
    flash_attention_bwd,
    flash_attention_fwd,
    flash_attention_mxu,
    flash_attention_v1,
    flash_attention_v2,
    naive_attention,
)
from ..reference import (
    attention_reference,
    attention_reference_bwd,
    make_qkv,
)

# The reference tolerance ladder (SURVEY.md §2 H4).
TOL_FP32 = 1e-3  # main.mm:239,253,292
TOL_V3 = 5e-3  # main.mm:375
TOL_HALF = 1e-2  # main.mm:452,591
TOL_BWD = 1e-1  # main.mm:1191
TOL_QUANT_INT8 = 3e-2  # int8 KV rung: 7 effective mantissa bits
TOL_QUANT_FP8 = 5e-2  # fp8(e4m3) KV rung: 3 mantissa bits -> ~2x int8 error


@dataclasses.dataclass
class RungResult:
    name: str
    max_diff: float
    tolerance: float
    has_nan: bool

    @property
    def passed(self) -> bool:
        return (self.max_diff < self.tolerance) and not self.has_nan

    def line(self) -> str:
        status = "PASS" if self.passed else "FAIL"
        nan = " [NaN!]" if self.has_nan else ""
        return (
            f"[{status}] {self.name}: max diff {self.max_diff:.3e} "
            f"(tol {self.tolerance:.0e}){nan}"
        )


def _diff(a: jax.Array, b: jax.Array) -> float:
    return float(
        jnp.max(jnp.abs(a.astype(jnp.float32) - b.astype(jnp.float32)))
    )


def run_ladder(
    n: int = 1024,
    head_dim: int = 64,
    batch: int = 1,
    heads: int = 2,
    *,
    interpret: Optional[bool] = None,
    log: Callable[[str], None] = print,
) -> List[RungResult]:
    """Execute the full verification ladder; returns per-rung results."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    key = jax.random.PRNGKey(42)  # seed parity with main.mm:25
    shape = (batch, heads, n, head_dim)
    q, k, v = make_qkv(key, shape)
    results: List[RungResult] = []

    def rung(name, got, want, tol):
        r = RungResult(name, _diff(got, want), tol, bool(jnp.any(jnp.isnan(got))))
        results.append(r)
        log(r.line())
        return got

    oracle = attention_reference(q, k, v)

    # Rung 1: naive vs oracle (main.mm:232-242).
    nv = naive_attention(q, k, v, interpret=interpret)
    rung("naive vs oracle (fp32)", nv, oracle, TOL_FP32)

    # Rung 2: V1 vs naive — differential, transitivity through rung 1
    # (main.mm:245-256).
    v1 = flash_attention_v1(q, k, v, interpret=interpret)
    rung("flash_v1 vs naive (fp32)", v1, nv, TOL_FP32)

    # Rung 3: V2 vs naive + NaN check (main.mm:277-295).
    v2 = flash_attention_v2(q, k, v, interpret=interpret)
    rung("flash_v2 vs naive (fp32)", v2, nv, TOL_FP32)

    # Rung 4: V3 parity — fp16 inputs, fp32 softmax stats, at the
    # reference's distinct half-precision tolerance 5e-3 (main.mm:375,
    # kernel at kernels.metal:173-455).  fp16's 10 mantissa bits clear
    # 5e-3; bf16's 7 bits need the looser 1e-2 rung below.
    q16, k16, v16 = (x.astype(jnp.float16) for x in (q, k, v))
    v3 = flash_attention_mxu(q16, k16, v16, interpret=interpret)
    rung("flash_mxu fp16 vs naive (V3 parity)", v3, nv, TOL_V3)

    # Rung 5: MXU bf16 vs naive (V4 analog, main.mm:443-455).
    qh, kh, vh = (x.astype(jnp.bfloat16) for x in (q, k, v))
    mx = flash_attention_mxu(qh, kh, vh, interpret=interpret)
    rung("flash_mxu bf16 vs naive", mx, nv, TOL_HALF)

    # Rung 5: causal — MXU(is_causal) vs causal oracle (main.mm:458-594).
    oracle_c = attention_reference(q, k, v, causal=True)
    mxc = flash_attention_mxu(qh, kh, vh, causal=True, interpret=interpret)
    rung("flash_mxu bf16 causal vs causal oracle", mxc, oracle_c, TOL_HALF)

    # Rung 6: backward vs oracle gradient (main.mm:1087-1195); the FA-2
    # decomposition is deterministic so fp32 is held to 1e-3, far tighter
    # than the reference's atomic-limited 1e-1.
    do = jax.random.normal(jax.random.PRNGKey(7), shape, jnp.float32) * 0.1
    o_f, lse_lanes = flash_attention_fwd(
        q, k, v, causal=True, save_lse=True, interpret=interpret
    )
    dq, dk, dv = flash_attention_bwd(
        q, k, v, o_f, do, lse_lanes, causal=True, interpret=interpret
    )
    dq_r, dk_r, dv_r = attention_reference_bwd(q, k, v, do, causal=True)
    rung("backward dQ vs oracle (fp32, causal)", dq, dq_r, TOL_FP32)
    rung("backward dK vs oracle (fp32, causal)", dk, dk_r, TOL_FP32)
    rung("backward dV vs oracle (fp32, causal)", dv, dv_r, TOL_FP32)

    # Rung 7: half-precision backward at the reference tolerance, with the
    # 0.01 downscale fixture (main.mm:951-954).
    doh = (do * 0.1).astype(jnp.bfloat16)
    oh, lse_h = flash_attention_fwd(
        qh, kh, vh, causal=True, save_lse=True, interpret=interpret
    )
    dqh, dkh, dvh = flash_attention_bwd(
        qh, kh, vh, oh, doh, lse_h, causal=True, interpret=interpret
    )
    dq_rh, dk_rh, dv_rh = attention_reference_bwd(qh, kh, vh, doh, causal=True)
    rung("backward dQ vs oracle (bf16, causal)", dqh, dq_rh, TOL_BWD)
    rung("backward dK vs oracle (bf16, causal)", dkh, dk_rh, TOL_BWD)
    rung("backward dV vs oracle (bf16, causal)", dvh, dv_rh, TOL_BWD)

    # Rung 7b (round 4): the fused triangular static-unroll backward
    # (kernels/flash_tri.py) against the same bf16 oracle gradient —
    # the same (dQ, dK, dV) from ONE visible-area kernel instead of the
    # two-kernel split.
    from ..kernels.flash_tri import flash_attention_bwd_tri

    dqt, dkt, dvt = flash_attention_bwd_tri(
        qh, kh, vh, oh, doh, lse_h, interpret=interpret
    )
    rung("tri fused backward dQ vs oracle (bf16)", dqt, dq_rh, TOL_BWD)
    rung("tri fused backward dK,dV vs oracle (bf16)",
         jnp.stack([dkt, dvt]), jnp.stack([dk_rh, dv_rh]), TOL_BWD)

    # Rung 7c (round 5): the transposed-output modes — wide-output PV /
    # gradient matmuls with one XLA transpose outside (the flagship
    # winners; kernels/flash_tri.py pv_transposed).  Explicit rungs so
    # Mosaic-lowering coverage does not depend on the routing heuristic.
    from ..kernels.flash_tri import flash_attention_tri

    opv, lse_pv = flash_attention_tri(
        qh, kh, vh, save_lse=True, pv_transposed=True, block_q=512,
        block_k=512, interpret=interpret,
    )
    rung("tri pvt forward vs causal oracle (bf16)", opv, oracle_c, TOL_HALF)
    dqp, dkp, dvp = flash_attention_bwd_tri(
        qh, kh, vh, oh, doh, lse_h, pv_transposed=True, block_q=512,
        block_k=512, interpret=interpret,
    )
    rung("tri pvt backward dQ vs oracle (bf16)", dqp, dq_rh, TOL_BWD)
    rung("tri pvt backward dK,dV vs oracle (bf16)",
         jnp.stack([dkp, dvp]), jnp.stack([dk_rh, dv_rh]), TOL_BWD)

    # Rung 8: quantized-KV forward (BASELINE.json config 4).  8-bit KV
    # error dominates: verified against the bf16 rung's own output at a
    # 3e-2 tolerance (the int8 analog of the reference's widening ladder,
    # main.mm:452).
    from ..kernels import flash_attention_quant, quantize_kv

    for qdtype, qname, qtol in (
        (jnp.int8, "int8", TOL_QUANT_INT8),
        (jnp.float8_e4m3fn, "fp8", TOL_QUANT_FP8),
    ):
        qkv_q = quantize_kv(kh, vh, dtype=qdtype)
        oq = flash_attention_quant(qh, qkv_q, causal=True, interpret=interpret)
        rung(f"flash_quant {qname}-KV causal vs causal oracle", oq, oracle_c, qtol)

    # Rung 9: native GQA (KV heads folded in the kernel index maps, no
    # materialized broadcast) vs broadcast oracle.
    from ..ops.attention import flash_attention

    kg, vg = kh[:, :1], vh[:, :1]  # MQA: 1 KV head under `heads` Q heads
    og = flash_attention(qh, kg, vg, causal=True, interpret=interpret)
    oracle_g = attention_reference(
        q,
        jnp.broadcast_to(kg, k.shape).astype(jnp.float32),
        jnp.broadcast_to(vg, v.shape).astype(jnp.float32),
        causal=True,
    )
    rung("flash MQA (native head-fold) vs oracle", og, oracle_g, TOL_HALF)

    # Rung 10: sliding-window attention vs windowed oracle.
    w = max(n // 4, 128)
    ow = flash_attention_fwd(
        qh, kh, vh, causal=True, window=w, interpret=interpret
    )
    oracle_w = attention_reference(q, k, v, causal=True, window=w)
    rung(f"flash sliding-window (W={w}) vs oracle", ow, oracle_w, TOL_HALF)

    # Rung 11: arbitrary block-sparse mask (skip-list grid) vs a masked
    # oracle — validates the mask compiler's Mosaic path end-to-end.
    from ..kernels import BlockMask, block_sparse_attention

    def _mask_fn(r, c):
        return (c <= r) & (((r - c) < n // 4) | ((c % (3 * n // 8)) < n // 8))

    bm = BlockMask(_mask_fn, n, n, 128, 128)
    osp = block_sparse_attention(qh, kh, vh, bm, interpret=interpret)
    sbs = jnp.einsum(
        "bhqd,bhkd->bhqk",
        q.astype(jnp.float32),
        k.astype(jnp.float32),
        precision=jax.lax.Precision.HIGHEST,
    ) * (head_dim**-0.5)
    rr, cc = jnp.arange(n)[:, None], jnp.arange(n)[None, :]
    sbs = jnp.where(_mask_fn(rr, cc), sbs, -jnp.inf)
    mm = jnp.max(sbs, -1, keepdims=True)
    mm = jnp.where(jnp.isneginf(mm), 0.0, mm)
    pp = jnp.exp(sbs - mm)
    ll = jnp.sum(pp, -1, keepdims=True)
    oracle_sp = jnp.einsum(
        "bhqk,bhkd->bhqd",
        pp / jnp.where(ll == 0, 1.0, ll),
        v.astype(jnp.float32),
        precision=jax.lax.Precision.HIGHEST,
    )
    rung(
        f"flash block-sparse mask (density {bm.density:.2f}) vs oracle",
        osp,
        oracle_sp,
        TOL_HALF,
    )

    # Rung 12: paged KV (vLLM-style page-table indirection) — physical
    # pages deliberately permuted so the scalar-prefetch index-map
    # translation is actually exercised; masking is in logical position
    # space so output must match the causal oracle regardless of
    # placement.  Covers full prefill (lengths=0) and a decode chunk
    # (lengths=n-128, last block of rows).
    from ..kernels import flash_attention_paged

    ps = 128
    pages_per = n // ps
    perm = (
        jax.random.permutation(jax.random.PRNGKey(11), batch * pages_per) + 1
    ).reshape(batch, pages_per)
    pool_shape = (1 + batch * pages_per, heads, ps, head_dim)
    pool_k = jnp.zeros(pool_shape, jnp.bfloat16)
    pool_v = jnp.zeros(pool_shape, jnp.bfloat16)
    kp = kh.reshape(batch, heads, pages_per, ps, head_dim)
    vp = vh.reshape(batch, heads, pages_per, ps, head_dim)
    for b in range(batch):
        for p in range(pages_per):
            pool_k = pool_k.at[perm[b, p]].set(kp[b, :, p])
            pool_v = pool_v.at[perm[b, p]].set(vp[b, :, p])
    table = jnp.asarray(perm, jnp.int32)
    op_full = flash_attention_paged(
        qh, pool_k, pool_v, table,
        jnp.zeros((batch,), jnp.int32), interpret=interpret,
    )
    rung("flash paged-KV prefill vs causal oracle", op_full, oracle_c, TOL_HALF)
    op_dec = flash_attention_paged(
        qh[:, :, n - ps:], pool_k, pool_v, table,
        jnp.full((batch,), n - ps, jnp.int32), interpret=interpret,
    )
    rung(
        "flash paged-KV decode chunk vs causal oracle",
        op_dec,
        oracle_c[:, :, n - ps:],
        TOL_HALF,
    )

    # Rung 13: tanh logit softcap (Gemma-2 style) vs capped oracle — the
    # in-kernel transform runs in log2 units, so this checks the rebase.
    cap = 20.0
    osc = flash_attention_fwd(
        qh, kh, vh, causal=True, softcap=cap, interpret=interpret
    )
    oracle_sc = attention_reference(q, k, v, causal=True, softcap=cap)
    rung(f"flash softcap ({cap:g}) causal vs oracle", osc, oracle_sc, TOL_HALF)

    # Rung 14: ALiBi linear position bias vs biased oracle (per-head
    # slopes; a capability the reference scoped out,
    # project_narrative.md:50-53).
    slopes = jnp.asarray(
        [2.0 ** -(8.0 * (i + 1) / heads) for i in range(heads)], jnp.float32
    )
    oal = flash_attention_fwd(
        qh, kh, vh, causal=True, alibi_slopes=slopes, interpret=interpret
    )
    oracle_al = attention_reference(q, k, v, causal=True, alibi_slopes=slopes)
    rung("flash ALiBi causal vs oracle", oal, oracle_al, TOL_HALF)

    # Rung 15: softcap+ALiBi composed through the serving cache kernels —
    # the int8-KV kernel (transform between dequant-scale and masking) and
    # the paged kernel (transform through the page-table indirection,
    # distances in logical position space).  Oracle is the dense fp32
    # reference with the same transforms.
    oracle_tc = attention_reference(
        q, k, v, causal=True, softcap=cap, alibi_slopes=slopes
    )
    qkv_i8 = quantize_kv(kh, vh, dtype=jnp.int8)
    otq = flash_attention_quant(
        qh, qkv_i8, causal=True, softcap=cap, alibi_slopes=slopes,
        interpret=interpret,
    )
    rung(
        "flash_quant int8-KV softcap+ALiBi vs oracle",
        otq, oracle_tc, TOL_QUANT_INT8,
    )
    otp = flash_attention_paged(
        qh, pool_k, pool_v, table, jnp.zeros((batch,), jnp.int32),
        softcap=cap, alibi_slopes=slopes, interpret=interpret,
    )
    rung("flash paged-KV softcap+ALiBi vs oracle", otp, oracle_tc, TOL_HALF)

    # Rung 16: in-kernel softcap backward — the dS path chains through
    # the tanh-cap derivative inside the FA-2 kernels (the dS-transform
    # site of the reference backward, kernels.metal:1160-1169); no O(N^2)
    # score tensor is materialized (round-3's oracle-VJP fallback is gone).
    def loss_sc(q_, k_, v_):
        return jnp.sum(
            flash_attention(
                q_, k_, v_, causal=True, softcap=cap, interpret=interpret
            )
            * do
        )

    g_sc = jax.grad(loss_sc, argnums=(0, 1, 2))(q, k, v)
    g_sc_r = jax.grad(
        lambda q_, k_, v_: jnp.sum(
            attention_reference(q_, k_, v_, causal=True, softcap=cap) * do
        ),
        argnums=(0, 1, 2),
    )(q, k, v)
    rung(
        "softcap backward (dQ,dK,dV) vs oracle",
        jnp.stack(g_sc),
        jnp.stack(g_sc_r),
        TOL_FP32,
    )

    # Rung 17: in-kernel ALiBi backward including d/d(slopes) (a masked
    # in-kernel reduce of dS * distance); slope grads compared relatively
    # (they are O(N^2) sums).
    def loss_al(q_, k_, v_, s_):
        return jnp.sum(
            flash_attention(
                q_, k_, v_, causal=True, alibi_slopes=s_, interpret=interpret
            )
            * do
        )

    g_al = jax.grad(loss_al, argnums=(0, 1, 2, 3))(q, k, v, slopes)
    g_al_r = jax.grad(
        lambda q_, k_, v_, s_: jnp.sum(
            attention_reference(q_, k_, v_, causal=True, alibi_slopes=s_)
            * do
        ),
        argnums=(0, 1, 2, 3),
    )(q, k, v, slopes)
    rung(
        "ALiBi backward (dQ,dK,dV) vs oracle",
        jnp.stack(g_al[:3]),
        jnp.stack(g_al_r[:3]),
        TOL_FP32,
    )
    rung(
        "ALiBi backward d_slopes vs oracle (relative)",
        g_al[3] / (jnp.abs(g_al_r[3]) + 1.0),
        g_al_r[3] / (jnp.abs(g_al_r[3]) + 1.0),
        TOL_FP32,
    )

    # Rung 18: native-GQA backward (row-fold; K/V read once per KV head,
    # no jnp.repeat broadcast) vs the broadcast oracle gradient.
    kg2, vg2 = k[:, :1], v[:, :1]

    def loss_gqa(q_, k_, v_):
        return jnp.sum(
            flash_attention(q_, k_, v_, causal=True, interpret=interpret)
            * do
        )

    g_gq = jax.grad(loss_gqa, argnums=(0, 1, 2))(q, kg2, vg2)
    g_gq_r = jax.grad(
        lambda q_, k_, v_: jnp.sum(
            attention_reference(
                q_,
                jnp.broadcast_to(k_, q_.shape),
                jnp.broadcast_to(v_, q_.shape),
                causal=True,
            )
            * do
        ),
        argnums=(0, 1, 2),
    )(q, kg2, vg2)
    rung("GQA-fold backward dQ vs oracle", g_gq[0], g_gq_r[0], TOL_FP32)
    rung(
        "GQA-fold backward dK,dV (group-summed in-kernel) vs oracle",
        jnp.stack(g_gq[1:]),
        jnp.stack(g_gq_r[1:]),
        TOL_FP32,
    )

    # Rungs 24-25: in-kernel attention dropout, forward AND backward.
    # The keep mask is a stateless coordinate hash shared bit-exactly by
    # the kernels and the oracle (kernels/_common.py::dropout_keep), so
    # dropout verifies at full fp32 tolerance — not just statistically.
    seed = jnp.int32(424242)
    odr = flash_attention_fwd(
        q, k, v, causal=True, dropout_rate=0.2, dropout_seed=seed,
        interpret=interpret,
    )
    oracle_dr = attention_reference(
        q, k, v, causal=True, dropout_rate=0.2, dropout_seed=seed
    )
    rung("flash dropout (p=0.2) causal vs oracle", odr, oracle_dr, TOL_FP32)
    od_f, lse_dr = flash_attention_fwd(
        q, k, v, causal=True, save_lse=True, dropout_rate=0.2,
        dropout_seed=seed, interpret=interpret,
    )
    dq_d, dk_d, dv_d = flash_attention_bwd(
        q, k, v, od_f, do, lse_dr, causal=True, dropout_rate=0.2,
        dropout_seed=seed, interpret=interpret,
    )
    dq_dr, dk_dr, dv_dr = attention_reference_bwd(
        q, k, v, do, causal=True, dropout_rate=0.2, dropout_seed=seed
    )
    rung(
        "flash dropout backward (dQ,dK,dV) vs oracle",
        jnp.stack([dq_d, dk_d, dv_d]),
        jnp.stack([dq_dr, dk_dr, dv_dr]),
        TOL_FP32,
    )

    return results


def main() -> int:
    from ..utils.comp_cache import enable_compilation_cache

    enable_compilation_cache()

    print("== flash_attention_metal_tpu verification ladder ==")
    print(f"backend: {jax.default_backend()}")
    results = run_ladder()
    ok = all(r.passed for r in results)
    print(f"== {'ALL PASS' if ok else 'FAILURES PRESENT'} "
          f"({sum(r.passed for r in results)}/{len(results)}) ==")
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
