"""Harness tests: ladder at small N, CSV/SVG artifacts."""

import math
import os

import pytest

from flash_attention_metal_tpu.harness import run_ladder
from flash_attention_metal_tpu.harness.plotting import (
    generate_svg,
    parse_csv,
    plot_benchmark_csv,
)
from flash_attention_metal_tpu.utils import (
    attention_flops,
    roofline_fraction,
    roofline_time,
)


def test_ladder_all_pass():
    results = run_ladder(n=128, heads=1)
    assert len(results) == 35
    for r in results:
        assert r.passed, r.line()


def test_roofline_model():
    # 1 TFLOP at bf16 on v5e-class peak (197e12) -> ~5.08 ms compute-bound.
    from flash_attention_metal_tpu.utils.roofline import CHIP_SPECS

    spec = CHIP_SPECS["v5e"]
    f = attention_flops(1, 8, 4096, 4096, 64)
    t = roofline_time(f, 1e6, spec)
    assert t == pytest.approx(f / 197e12)
    # Fraction at exactly the roofline time is 1.0.
    assert roofline_fraction(t, f, 1e6, spec) == pytest.approx(1.0)
    # Tiny kernel is bandwidth-bound.
    assert roofline_time(1.0, 1e9, spec) == pytest.approx(1e9 / 819e9)


def test_flops_model_causal_and_bwd():
    f = attention_flops(2, 4, 1024, 1024, 64)
    assert f == 4 * 2 * 4 * 1024 * 1024 * 64
    assert attention_flops(2, 4, 1024, 1024, 64, causal=True) == f / 2
    assert attention_flops(2, 4, 1024, 1024, 64, backward=True) == f * 2.5


def test_csv_svg_roundtrip(tmp_path):
    csv = tmp_path / "bench.csv"
    csv.write_text(
        "N,Naive(ms),FlashV1(ms),FlashV2(ms),FlashMXU(ms),FlashMXU-causal(ms),"
        "SpeedupV1,SpeedupV2,SpeedupMXU,TFLOPs_MXU,TFLOPs_MXU_causal,"
        "Roofline_MXU,Roofline_MXU_causal\n"
        "128,1.0,0.5,0.25,0.2,0.15,2.0,4.0,5.0,10.0,8.0,0.5,0.4\n"
        "256,4.0,1.0,0.5,0.4,0.3,4.0,8.0,10.0,20.0,16.0,0.6,0.5\n"
    )
    header, rows = parse_csv(str(csv))
    assert header[0] == "N" and len(rows) == 2
    out1 = tmp_path / "speedup.svg"
    out2 = tmp_path / "roofline.svg"
    plot_benchmark_csv(str(csv), str(out1), str(out2))
    svg = out1.read_text()
    assert svg.startswith("<svg") and "polyline" in svg and "FlashMXU" in svg
    assert out2.read_text().count("polyline") >= 2


def test_svg_handles_nan():
    svg = generate_svg(
        [128, 256], {"a": [1.0, math.nan]}, title="t", y_label="y"
    )
    assert "NaN" not in svg.split("polyline")[1].split("/>")[0]


def test_train_bench_flops_model():
    from flash_attention_metal_tpu.harness.train_bench import (
        model_flops_per_token,
    )
    from flash_attention_metal_tpu.models import ModelConfig

    cfg = ModelConfig(
        vocab_size=1024,
        d_model=256,
        n_layers=2,
        n_heads=4,
        n_kv_heads=2,
        head_dim=64,
        d_ff=512,
        max_seq_len=512,
    )
    f = model_flops_per_token(cfg, seq=512)
    # 6x matmul params dominates at tiny seq; sanity-bound the model.
    params = 2 * (256 * 64 * 8 + 4 * 64 * 256 + 3 * 256 * 512) + 1024 * 256
    assert f > 6 * params
    assert f < 12 * params + 7 * 2 * 4 * 64 * 512


def test_autotune_fwd_smoke(tmp_path, monkeypatch):
    """Autotuner picks a valid BlockSizes and caches the decision."""
    import flash_attention_metal_tpu.harness.autotune as at

    # One candidate is enough to exercise measure->pick->persist on the
    # slow interpreter backend.
    monkeypatch.setattr(at, "_FWD_TILES", (256,))
    cache = str(tmp_path / "cache.json")
    logs = []
    bs = at.autotune_fwd((1, 1, 256, 64), cache_path=cache, log=logs.append)
    assert bs.block_q == 256 and bs.block_k_major == 256
    assert logs  # measured something
    # Second call hits the cache (no new measurements).
    logs2 = []
    bs2 = at.autotune_fwd((1, 1, 256, 64), cache_path=cache, log=logs2.append)
    assert bs2 == bs and not logs2


def test_autotune_lookup(tmp_path, monkeypatch):
    import flash_attention_metal_tpu.harness.autotune as at

    monkeypatch.setattr(at, "_FWD_TILES", (256,))
    cache = str(tmp_path / "cache.json")
    bs = at.autotune_fwd((1, 1, 256, 64), cache_path=cache)
    monkeypatch.setattr(at, "_MEMO", None)
    got = at.lookup("fwd", 1, 1, 256, 256, 64, True, "bfloat16",
                    cache_path=cache)
    assert got == bs
    assert at.lookup("fwd", 9, 9, 999, 999, 64, True, "bfloat16") is None


def test_autotune_audit(tmp_path):
    """The coverage guard lists every unraced benchmark shape and goes
    quiet once the cache covers them (round-4 N=512 hole regression)."""
    import json

    import flash_attention_metal_tpu.harness.autotune as at
    from flash_attention_metal_tpu.harness.benchmark import (
        DEFAULT_SWEEP,
        amortizing_batch,
    )

    cache = str(tmp_path / "cache.json")
    missing = at.audit(cache_path=cache, log=lambda s: None)
    # 2 mask modes x sweep + train fwd + train bwd.
    assert len(missing) == 2 * len(DEFAULT_SWEEP) + 2
    # Populate every audited key; audit must come back clean.
    entries = {
        k: {"blocks": {"block_q": 256, "block_k_major": 256, "block_k": 256}}
        for k in missing
    }
    with open(cache, "w") as f:
        json.dump(entries, f)
    assert at.audit(cache_path=cache, log=lambda s: None) == []
    # Every sweep shape is keyed by its amortizing batch, so the audit
    # tracks the benchmark's actual dispatch policy.
    b512 = amortizing_batch(512)
    assert any(f"b{b512}h1q512" in k for k in missing)


def test_tri_heuristic_eligibility():
    from flash_attention_metal_tpu.kernels.flash_tri import tri_heuristic

    # Standard shapes route tri with the measured-winner transposed-PV
    # 512 tiles (experiments/tri_pvt.py).
    assert tri_heuristic(16, 8, 2048, 2048, 64) == (512, 512, True)
    assert tri_heuristic(1, 1, 4096, 4096, 64) == (512, 512, True)
    # Shapes too small for 512 q tiles fall back to untransposed 256s.
    assert tri_heuristic(32, 1, 256, 256, 64) == (256, 256, False)
    # Declines past the measured N=4096 Mosaic compile wall (the grid
    # kernel holds 0.71-0.82 of roofline there).
    assert tri_heuristic(1, 1, 8192, 8192, 64) is None
    assert tri_heuristic(1, 1, 16384, 16384, 64) is None
    # Untileable q lengths decline.
    assert tri_heuristic(1, 1, 100, 100, 64) is None
    # Cross-shape: block_k clamps to n_kv.
    assert tri_heuristic(2, 2, 256, 64, 64) == (256, 64, False)


def test_causal_default_routes_tri(monkeypatch):
    """A causal shape with NO autotune entry routes the triangular
    kernel by default (round 5: the tri win is the default, not a cache
    hit — ref kernels.metal:682's skip is unconditional)."""
    import jax
    import jax.numpy as jnp

    import flash_attention_metal_tpu.harness.autotune as at
    import flash_attention_metal_tpu.kernels.flash_tri as tri_mod
    from flash_attention_metal_tpu.kernels import flash_attention_fwd
    from flash_attention_metal_tpu.reference import make_qkv

    monkeypatch.setattr(at, "_MEMO", {})  # empty cache: miss everything
    calls = []
    real = tri_mod.flash_attention_tri

    def spy(*a, **kw):
        calls.append((kw.get("block_q"), kw.get("block_k")))
        return real(*a, **kw)

    monkeypatch.setattr(tri_mod, "flash_attention_tri", spy)
    q, k, v = make_qkv(jax.random.PRNGKey(0), (2, 2, 256, 64))
    out = flash_attention_fwd(q, k, v, causal=True, interpret=True)
    assert calls == [(256, 256)]
    from flash_attention_metal_tpu.reference import attention_reference

    ref = attention_reference(q, k, v, causal=True)
    assert float(jnp.max(jnp.abs(out - ref))) < 1e-3
    # Extras (window) fall back to the grid kernel — no tri call.
    calls.clear()
    flash_attention_fwd(q, k, v, causal=True, window=64, interpret=True)
    assert calls == []
    # A cached grid decision for the exact shape overrides the heuristic.
    calls.clear()
    key = at._key("fwd", 2, 2, 256, 256, 64, True, q.dtype)
    monkeypatch.setattr(
        at,
        "_MEMO",
        {key: {"blocks": {"block_q": 256, "block_k_major": 256,
                          "block_k": 256}}},
    )
    flash_attention_fwd(q, k, v, causal=True, interpret=True)
    assert calls == []
