"""Roofline model for attention kernels on TPU.

The reference only reports *relative* speedup vs its naive kernel
(``main.mm:862-865``); BASELINE.json's metric additionally demands absolute
TFLOP/s and %-of-roofline, so this module carries the per-chip peak specs
and the attention FLOP/byte model.

Peak numbers are the published per-chip specs for each TPU generation
(bf16 dense MXU FLOP/s and HBM bandwidth).
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax


@dataclasses.dataclass(frozen=True)
class ChipSpec:
    name: str
    # Dense matmul peak, FLOP/s.
    peak_bf16_flops: float
    peak_fp32_flops: float
    # HBM bandwidth, bytes/s.
    hbm_bw: float
    vmem_bytes: int


# Published per-chip peaks.  fp32 peak on TPU is the bf16 MXU peak divided
# by the multi-pass decomposition factor (~1/8 effective for HIGHEST).
CHIP_SPECS = {
    "v4": ChipSpec("v4", 275e12, 275e12 / 8, 1228e9, 128 * 2**20),
    "v5e": ChipSpec("v5e", 197e12, 197e12 / 8, 819e9, 128 * 2**20),
    "v5p": ChipSpec("v5p", 459e12, 459e12 / 8, 2765e9, 128 * 2**20),
    "v6e": ChipSpec("v6e", 918e12, 918e12 / 8, 1640e9, 128 * 2**20),
}


def detect_chip() -> ChipSpec:
    """Best-effort chip detection from the local JAX device."""
    if jax.default_backend() != "tpu":
        # CPU fallback spec so the harness still runs (roofline % will be
        # meaningless but well-defined).
        return ChipSpec("cpu", 1e12, 5e11, 100e9, 32 * 2**20)
    kind = jax.devices()[0].device_kind.lower()
    if "v5 lite" in kind or "v5e" in kind or "v5lite" in kind:
        return CHIP_SPECS["v5e"]
    if "v5p" in kind or "v5" in kind:
        return CHIP_SPECS["v5p"]
    if "v6" in kind:
        return CHIP_SPECS["v6e"]
    if "v4" in kind:
        return CHIP_SPECS["v4"]
    return CHIP_SPECS["v5e"]


def attention_flops(
    batch: int,
    heads: int,
    n_q: int,
    n_kv: int,
    head_dim: int,
    *,
    causal: bool = False,
    backward: bool = False,
) -> float:
    """Model FLOP count for one attention call.

    Forward: 2 matmuls (QK^T and PV), 2*N_q*N_kv*D MACs each -> 4*N_q*N_kv*D
    FLOPs per (batch, head).  Causal halves the score area.  Backward does
    5 block matmuls (S recompute x2, dV, dP x2, dS-derived dQ/dK) ~= 2.5x
    the forward FLOPs.
    """
    f = 4.0 * batch * heads * n_q * n_kv * head_dim
    if causal:
        f *= 0.5
    if backward:
        f *= 2.5
    return f


def attention_bytes(
    batch: int,
    heads: int,
    n_q: int,
    n_kv: int,
    head_dim: int,
    itemsize: int,
) -> float:
    """Minimal HBM traffic: read Q, K, V once; write O once."""
    return float(
        batch * heads * (2 * n_q + 2 * n_kv) * head_dim * itemsize
    )


def mxu_width_factor(head_dim: int) -> float:
    """Attention MXU duty factor at a given head dim (REPORTING MODEL).

    The MXU is a 128x128 systolic array and attention's matmuls have one
    dimension pinned to ``head_dim`` (the QK^T contraction depth and the
    P.V output width), so the model divides the dense peak by 128/D for
    D < 128.  Round-5 per-shape measurements
    (``experiments/mxu_rates.py``, v5e) show this is a *convention*, not
    a physical ceiling: the penalty is per pinned-dimension KIND —
    D-narrow-OUTPUT matmuls ([M,K]x[K,64]) measured 39-49% of dense
    peak, while D-deep-CONTRACTION matmuls ([M,64]x[64,N]) measured
    76-79%, i.e. above the D/128 line — which is how the transposed-
    output kernels (``kernels/flash_tri.py`` ``pv_transposed``) can
    reach and slightly exceed 100% of this model's "speed of light".
    The D/128 convention is kept for roofline *reporting* so all rounds'
    numbers stay comparable (BASELINE.json metric); per-shape truth
    lives in ``experiments/mxu_rates.json``.
    """
    return min(head_dim, 128) / 128.0


def roofline_time(
    flops: float,
    bytes_moved: float,
    spec: Optional[ChipSpec] = None,
    dtype_bits: int = 16,
    head_dim: int = 128,
) -> float:
    """Speed-of-light seconds for a kernel under the roofline model.

    Pass ``head_dim`` to account for the MXU width cap (see
    ``mxu_width_factor``); the default 128 reproduces the plain dense
    roofline.
    """
    if spec is None:
        spec = detect_chip()
    peak = spec.peak_bf16_flops if dtype_bits <= 16 else spec.peak_fp32_flops
    peak = peak * mxu_width_factor(head_dim)
    return max(flops / peak, bytes_moved / spec.hbm_bw)


def roofline_fraction(
    measured_s: float,
    flops: float,
    bytes_moved: float,
    spec: Optional[ChipSpec] = None,
    dtype_bits: int = 16,
    head_dim: int = 128,
) -> float:
    """Fraction of speed-of-light achieved (1.0 == at the roofline)."""
    ideal = roofline_time(flops, bytes_moved, spec, dtype_bits, head_dim)
    return ideal / measured_s if measured_s > 0 else 0.0
