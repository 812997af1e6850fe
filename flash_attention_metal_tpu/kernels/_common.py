"""Shared kernel helpers."""

import jax
import jax.numpy as jnp


def mxu_precision(dtype):
    """Max-precision MXU policy (golden-anchor kernels: naive, flash_v1).

    fp32 operands use the full multi-pass MXU decomposition (HIGHEST,
    ~1e-8 error) so the baseline rungs anchor the ladder at maximum
    fidelity to the fp32 oracle (``main.mm:239``); half/quantized types
    are single-pass on the MXU regardless.
    """
    return (
        jax.lax.Precision.HIGHEST
        if dtype == jnp.float32
        else jax.lax.Precision.DEFAULT
    )


def mxu_precision_fast(dtype):
    """Tuned-kernel MXU policy (flash_v2 / flash_fwd / flash_bwd).

    fp32 operands use the 3-pass bf16 decomposition (HIGH): ~2x the MXU
    rate of the 6-pass HIGHEST with ~1e-6 absolute error on the ladder
    fixture — three orders of magnitude inside the reference's 1e-3 fp32
    tolerance (``main.mm:292``).  This is the fp32 analog of the
    reference V2's speed-within-tolerance trade (its fp16 rungs trade far
    more, 5e-3/1e-2 at ``main.mm:375,452``).  Half/quantized types are
    single-pass (DEFAULT) as before.
    """
    return (
        jax.lax.Precision.HIGH
        if dtype == jnp.float32
        else jax.lax.Precision.DEFAULT
    )
