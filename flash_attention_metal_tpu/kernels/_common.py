"""Shared kernel helpers."""

import jax
import jax.numpy as jnp


def mxu_precision(dtype):
    """MXU precision policy by operand dtype.

    fp32 operands need the multi-pass MXU decomposition to hold the
    reference's fp32 verification tolerance of 1e-3 (``main.mm:239``);
    half/quantized types are single-pass on the MXU regardless.
    """
    return (
        jax.lax.Precision.HIGHEST
        if dtype == jnp.float32
        else jax.lax.Precision.DEFAULT
    )
