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
    """Tuned-kernel MXU precision arg: DEFAULT everywhere.

    fp32 inputs are handled by ``mxu_dot_general``'s explicit bf16x3
    decomposition instead of a precision flag (Mosaic lowers only
    DEFAULT and HIGHEST; ``Precision.HIGH`` raises NotImplementedError
    inside Pallas kernels).
    """
    return jax.lax.Precision.DEFAULT


def mxu_dot_general(a, b, dimension_numbers, out_hint_dtype=None):
    """MXU matmul for the tuned kernels (flash_v2/flash_fwd/flash_bwd).

    bf16/fp16/int8 operands: one single-pass MXU contraction with fp32
    accumulation.  fp32 operands: an explicit **bf16x3** decomposition —
    split each operand into ``hi = bf16(x)`` and ``lo = bf16(x - hi)``
    and sum the three significant cross products (``lo.lo`` is ~2^-16
    relative and dropped):

        a.b ~= hi_a.hi_b + hi_a.lo_b + lo_a.hi_b

    Error ~1e-7 absolute on the ladder fixture — four orders inside the
    reference's 1e-3 fp32 tolerance (``main.mm:292``) — at ~half the
    cost of the 6-pass HIGHEST lowering (3 single-pass matmuls).  This
    is the fp32 analog of the reference V2's speed-within-tolerance
    trade (its fp16 rungs concede 5e-3/1e-2, ``main.mm:375,452``).
    Mosaic has no built-in middle precision (``Precision.HIGH`` is
    unsupported in kernels), so the decomposition is spelled out.
    """
    if a.dtype == jnp.float32 and b.dtype == jnp.float32:
        a_hi = a.astype(jnp.bfloat16)
        b_hi = b.astype(jnp.bfloat16)
        a_lo = (a - a_hi.astype(jnp.float32)).astype(jnp.bfloat16)
        b_lo = (b - b_hi.astype(jnp.float32)).astype(jnp.bfloat16)

        def d(x, y):
            return jax.lax.dot_general(
                x, y, dimension_numbers,
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.DEFAULT,
            )

        return d(a_hi, b_hi) + d(a_hi, b_lo) + d(a_lo, b_hi)
    return jax.lax.dot_general(
        a, b, dimension_numbers,
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.DEFAULT,
    )
