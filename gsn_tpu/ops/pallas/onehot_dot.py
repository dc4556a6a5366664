"""Exact one-hot matmuls in 3 MXU passes (bf16x3 data split).

Every gather/scatter in the slab kernels is a matmul against a 0/1
selection matrix.  A 0/1 matrix is *exactly* representable in bf16, so
full precision is only needed on the data side.  Splitting the data into
three bf16 components with non-overlapping significands

    x = hi + mid + lo,   hi = bf16(x), mid = bf16(x - hi), ...

reconstructs the full 24-bit f32 mantissa (3 x 8 bits), so

    sel @ x = sel@hi + sel@mid + sel@lo

is accurate to a few f32 ulps while each term is a DEFAULT-precision
bf16 MXU pass.  Mosaic's only exact alternative, Precision.HIGHEST,
emulates a full f32xf32 contract (6+ passes) — twice the MXU work for
the same answer when one operand is a selection matrix.

Used inside Pallas kernels (slab_message, slab_pool, slab_weighted).
Helpers are plain jnp, so they also trace fine outside
Pallas, but at XLA level prefer ``lax.Precision.HIGH`` (same bf16x3
scheme without materializing the split).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _split3(x):
    hi = x.astype(jnp.bfloat16)
    r = x - hi.astype(jnp.float32)
    mid = r.astype(jnp.bfloat16)
    lo = (r - mid.astype(jnp.float32)).astype(jnp.bfloat16)
    return hi, mid, lo


def onehot_dot(sel, x):
    """``sel [m, k] (0/1) @ x [k, n] -> [m, n] f32``.

    f32 data: 3 MXU passes (exact).  bf16 data (the ``compute_dtype=
    'bfloat16'`` path — data already rounded, nothing left to split):
    ONE pass with f32 accumulation, 3x less MXU work."""
    s = sel.astype(jnp.bfloat16)
    if x.dtype == jnp.bfloat16:
        return jnp.dot(s, x, preferred_element_type=jnp.float32)
    hi, mid, lo = _split3(x)
    out = jnp.dot(s, hi, preferred_element_type=jnp.float32)
    out = out + jnp.dot(s, mid, preferred_element_type=jnp.float32)
    return out + jnp.dot(s, lo, preferred_element_type=jnp.float32)


_DN_T = (((0,), (0,)), ((), ()))
_DN_3 = (((1,), (0,)), ((), ()))


def onehot_dot3(sel, x3):
    """``sel [m, k] (0/1) @ x3 [k, r, n] -> [m, r, n] f32`` contracting
    the leading axis of a RANK-3 rhs.

    Shape-dependent lowering, both measured on chip: when n is
    lane-aligned (n % 128 == 0, e.g. d=128) the flatten to [k, r*n] is
    layout-free and the plain 2-D dot is much faster (rank-3
    dot_general cost the zinc step 1.8x); when n pads to lanes
    (e.g. d=300→384) the flatten is a physical retiling copy and the
    rank-3 contraction wins 1.4x."""
    k, r, n = x3.shape
    if n % 128 == 0:
        out = onehot_dot(sel, x3.reshape(k, r * n))
        return out.reshape(sel.shape[0], r, n)
    s = sel.astype(jnp.bfloat16)
    if x3.dtype == jnp.bfloat16:
        return jax.lax.dot_general(s, x3, dimension_numbers=_DN_3,
                                   preferred_element_type=jnp.float32)
    hi, mid, lo = _split3(x3)
    out = jax.lax.dot_general(s, hi, dimension_numbers=_DN_3,
                              preferred_element_type=jnp.float32)
    out = out + jax.lax.dot_general(s, mid, dimension_numbers=_DN_3,
                                    preferred_element_type=jnp.float32)
    return out + jax.lax.dot_general(s, lo, dimension_numbers=_DN_3,
                                     preferred_element_type=jnp.float32)


def onehot_dot_t(sel, y):
    """``sel [k, m] (0/1), y [k, n] -> sel^T @ y [m, n]`` (scatter-add
    over the shared leading axis); 3 MXU passes for f32 data, one for
    bf16 data (f32 accumulation either way)."""
    s = sel.astype(jnp.bfloat16)
    if y.dtype == jnp.bfloat16:
        return jax.lax.dot_general(s, y, dimension_numbers=_DN_T,
                                   preferred_element_type=jnp.float32)
    hi, mid, lo = _split3(y)
    out = jax.lax.dot_general(s, hi, dimension_numbers=_DN_T,
                              preferred_element_type=jnp.float32)
    out = out + jax.lax.dot_general(s, mid, dimension_numbers=_DN_T,
                                    preferred_element_type=jnp.float32)
    return out + jax.lax.dot_general(s, lo, dimension_numbers=_DN_T,
                                     preferred_element_type=jnp.float32)
