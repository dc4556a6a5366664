"""Slab-style Pallas graph-pooling kernel.

Graph readout (reference ``global_add_pool_sparse``,
``utils_graph_learning.py:23-31``) is a segment-sum of node rows by the
sorted ``batch`` vector.  XLA lowers it to a serial scatter loop at ~20%
of HBM peak; here each node chunk instead builds its graph one-hot in
VMEM and reduces with one MXU matmul (the same trick as
``slab_message.py``), writing a private 2-graph-block slab that a one-hot
matmul combines.

Validity: a chunk of ``block_e`` consecutive (sorted) nodes must map to
graphs spanning <= 2 blocks of ``block_g`` graphs — true whenever
``block_e <= block_g * min_graph_size`` roughly; the metadata builder
returns None on violation and callers fall back to the XLA segment-sum.

Backward: d x = oh_r @ g_window, computed in-kernel (a gather-free MXU
matmul per chunk).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .onehot_dot import onehot_dot, onehot_dot3, onehot_dot_t

S_R = 2    # graph-block span per chunk


def build_pool_metadata(batch: np.ndarray, node_mask: np.ndarray,
                        num_graph_slots: int, block_g: int = 128,
                        block_e: int = 512) -> Optional[dict]:
    """Chunk metadata for pooling: ``fb`` [C] first graph block per node
    chunk, ``recv_local`` [Np] graph id local to fb (or -1 for padding
    nodes), with nodes padded to a chunk multiple."""
    n = len(batch)
    num_blocks = -(-num_graph_slots // block_g)
    if num_blocks < S_R:
        return None
    n_pad = -(-n // block_e) * block_e
    C = n_pad // block_e
    fb = np.zeros(C, np.int32)
    recv_local = np.full(n_pad, -1, np.int32)
    prev = 0
    for t in range(C):
        lo, hi = t * block_e, min((t + 1) * block_e, n)
        m = node_mask[lo:hi]
        if hi <= lo or not m.any():
            fb[t] = prev
            continue
        g = batch[lo:hi][m].astype(np.int64)
        f = int(g.min() // block_g)
        f = min(f, num_blocks - S_R)
        if (g.max() // block_g) - f >= S_R:
            return None
        rl = np.full(hi - lo, -1, np.int32)
        rl[m] = (g - f * block_g).astype(np.int32)
        recv_local[lo:hi] = rl
        fb[t] = f
        prev = f
    return {"fb": fb, "recv_local": recv_local, "block_g": block_g,
            "block_e": block_e, "num_blocks": num_blocks}


# All dots (in-kernel and the XLA-level combine) use onehot_dot's
# 3-chunk bf16x3 data split — exact to a few f32 ulps in 3 MXU passes.
# XLA's Precision.HIGH would NOT match: TPU bf16_3x splits operands into
# only two bf16 chunks (~16 data mantissa bits).


def _onehot(recv_ref, block_g):
    recv = recv_ref[...].reshape(-1, 1).astype(jnp.int32)
    cols = jax.lax.broadcasted_iota(jnp.int32,
                                    (recv.shape[0], S_R * block_g), 1)
    return jnp.where(cols == recv, 1.0, 0.0).astype(jnp.float32)


def _pool_fwd_kernel(fb_ref, recv_ref, x_ref, slab_ref, *, block_g):
    oh = _onehot(recv_ref, block_g)
    slab_ref[...] = onehot_dot_t(
        oh, x_ref[...]).astype(slab_ref.dtype)[None]


def _pool_bwd_kernel(fb_ref, recv_ref, g0, g1, dx_ref, *, block_g):
    oh = _onehot(recv_ref, block_g)
    g_span = jnp.concatenate([g0[...], g1[...]], 0)
    dx_ref[...] = onehot_dot(oh, g_span).astype(dx_ref.dtype)


def _combine(slabs, fb, num_blocks, block_g, d):
    C = slabs.shape[0]
    rows = slabs.reshape(C * S_R, block_g, d)   # rank-3: no retile copy
    ids = (fb[:, None]
           + jnp.arange(S_R, dtype=fb.dtype)[None, :]).reshape(-1)
    assign = (ids[None, :]
              == jnp.arange(num_blocks, dtype=ids.dtype)[:, None]
              ).astype(jnp.float32)
    out = onehot_dot3(assign, rows)
    return out.reshape(num_blocks * block_g, d)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def slab_add_pool(x, recv_local, fb, num_graphs: int, block_g: int,
                  block_e: int, interpret: bool = False):
    """pool[g] = Σ_{nodes v of graph g} x[v]  — [num_graphs, d].

    ``x`` [Np, d] node rows padded to a chunk multiple (padding rows have
    recv_local == -1 and contribute nothing)."""
    return _pool_fwd(x, recv_local, fb, num_graphs, block_g, block_e,
                     interpret)[0]


def _pool_fwd(x, recv_local, fb, num_graphs, block_g, block_e, interpret):
    C = fb.shape[0]
    d = x.shape[1]
    num_blocks = -(-num_graphs // block_g)
    if x.dtype != jnp.bfloat16:
        # bf16 input (compute_dtype mode) stays bf16: one MXU pass per
        # dot instead of the exact bf16x3 split; f32 accumulation
        x = x.astype(jnp.float32)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(C,),
        in_specs=[
            pl.BlockSpec((1, 1, block_e), lambda t, fb: (t, 0, 0)),
            pl.BlockSpec((block_e, d), lambda t, fb: (t, 0)),
        ],
        out_specs=pl.BlockSpec((1, S_R * block_g, d),
                               lambda t, fb: (t, 0, 0)),
    )
    slabs = pl.pallas_call(
        functools.partial(_pool_fwd_kernel, block_g=block_g),
        grid_spec=grid_spec,
        # bf16 input -> bf16 slabs (single-pass combine, half the
        # retiling bytes); f32 stays exact
        out_shape=jax.ShapeDtypeStruct((C, S_R * block_g, d), x.dtype),
        interpret=interpret,
    )(fb, recv_local.reshape(C, 1, block_e), x)
    out = _combine(slabs, fb, num_blocks, block_g, d)[:num_graphs]
    # 0-d carrier: residual pytrees may only hold JAX types, not dtypes
    return out, (recv_local, fb, x.shape[0], jnp.zeros((), x.dtype))


def _pool_fwd_vjp(x, recv_local, fb, num_graphs, block_g, block_e,
                  interpret):
    out, res = _pool_fwd(x, recv_local, fb, num_graphs, block_g, block_e,
                         interpret)
    return out, res


def _pool_bwd_vjp(num_graphs, block_g, block_e, interpret, res, g):
    recv_local, fb, n_rows, dt_carrier = res
    x_dtype = dt_carrier.dtype
    C = fb.shape[0]
    d = g.shape[1]
    num_blocks = -(-num_graphs // block_g)
    g_pad = jnp.pad(g.astype(x_dtype if x_dtype == jnp.bfloat16
                             else jnp.float32),
                    ((0, num_blocks * block_g - g.shape[0]), (0, 0)))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(C,),
        in_specs=[
            pl.BlockSpec((1, 1, block_e), lambda t, fb: (t, 0, 0)),
            pl.BlockSpec((block_g, d), lambda t, fb: (fb[t], 0)),
            pl.BlockSpec((block_g, d), lambda t, fb: (fb[t] + 1, 0)),
        ],
        out_specs=pl.BlockSpec((block_e, d), lambda t, fb: (t, 0)),
    )
    dx = pl.pallas_call(
        functools.partial(_pool_bwd_kernel, block_g=block_g),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_rows, d), x_dtype),
        interpret=interpret,
    )(fb, recv_local.reshape(C, 1, block_e), g_pad, g_pad)
    return (dx, None, None)


slab_add_pool.defvjp(_pool_fwd_vjp, _pool_bwd_vjp)


# ---------------------------------------------------------------------------
# Graph -> nodes broadcast: the TRANSPOSE of slab_add_pool as a first-class
# op.  ``vn[batch]`` under autodiff makes XLA lower the cotangent to a
# serial scatter-add segment-sum (measured 0.45 ms per layer on the
# molhiv GNN_OGB virtual-node path); expressing the broadcast with the
# pool kernels puts BOTH directions on one-hot MXU matmuls.


def _broadcast_impl(vn_pad, recv_local, fb, n_rows, block_g, block_e,
                    interpret, out_dtype):
    """[num_blocks*block_g, d] graph rows -> [n_rows, d] node rows."""
    C = fb.shape[0]
    d = vn_pad.shape[1]
    return pl.pallas_call(
        functools.partial(_pool_bwd_kernel, block_g=block_g),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(C,),
            in_specs=[
                pl.BlockSpec((1, 1, block_e), lambda t, fb: (t, 0, 0)),
                pl.BlockSpec((block_g, d), lambda t, fb: (fb[t], 0)),
                pl.BlockSpec((block_g, d), lambda t, fb: (fb[t] + 1, 0)),
            ],
            out_specs=pl.BlockSpec((block_e, d), lambda t, fb: (t, 0)),
        ),
        out_shape=jax.ShapeDtypeStruct((n_rows, d), out_dtype),
        interpret=interpret,
    )(fb, recv_local.reshape(C, 1, block_e), vn_pad, vn_pad)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def slab_graph_broadcast(vn, recv_local, fb, num_graphs: int,
                         block_g: int, block_e: int,
                         interpret: bool = False):
    """out[v] = vn[graph(v)] (0 on padding rows, recv_local == -1).

    ``vn`` [num_graphs, d]; returns [Np, d] where Np = len(recv_local)
    (node rows padded to a chunk multiple).  Transpose rides
    slab_add_pool's one-hot MXU path — no XLA scatter either way."""
    num_blocks = -(-num_graphs // block_g)
    if vn.dtype != jnp.bfloat16:
        vn = vn.astype(jnp.float32)
    vn_pad = jnp.pad(vn, ((0, num_blocks * block_g - vn.shape[0]),
                          (0, 0)))
    return _broadcast_impl(vn_pad, recv_local, fb,
                           recv_local.shape[0], block_g, block_e,
                           interpret, vn.dtype)


def _bcast_fwd(vn, recv_local, fb, num_graphs, block_g, block_e,
               interpret):
    out = slab_graph_broadcast(vn, recv_local, fb, num_graphs, block_g,
                               block_e, interpret)
    return out, (recv_local, fb, jnp.zeros((), vn.dtype))


def _bcast_bwd(num_graphs, block_g, block_e, interpret, res, g):
    recv_local, fb, dt_carrier = res
    if g.dtype != jnp.bfloat16:
        g = g.astype(jnp.float32)
    dvn = slab_add_pool(g, recv_local, fb, num_graphs, block_g, block_e,
                        interpret).astype(dt_carrier.dtype)
    return (dvn, None, None)


slab_graph_broadcast.defvjp(_bcast_fwd, _bcast_bwd)
