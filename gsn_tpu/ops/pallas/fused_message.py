"""Fused edge-message kernel: gather + first-dense activation + scatter
in one Pallas pass.

The GSN 'general' message hot loop (SURVEY §3.2) with one hidden layer is

    out[v] = W2 @ sum_{e: recv(e)=v} act(A[recv(e)] + B[send(e)] + Pe + b1)
             (+ deg(v) * b2)

because the second dense is linear and commutes with the aggregation.
A/B are the node-level first-dense projections (EdgeMessageMLP), Pe an
optional edge-level contribution, and W2/b2 stay *outside* the kernel as
a plain node-level dense (autodiff handles them).  XLA executes the
inner sum as two row gathers and a scatter-add — HBM-bound at ~5% of
peak (scripts/microbench_segment.py).  This kernel keeps everything in
VMEM via one-hot MXU matmuls per edge chunk:

    oh_r  [Be, Bn]  one-hot of receiver-in-block     (edges recv-sorted)
    oh_s  [Be, 3Bn] one-hot of sender-in-window      (graph locality:
                     every sender of a block's edges lies within one
                     block of it when graphs have <= Bn nodes)
    agg_blk += oh_rᵀ @ act(oh_r @ A_blk + oh_s @ B_win + Pe + b1)

The backward pass *recomputes* H chunk-locally (two more one-hot
matmuls — cheaper than writing the [E, d] residual to HBM), producing
dH; then dA returns through ``mxu_segment_sum_aligned``, dB through an
XLA scatter (send order is unsorted; a send-sorted dual layout is the
planned optimization), and db1/dPe are reductions of dH.

v1 scope: relu/identity activation, no BatchNorm inside the message MLP
(bn_mlp=False; other configs use the unfused path).
"""

from __future__ import annotations

import functools
import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .onehot_dot import onehot_dot, onehot_dot_t
from .segment_mxu import mxu_segment_sum_aligned


def build_window_sends(send_global: np.ndarray, perm: np.ndarray,
                       recv_local: np.ndarray, chunk_nb: np.ndarray,
                       block_n: int, num_blocks: int):
    """Per-layout-slot sender index within the chunk's 3-block window.

    Returns (send_local [C*Be], win_first [C]) or None if any sender
    falls outside its window (a graph larger than block_n)."""
    C = len(chunk_nb)
    block_e = len(recv_local) // C
    win_first = np.clip(chunk_nb - 1, 0, max(num_blocks - 3, 0))
    send_local = np.full(C * block_e, -1, dtype=np.int32)
    for c in range(C):
        lo, hi = c * block_e, (c + 1) * block_e
        valid = recv_local[lo:hi] >= 0
        if not valid.any():
            continue
        s = send_global[perm[lo:hi][valid]]
        local = s - win_first[c] * block_n
        if (local < 0).any() or (local >= 3 * block_n).any():
            return None
        sl = send_local[lo:hi]
        sl[valid] = local
        send_local[lo:hi] = sl
    return send_local, win_first.astype(np.int32)


def _onehots(recv_ref, send_ref, block_n):
    recv = recv_ref[...].reshape(-1, 1).astype(jnp.int32)   # [Be, 1]
    send = send_ref[...].reshape(-1, 1).astype(jnp.int32)
    Be = recv.shape[0]
    cols_n = jax.lax.broadcasted_iota(jnp.int32, (Be, block_n), 1)
    cols_w = jax.lax.broadcasted_iota(jnp.int32, (Be, 3 * block_n), 1)
    oh_r = jnp.where(cols_n == recv, 1.0, 0.0).astype(jnp.float32)
    oh_s = jnp.where(cols_w == send, 1.0, 0.0).astype(jnp.float32)
    return oh_r, oh_s


def _compute_h(oh_r, oh_s, a_ref, b0, b1, b2, pe_ref, bias_ref, has_pe):
    b_win = jnp.concatenate([b0[...], b1[...], b2[...]], 0)
    h = onehot_dot(oh_r, a_ref[...]) + onehot_dot(oh_s, b_win)
    if has_pe:
        h = h + pe_ref[...]
    return h + bias_ref[...]


def _fwd_kernel(nb_ref, first_ref, wf_ref, recv_ref, send_ref, pe_ref,
                a_ref, b0_ref, b1_ref, b2_ref, bias_ref,
                out_ref, *, block_n, act, has_pe):
    t = pl.program_id(0)
    is_first = first_ref[t] == 1
    oh_r, oh_s = _onehots(recv_ref, send_ref, block_n)
    h = _compute_h(oh_r, oh_s, a_ref, b0_ref, b1_ref, b2_ref, pe_ref,
                   bias_ref, has_pe)
    if act == "relu":
        h = jnp.maximum(h, 0.0)
    contrib = onehot_dot_t(oh_r, h)

    @pl.when(is_first)
    def _():
        out_ref[...] = contrib

    @pl.when(jnp.logical_not(is_first))
    def _():
        out_ref[...] = out_ref[...] + contrib


def _bwd_kernel(nb_ref, first_ref, wf_ref, recv_ref, send_ref, pe_ref,
                a_ref, b0_ref, b1_ref, b2_ref, bias_ref, g_ref,
                dh_ref, *, block_n, act, has_pe):
    oh_r, oh_s = _onehots(recv_ref, send_ref, block_n)
    # per-edge cotangent: dAgg gathered at receivers
    g_e = onehot_dot(oh_r, g_ref[...])
    if act == "relu":
        h = _compute_h(oh_r, oh_s, a_ref, b0_ref, b1_ref, b2_ref, pe_ref,
                       bias_ref, has_pe)
        g_e = jnp.where(h > 0, g_e, 0.0)
    dh_ref[...] = g_e


def _prep(A, B, Pe, b1, recv_local, send_local, chunks, num_nodes,
          block_n, block_e):
    C = chunks.shape[1]
    d1 = A.shape[1]
    num_blocks = num_nodes // block_n
    if num_blocks < 3:
        raise ValueError("fused kernel needs >= 3 node blocks")
    rows = num_blocks * block_n
    A = jnp.pad(A.astype(jnp.float32), ((0, rows - A.shape[0]), (0, 0)))
    B = jnp.pad(B.astype(jnp.float32), ((0, rows - B.shape[0]), (0, 0)))
    has_pe = Pe is not None
    Pe_arr = (Pe.astype(jnp.float32) if has_pe
              else jnp.zeros((C * block_e, d1), jnp.float32))
    specs = [
        pl.BlockSpec((1, 1, block_e), lambda t, nb, cf, wf: (t, 0, 0)),
        pl.BlockSpec((1, 1, block_e), lambda t, nb, cf, wf: (t, 0, 0)),
        pl.BlockSpec((block_e, d1), lambda t, nb, cf, wf: (t, 0)),
        pl.BlockSpec((block_n, d1), lambda t, nb, cf, wf: (nb[t], 0)),
        pl.BlockSpec((block_n, d1), lambda t, nb, cf, wf: (wf[t], 0)),
        pl.BlockSpec((block_n, d1), lambda t, nb, cf, wf: (wf[t] + 1, 0)),
        pl.BlockSpec((block_n, d1), lambda t, nb, cf, wf: (wf[t] + 2, 0)),
        pl.BlockSpec((1, d1), lambda t, nb, cf, wf: (0, 0)),
    ]
    args = (recv_local.reshape(C, 1, block_e),
            send_local.reshape(C, 1, block_e),
            Pe_arr, A, B, B, B,
            b1.reshape(1, d1).astype(jnp.float32))
    return C, d1, rows, has_pe, specs, args


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8, 9, 10, 11, 12))
def fused_edge_message_aggregate(
        A, B, Pe, b1,
        recv_local, send_local, chunks_winfirst,
        num_nodes: int, block_n: int, block_e: int,
        act: str = "relu", has_pe: bool = True,
        interpret: bool = False):
    """agg[v] = Σ_{e→v} act(A[recv]+B[send]+Pe+b1)  — [padded_nodes, d1].

    chunks_winfirst: stacked [3, C] of (chunk_nb, chunk_first, win_first).
    The message MLP's second dense (linear) is applied by the caller on
    the aggregate (W2 commutes with the sum; its per-edge bias becomes
    in_degree ⊗ b2)."""
    return _run_fwd(A, B, Pe if has_pe else None, b1, recv_local,
                    send_local, chunks_winfirst, num_nodes, block_n,
                    block_e, act, interpret)


def _run_fwd(A, B, Pe, b1, recv_local, send_local, chunks_winfirst,
             num_nodes, block_n, block_e, act, interpret):
    chunks = chunks_winfirst[:2]
    win_first = chunks_winfirst[2]
    C, d1, rows, has_pe, specs, args = _prep(
        A, B, Pe, b1, recv_local, send_local, chunks, num_nodes,
        block_n, block_e)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(C,),
        in_specs=specs,
        out_specs=pl.BlockSpec((block_n, d1),
                               lambda t, nb, cf, wf: (nb[t], 0)),
    )
    return pl.pallas_call(
        functools.partial(_fwd_kernel, block_n=block_n, act=act,
                          has_pe=has_pe),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((rows, d1), jnp.float32),
        interpret=interpret,
    )(chunks[0], chunks[1], win_first, *args)


def _fwd(A, B, Pe, b1, recv_local, send_local, chunks_winfirst,
         num_nodes, block_n, block_e, act, has_pe, interpret):
    out = fused_edge_message_aggregate(
        A, B, Pe, b1, recv_local, send_local, chunks_winfirst,
        num_nodes, block_n, block_e, act, has_pe, interpret)
    res = (A, B, Pe, b1, recv_local, send_local, chunks_winfirst)
    return out, res


def _bwd(num_nodes, block_n, block_e, act, has_pe, interpret, res, g):
    A, B, Pe, b1, recv_local, send_local, chunks_winfirst = res
    chunks = chunks_winfirst[:2]
    win_first = chunks_winfirst[2]
    C, d1, rows, _has_pe, specs, args = _prep(
        A, B, Pe if has_pe else None, b1, recv_local, send_local, chunks,
        num_nodes, block_n, block_e)

    g = jnp.pad(g.astype(jnp.float32), ((0, rows - g.shape[0]), (0, 0)))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(C,),
        in_specs=specs + [
            pl.BlockSpec((block_n, d1), lambda t, nb, cf, wf: (nb[t], 0)),
        ],
        out_specs=pl.BlockSpec((block_e, d1),
                               lambda t, nb, cf, wf: (t, 0)),
    )
    dH = pl.pallas_call(
        functools.partial(_bwd_kernel, block_n=block_n, act=act,
                          has_pe=has_pe),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((C * block_e, d1), jnp.float32),
        interpret=interpret,
    )(chunks[0], chunks[1], win_first, *args, g)

    # dA: scatter dH by receiver (recv-sorted -> MXU kernel)
    dA = mxu_segment_sum_aligned(dH, recv_local, chunks, num_nodes,
                                 block_n, block_e, interpret)[:A.shape[0]]
    # dB: scatter dH by sender (unsorted) — XLA scatter for now
    per_slot_chunk = jnp.arange(C * block_e) // block_e
    send_global = jnp.where(
        send_local >= 0,
        send_local + win_first[per_slot_chunk] * block_n, 0)
    mask = send_local >= 0
    dB = jax.ops.segment_sum(
        jnp.where(mask[:, None], dH, 0.0), send_global,
        num_segments=num_nodes)[:B.shape[0]]

    db1 = jnp.sum(dH, axis=0)
    dPe = dH if has_pe else None
    return (dA, dB, dPe, db1, None, None, None)


fused_edge_message_aggregate.defvjp(_fwd, _bwd)
