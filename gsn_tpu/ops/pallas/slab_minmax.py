"""Segment max+min slab kernel — the DGN max/min aggregators.

XLA lowers masked segment-max (and its scatter-style backward) to
gather/scatter fusions measured at ~2% of HBM peak — after the weighted
kernel landed they were the single largest bucket of the DGN step.
This kernel keeps the slab playbook (``slab_message.py``: recv-sorted
dense edges, per-chunk slabs, one-hot MXU resolves) but the reduction
is MAX, which the MXU cannot do — instead each chunk runs a SEGMENTED
SUFFIX TREE-SCAN on the VPU:

    h   = oh_s @ B_window                      # MXU gather  [Be, d]
    hc  = [h, -h]  (max and min in one pass)   # [Be, 2d]
    for s in (1, 2, 4, ..., Be/2):             # log2(Be) VPU steps
        hc[i] = max(hc[i], hc[i+s]) where recv[i] == recv[i+s]
    # segment-START rows now hold their segment's full max
    slab = (oh_r ⊙ starts)ᵀ @ hc               # MXU scatter [2Bn, 2d]

Empty slab rows carry the finite sentinel ``NEG`` (±inf would produce
0·inf = NaN inside the MXU dot); chunks combine by a tiny XLA
segment-max over C·S_R block rows, and empty nodes are filled with 0
(DGL max_nodes semantics, as ``masked_segment_max``).

Backward: ONE kernel launch (r5; the r4 design used two — a global
tie-count pass then the cotangent pass — re-doing the one-hot gather
each time).  The trick is to count ties in the FORWARD, where the
gather is already paid: each chunk also emits a slab of per-edge
tie counts against its OWN chunk maxima, and the XLA combine turns
them into ties against the GLOBAL maxima for free —

    cnt[v] = Σ_c cnt_c[v] · 1[max_c[v] == raw[v]]

(a chunk's ties only count where that chunk attained the global max;
block-row segment ops, same cost class as the max combine).  The
backward then gathers the node-level ``Gp = g / max(cnt, 1)`` and
scatters dh = tie_e · Gp[recv] in a single launch — even
tie-splitting, matching ``jax.ops.segment_max``'s cotangent.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .onehot_dot import onehot_dot, onehot_dot_t
from .slab_message import (S_R, S_S, _at, _ckey, _combine_slabs,
                           _out_struct, _pad_nodes)

NEG = -1.0e30    # finite -inf stand-in (MXU-safe)


def _shift_up(x, s, fill):
    """row i reads row i+s (suffix direction), bottom padded with fill."""
    return jnp.concatenate(
        [x[s:], jnp.full((s,) + x.shape[1:], fill, x.dtype)], axis=0)


def _scan_state(recv_ref, send_ref, b_refs, block_n, s_s):
    recv = recv_ref[...].reshape(-1, 1).astype(jnp.int32)
    send = send_ref[...].reshape(-1, 1).astype(jnp.int32)
    Be = recv.shape[0]
    cols_r = jax.lax.broadcasted_iota(jnp.int32, (Be, S_R * block_n), 1)
    cols_s = jax.lax.broadcasted_iota(jnp.int32, (Be, s_s * block_n), 1)
    oh_r = jnp.where(cols_r == recv, 1.0, 0.0).astype(jnp.float32)
    oh_s = jnp.where(cols_s == send, 1.0, 0.0).astype(jnp.float32)
    b_win = jnp.concatenate([r[...] for r in b_refs], 0)
    h = onehot_dot(oh_s, b_win)                        # [Be, d]
    if b_win.dtype == jnp.bfloat16:
        # bf16 rows sum one-at-a-time through the one-hot, so h is
        # EXACTLY a bf16 value set — scanning/comparing in bf16 is
        # lossless AND halves the VPU tree-scan + makes the scatter
        # dots single-pass (max/min never mix magnitudes)
        h = h.astype(jnp.bfloat16)
    hc = jnp.concatenate([h, -h], axis=1)              # [Be, 2d]
    valid = recv >= 0
    return recv, oh_r, oh_s, hc, valid, Be


def minmax_slab_body(recv, oh_r, hc, valid, Be):
    """[2Bn, 2d] per-chunk minmax slab from the per-edge [h, -h] rows:
    segmented suffix tree-scan + start-row one-hot scatter.  Shared by
    the standalone kernel and the fused DGN kernel
    (slab_weighted.slab_dgn_fused)."""
    # segmented suffix max: row i ends with the max over rows j >= i of
    # its (contiguous, recv-sorted) segment
    hc = jnp.where(valid, hc, NEG)
    s = 1
    while s < Be:
        nxt_h = _shift_up(hc, s, NEG)
        nxt_r = _shift_up(recv, s, -2)
        hc = jnp.where(nxt_r == recv, jnp.maximum(hc, nxt_h), hc)
        s *= 2
    # segment starts: first (sorted) row of each receiver in the chunk
    prev = jnp.concatenate(
        [jnp.full((1, 1), -2, recv.dtype), recv[:-1]], axis=0)
    starts = (recv != prev) & valid
    oh_sel = oh_r * starts.astype(jnp.float32)
    val = onehot_dot_t(oh_sel, jnp.where(starts, hc, 0.0))
    n_sel = onehot_dot_t(oh_sel, jnp.ones((Be, 1), jnp.float32))
    return jnp.where(n_sel > 0, val, NEG)


def minmax_fwd_slabs(recv, oh_r, hc, valid, Be):
    """(max slab, tie-count slab) for one chunk.  The tie counts are
    against the CHUNK's own maxima — the combine promotes them to
    global counts (a chunk's ties only count where it attained the
    global max).  Shares the gather/one-hots already built by the
    caller (forward kernel or the fused DGN kernel)."""
    slab = minmax_slab_body(recv, oh_r, hc, valid, Be)
    max_e = onehot_dot(oh_r, slab)                    # chunk max per edge
    tie = (jnp.equal(hc, max_e) & valid).astype(jnp.float32)
    cnt_slab = onehot_dot_t(oh_r, tie)
    return slab, cnt_slab


def _fwd_kernel(fb_ref, wf_ref, recv_ref, send_ref, *refs,
                block_n, s_s):
    b_refs = refs[:s_s]
    slab_ref, cnt_ref = refs[-2], refs[-1]
    recv, oh_r, oh_s, hc, valid, Be = _scan_state(
        recv_ref, send_ref, b_refs, block_n, s_s)
    slab, cnt_slab = minmax_fwd_slabs(recv, oh_r, hc, valid, Be)
    slab_ref[...] = slab.astype(slab_ref.dtype)[None]
    cnt_ref[...] = cnt_slab.astype(cnt_ref.dtype)[None]


def minmax_dh_body(hc, out_e, gp_e, valid):
    """Per-edge cotangent of the minmax output: even tie-split against
    the GLOBAL maxima; ``gp_e`` gathers the node-level g/max(cnt,1)
    (shared with the fused DGN kernel)."""
    tie = ((hc == out_e) & valid).astype(jnp.float32)
    dhc = tie * gp_e
    d = hc.shape[1] // 2
    return dhc[:, :d] - dhc[:, d:]     # hc = [h, -h]


def _bwd_kernel(fb_ref, wf_ref, recv_ref, send_ref, *refs,
                block_n, s_s):
    b_refs = refs[:s_s]
    out0, out1, gp0, gp1, db_slab_ref = refs[s_s:]
    recv, oh_r, oh_s, hc, valid, Be = _scan_state(
        recv_ref, send_ref, b_refs, block_n, s_s)
    out_span = jnp.concatenate([out0[...], out1[...]], 0)
    gp_span = jnp.concatenate([gp0[...], gp1[...]], 0)
    out_e = onehot_dot(oh_r, out_span)
    gp_e = onehot_dot(oh_r, gp_span)
    dh = minmax_dh_body(hc, out_e, gp_e, valid)
    db_slab_ref[...] = onehot_dot_t(oh_s, dh).astype(
        db_slab_ref.dtype)[None]


def _minmax_combine(slabs, fb, num_blocks, block_n, d2):
    """MAX-combine of per-chunk slabs over their block rows (the only
    non-sum combine in the kernel family; C*S_R rows — a tiny XLA
    segment-max over block rows, not a scatter over nodes)."""
    C = slabs.shape[0]
    rows = slabs.reshape(C * S_R, block_n, d2)
    ids = (fb[:, None]
           + jnp.arange(S_R, dtype=fb.dtype)[None, :]).reshape(-1)
    out = jax.ops.segment_max(rows, ids, num_segments=num_blocks)
    return out.reshape(num_blocks * block_n, d2)


def _minmax_combine_cnt(mm_slabs, cnt_slabs, fb, num_blocks, block_n,
                        d2, kc=None, interpret=False):
    """(global maxima, global tie counts) from per-chunk (max, count)
    slabs: cnt[v] = Σ_c cnt_c[v] · 1[max_c[v] == raw[v]] — block-row
    segment ops only, no node scatter.  ``kc`` routes through the
    accumulating Pallas combine (slab_combine.py) instead, skipping the
    retile copies the XLA segment ops pay."""
    if kc is not None and not interpret:
        from .slab_combine import slab_combine_minmax_cnt
        return slab_combine_minmax_cnt(mm_slabs, cnt_slabs, fb, S_R,
                                       num_blocks, block_n, d2, kc)
    C = mm_slabs.shape[0]
    rows = mm_slabs.reshape(C * S_R, block_n, d2)
    crows = cnt_slabs.reshape(C * S_R, block_n, d2)
    ids = (fb[:, None]
           + jnp.arange(S_R, dtype=fb.dtype)[None, :]).reshape(-1)
    raw = jax.ops.segment_max(rows, ids, num_segments=num_blocks)
    agree = jnp.equal(rows, raw[ids]).astype(jnp.float32)
    cnt = jax.ops.segment_sum(crows * agree, ids,
                              num_segments=num_blocks)
    return (raw.reshape(num_blocks * block_n, d2),
            cnt.reshape(num_blocks * block_n, d2))


def _edge_specs(block_e, block_n, d, s_s):
    return [
        pl.BlockSpec((1, 1, block_e), lambda t, fb, wf: (t, 0, 0)),
        pl.BlockSpec((1, 1, block_e), lambda t, fb, wf: (t, 0, 0)),
    ] + [
        pl.BlockSpec((block_n, d),
                     lambda t, fb, wf, k=k: (_at(wf, t) + k, 0))
        for k in range(s_s)
    ]


def _span_specs(block_n, d2):
    return [
        pl.BlockSpec((block_n, d2), lambda t, fb, wf: (_at(fb, t), 0)),
        pl.BlockSpec((block_n, d2),
                     lambda t, fb, wf: (_at(fb, t) + 1, 0)),
    ]


@functools.partial(jax.custom_vjp,
                   nondiff_argnums=(5, 6, 7, 8, 9, 10, 11))
def slab_segment_minmax(B, recv_local, send_local, fb_wf, num_real_nodes,
                        num_nodes: int, block_n: int, block_e: int,
                        interpret: bool = False, s_s: int = S_S,
                        data_dtype: str = "float32", kc=(None, None)):
    """[max, -min] of B[send(e)] over e→v — returns [num_nodes, 2d]
    (columns [:d] = segment max, [d:] = -(segment min); empty nodes 0,
    the DGL/masked_segment_max fill).  Metadata exactly as
    ``slab_edge_message_aggregate``; shared send/recv index space."""
    out, _ = _fwd(B, recv_local, send_local, fb_wf, num_nodes, block_n,
                  block_e, interpret, s_s, data_dtype, kc)
    return out


def _fwd(B, recv_local, send_local, fb_wf, num_nodes, block_n, block_e,
         interpret, s_s, data_dtype="float32", kc=(None, None)):
    C = fb_wf.shape[1]
    d = B.shape[1]
    num_blocks = num_nodes // block_n
    # bf16 data: the oh_s gather dot becomes single-pass; maxima, tie
    # comparisons and cotangents all stay f32-exact GIVEN the bf16 rows
    ddt = (jnp.bfloat16 if data_dtype == "bfloat16" else jnp.float32)
    B_p = _pad_nodes(B, num_nodes, ddt)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(C,),
        in_specs=_edge_specs(block_e, block_n, d, s_s),
        out_specs=[
            pl.BlockSpec((1, S_R * block_n, 2 * d),
                         lambda t, fb, wf: (t, 0, 0)),
            pl.BlockSpec((1, S_R * block_n, 2 * d),
                         lambda t, fb, wf: (t, 0, 0)),
        ],
    )
    sdt = jnp.bfloat16 if data_dtype == "bfloat16" else jnp.float32
    slabs, cnt_slabs = pl.pallas_call(
        functools.partial(_fwd_kernel, block_n=block_n, s_s=s_s),
        grid_spec=grid_spec,
        out_shape=[
            _out_struct((C, S_R * block_n, 2 * d), sdt,
                        B_p, recv_local, send_local, fb_wf),
            _out_struct((C, S_R * block_n, 2 * d), sdt,
                        B_p, recv_local, send_local, fb_wf),
        ],
        interpret=interpret,
    )(fb_wf[0], fb_wf[1],
      recv_local.reshape(C, 1, block_e),
      send_local.reshape(C, 1, block_e),
      *((B_p,) * s_s))
    raw, cnt = _minmax_combine_cnt(slabs, cnt_slabs, _ckey(fb_wf, 0),
                                   num_blocks, block_n, 2 * d,
                                   kc=kc[0], interpret=interpret)
    out = jnp.where(raw <= NEG / 2, 0.0, raw)
    return out, (B, recv_local, send_local, fb_wf, raw, cnt)


def _fwd_vjp(B, recv_local, send_local, fb_wf, num_real_nodes,
             num_nodes, block_n, block_e, interpret, s_s,
             data_dtype="float32", kc=(None, None)):
    out, res = _fwd(B, recv_local, send_local, fb_wf, num_nodes,
                    block_n, block_e, interpret, s_s, data_dtype, kc)
    return out, res


def _bwd_vjp(num_nodes, block_n, block_e, interpret, s_s, data_dtype,
             kc, res, g):
    B, recv_local, send_local, fb_wf, raw, cnt = res
    C = fb_wf.shape[1]
    d = B.shape[1]
    num_blocks = num_nodes // block_n
    ddt = (jnp.bfloat16 if data_dtype == "bfloat16" else jnp.float32)
    B_p = _pad_nodes(B, num_nodes, ddt)
    g = jnp.pad(g.astype(jnp.float32),
                ((0, num_nodes - g.shape[0]), (0, 0)))
    # node-level even-tie-split cotangent; tie counts came out of the
    # FORWARD combine, so the backward is ONE launch
    gp = g / jnp.maximum(cnt, 1.0)

    bwd_grid = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(C,),
        in_specs=(_edge_specs(block_e, block_n, d, s_s)
                  + _span_specs(block_n, 2 * d) * 2),
        out_specs=[
            pl.BlockSpec((1, s_s * block_n, d),
                         lambda t, fb, wf: (t, 0, 0)),
        ],
    )
    db_slabs, = pl.pallas_call(
        functools.partial(_bwd_kernel, block_n=block_n, s_s=s_s),
        grid_spec=bwd_grid,
        out_shape=[
            _out_struct((C, s_s * block_n, d),
                        jnp.bfloat16 if data_dtype == "bfloat16"
                        else jnp.float32,
                        B_p, recv_local, send_local, fb_wf, g),
        ],
        interpret=interpret,
    )(fb_wf[0], fb_wf[1],
      recv_local.reshape(C, 1, block_e),
      send_local.reshape(C, 1, block_e),
      *((B_p,) * s_s), raw, raw, gp, gp)
    dB = _combine_slabs(db_slabs, _ckey(fb_wf, 1), s_s, num_blocks,
                        block_n, d, kc=kc[1],
                        interpret=interpret)[:B.shape[0]].astype(B.dtype)
    return (dB, None, None, None, None)


slab_segment_minmax.defvjp(_fwd_vjp, _bwd_vjp)
