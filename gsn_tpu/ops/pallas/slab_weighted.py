"""Per-edge-WEIGHTED gather/scatter slab kernel — the DGN hot loop.

The directional aggregators (reference ``directional_gsn/nets/
aggregators.py:35-71``, ``dgn_layer.py:42-53``) are all weighted sums

    out_k[v] = Σ_{e → v} W[e, k] · h[src(e)]        (k = 1..K)

with per-edge weights W derived from the eigenvector field (dir-av,
dir-dx, softmax) or constants (sum, mean = 1/deg).  r3 ran them as XLA
segment ops (gather + K scatter-adds at ~5% HBM peak); here ONE kernel
pass computes all K weighted sums: per chunk the sender rows resolve via
the same one-hot MXU trick as ``slab_message.py``, and each weight
column scales the RECEIVER one-hot (w ⊙ oh_r)ᵀ @ h — K extra [Be,2Bn]x
[Be,d] MXU dots instead of K full gather+scatter passes.

Weight precision: the scaled one-hot (w ⊙ oh_r) enters the MXU in bf16;
``_wdot_t`` splits both w and h into two bf16 components (3 single-pass
dots) for ~16-bit relative accuracy — needed by the
cancellation-sensitive dir-dx aggregators; the backward recomputes the
weighting exactly on the VPU.

Metadata: reuse ``slab_message.build_slab_metadata`` on (dst, src).
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


def _w_cols(w_ref, K):
    """[Be, K?] weight block -> list of [Be, 1] columns."""
    w = w_ref[...]
    return [jax.lax.slice_in_dim(w, k, k + 1, axis=1) for k in range(K)]


def _split2(x):
    hi = x.astype(jnp.bfloat16).astype(jnp.float32)
    return hi, x - hi


def _wdot_t(oh_r, w, h):
    """(w ⊙ oh_r)ᵀ @ h to ~16-bit relative precision in 3 bf16 MXU
    passes: split w and h into (hi, lo) bf16 components and keep the
    three significant cross terms (wh·hh + wh·hl + wl·hh; the wl·hl
    term is O(2^-32)).  w ⊙ oh_r with bf16-valued w is EXACTLY
    representable in bf16, so onehot_dot_t's sel cast is lossless.
    A single bf16 pass (8-bit w) measured ~0.6% relative — too coarse
    for the cancellation-heavy dir-dx aggregators."""
    wh, wl = _split2(w)
    hh, hl = _split2(h)
    out = onehot_dot_t((oh_r * wh).astype(jnp.bfloat16),
                       hh.astype(jnp.bfloat16))
    out = out + onehot_dot_t((oh_r * wh).astype(jnp.bfloat16),
                             hl.astype(jnp.bfloat16))
    return out + onehot_dot_t((oh_r * wl).astype(jnp.bfloat16),
                              hh.astype(jnp.bfloat16))


def _sdt(data_dtype):
    """Slab (intermediate) dtype: bf16 under the compute_dtype path —
    the per-chunk slabs are the kernels' dominant HBM traffic, and the
    combine accumulates f32 either way (r3 'bf16 slabs' lore, applied
    to the DGN kernel family in r5)."""
    return jnp.bfloat16 if data_dtype == "bfloat16" else jnp.float32


def _fwd_kernel(fb_ref, wf_ref, recv_ref, send_ref, w_ref, *refs,
                block_n, K, s_s, data_dtype="float32"):
    b_refs = refs[:s_s]
    slab_ref = refs[-1]
    recv = recv_ref[...].reshape(-1, 1).astype(jnp.int32)
    send = send_ref[...].reshape(-1, 1).astype(jnp.int32)
    Be = recv.shape[0]
    cols_r = jax.lax.broadcasted_iota(jnp.int32, (Be, S_R * block_n), 1)
    cols_s = jax.lax.broadcasted_iota(jnp.int32, (Be, s_s * block_n), 1)
    oh_r = jnp.where(cols_r == recv, 1.0, 0.0).astype(jnp.float32)
    oh_s = jnp.where(cols_s == send, 1.0, 0.0).astype(jnp.float32)
    b_win = jnp.concatenate([r[...] for r in b_refs], 0)
    h = onehot_dot(oh_s, b_win)                       # [Be, d] f32 acc
    if data_dtype == "bfloat16":
        # compute_dtype mode: h and w both bf16 -> ONE pass per weight
        # column (same rounding class as the rest of the bf16 path)
        hb = h.astype(jnp.bfloat16)
        parts = [onehot_dot_t((oh_r * w).astype(jnp.bfloat16), hb)
                 for w in _w_cols(w_ref, K)]
    else:
        parts = [_wdot_t(oh_r, w, h)                  # [2Bn, d] each
                 for w in _w_cols(w_ref, K)]
    slab_ref[...] = jnp.concatenate(parts, axis=1).astype(
        slab_ref.dtype)[None]


def _bwd_kernel(fb_ref, wf_ref, recv_ref, send_ref, w_ref, *refs,
                block_n, K, s_s, data_dtype="float32"):
    b_refs = refs[:s_s]
    g0, g1, dw_ref, db_slab_ref = refs[s_s:]
    recv = recv_ref[...].reshape(-1, 1).astype(jnp.int32)
    send = send_ref[...].reshape(-1, 1).astype(jnp.int32)
    Be = recv.shape[0]
    cols_r = jax.lax.broadcasted_iota(jnp.int32, (Be, S_R * block_n), 1)
    cols_s = jax.lax.broadcasted_iota(jnp.int32, (Be, s_s * block_n), 1)
    oh_r = jnp.where(cols_r == recv, 1.0, 0.0).astype(jnp.float32)
    oh_s = jnp.where(cols_s == send, 1.0, 0.0).astype(jnp.float32)
    b_win = jnp.concatenate([r[...] for r in b_refs], 0)
    h = onehot_dot(oh_s, b_win)                       # [Be, d]
    d = h.shape[1]
    g_span = jnp.concatenate([g0[...], g1[...]], 0)   # [2Bn, K*d]
    if data_dtype == "bfloat16":
        g_span = g_span.astype(jnp.bfloat16)   # single-pass gather
    g_e = onehot_dot(oh_r, g_span)                    # [Be, K*d]
    dh = jnp.zeros_like(h)
    dws = []
    for k, w in enumerate(_w_cols(w_ref, K)):
        g_k = jax.lax.slice_in_dim(g_e, k * d, (k + 1) * d, axis=1)
        dh = dh + w * g_k
        dws.append(jnp.sum(h * g_k, axis=1, keepdims=True))
    dw_ref[...] = jnp.concatenate(dws, axis=1)        # [Be, K]
    if data_dtype == "bfloat16":
        dh = dh.astype(jnp.bfloat16)   # single-pass scatter dot
    db_slab_ref[...] = onehot_dot_t(oh_s, dh).astype(
        db_slab_ref.dtype)[None]                      # [s_s*Bn, d]


@functools.partial(jax.custom_vjp,
                   nondiff_argnums=(6, 7, 8, 9, 10, 11, 12))
def slab_weighted_gather(B, W, recv_local, send_local, fb_wf,
                         num_real_nodes,
                         num_nodes: int, block_n: int, block_e: int,
                         interpret: bool = False,
                         s_s: int = S_S,
                         data_dtype: str = "float32",
                         kc=(None, None)):
    """out[v, k*d:(k+1)*d] = Σ_{e→v} W[e, k] · B[send(e)].

    ``B`` [N, d] node rows (shared send/recv index space padded to
    ``num_nodes``); ``W`` [E, K] per-edge weight columns (0 on padding
    edges); metadata exactly as ``slab_edge_message_aggregate``.
    ``data_dtype='bfloat16'``: single-pass bf16 dots (B, h, w all
    rounded bf16 — the compute_dtype class of rounding); 'float32' uses
    the ~16-bit split scheme.  Returns [num_nodes, K*d] float32."""
    out, _ = _fwd(B, W, recv_local, send_local, fb_wf, num_nodes,
                  block_n, block_e, interpret, s_s, data_dtype, kc)
    return out


def _fwd(B, W, recv_local, send_local, fb_wf, num_nodes, block_n,
         block_e, interpret, s_s, data_dtype="float32",
         kc=(None, None)):
    C = fb_wf.shape[1]
    d = B.shape[1]
    K = W.shape[1]
    num_blocks = num_nodes // block_n
    ddt = (jnp.bfloat16 if data_dtype == "bfloat16" else jnp.float32)
    B_p = _pad_nodes(B, num_nodes, ddt)
    W_f = W.astype(jnp.float32)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(C,),
        in_specs=[
            pl.BlockSpec((1, 1, block_e), lambda t, fb, wf: (t, 0, 0)),
            pl.BlockSpec((1, 1, block_e), lambda t, fb, wf: (t, 0, 0)),
            pl.BlockSpec((block_e, K), lambda t, fb, wf: (t, 0)),
        ] + [
            pl.BlockSpec((block_n, d),
                         lambda t, fb, wf, k=k: (_at(wf, t) + k, 0))
            for k in range(s_s)
        ],
        out_specs=pl.BlockSpec((1, S_R * block_n, K * d),
                               lambda t, fb, wf: (t, 0, 0)),
    )
    slabs = pl.pallas_call(
        functools.partial(_fwd_kernel, block_n=block_n, K=K, s_s=s_s,
                          data_dtype=data_dtype),
        grid_spec=grid_spec,
        out_shape=_out_struct((C, S_R * block_n, K * d),
                              _sdt(data_dtype),
                              B_p, W_f, recv_local, send_local, fb_wf),
        interpret=interpret,
    )(fb_wf[0], fb_wf[1],
      recv_local.reshape(C, 1, block_e),
      send_local.reshape(C, 1, block_e),
      W_f, *((B_p,) * s_s))
    out = _combine_slabs(slabs, _ckey(fb_wf, 0), S_R, num_blocks,
                         block_n, K * d, kc=kc[0], interpret=interpret)
    return out, (B, W, recv_local, send_local, fb_wf)


def _fwd_vjp(B, W, recv_local, send_local, fb_wf, num_real_nodes,
             num_nodes, block_n, block_e, interpret, s_s,
             data_dtype="float32", kc=(None, None)):
    out, res = _fwd(B, W, recv_local, send_local, fb_wf, num_nodes,
                    block_n, block_e, interpret, s_s, data_dtype, kc)
    return out, res


def _bwd_vjp(num_nodes, block_n, block_e, interpret, s_s, data_dtype,
             kc, res, g):
    B, W, recv_local, send_local, fb_wf = res
    C = fb_wf.shape[1]
    d = B.shape[1]
    K = W.shape[1]
    num_blocks = num_nodes // block_n
    ddt = (jnp.bfloat16 if data_dtype == "bfloat16" else jnp.float32)
    B_p = _pad_nodes(B, num_nodes, ddt)
    W_f = W.astype(jnp.float32)
    g = jnp.pad(g.astype(jnp.float32),
                ((0, num_nodes - g.shape[0]), (0, 0)))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(C,),
        in_specs=[
            pl.BlockSpec((1, 1, block_e), lambda t, fb, wf: (t, 0, 0)),
            pl.BlockSpec((1, 1, block_e), lambda t, fb, wf: (t, 0, 0)),
            pl.BlockSpec((block_e, K), lambda t, fb, wf: (t, 0)),
        ] + [
            pl.BlockSpec((block_n, d),
                         lambda t, fb, wf, k=k: (_at(wf, t) + k, 0))
            for k in range(s_s)
        ] + [
            pl.BlockSpec((block_n, K * d),
                         lambda t, fb, wf: (_at(fb, t), 0)),
            pl.BlockSpec((block_n, K * d),
                         lambda t, fb, wf: (_at(fb, t) + 1, 0)),
        ],
        out_specs=[
            pl.BlockSpec((block_e, K), lambda t, fb, wf: (t, 0)),
            pl.BlockSpec((1, s_s * block_n, d),
                         lambda t, fb, wf: (t, 0, 0)),
        ],
    )
    dW, db_slabs = pl.pallas_call(
        functools.partial(_bwd_kernel, block_n=block_n, K=K, s_s=s_s,
                          data_dtype=data_dtype),
        grid_spec=grid_spec,
        out_shape=[
            _out_struct((C * block_e, K), jnp.float32,
                        B_p, W_f, recv_local, send_local, fb_wf, g),
            _out_struct((C, s_s * block_n, d), _sdt(data_dtype),
                        B_p, W_f, recv_local, send_local, fb_wf, g),
        ],
        interpret=interpret,
    )(fb_wf[0], fb_wf[1],
      recv_local.reshape(C, 1, block_e),
      send_local.reshape(C, 1, block_e),
      W_f, *((B_p,) * s_s), g, g)
    dB = _combine_slabs(db_slabs, _ckey(fb_wf, 1), s_s, num_blocks,
                        block_n, d, kc=kc[1],
                        interpret=interpret)[:B.shape[0]].astype(B.dtype)
    return (dB, dW[:W.shape[0]].astype(W.dtype), None, None, None, None)


slab_weighted_gather.defvjp(_fwd_vjp, _bwd_vjp)


# ---------------------------------------------------------------------------
# Fused DGN aggregation: the weighted sums AND segment max/min from ONE
# kernel launch per direction (they share the one-hot builds, the B-window
# DMAs and the h gather — three separate launches re-did all of that,
# ~20% of the measured DGN step).

from .slab_minmax import (NEG, _minmax_combine_cnt,  # noqa: E402
                          minmax_dh_body, minmax_fwd_slabs)


def _common_state(recv_ref, send_ref, b_refs, block_n, s_s):
    recv = recv_ref[...].reshape(-1, 1).astype(jnp.int32)
    send = send_ref[...].reshape(-1, 1).astype(jnp.int32)
    Be = recv.shape[0]
    cols_r = jax.lax.broadcasted_iota(jnp.int32, (Be, S_R * block_n), 1)
    cols_s = jax.lax.broadcasted_iota(jnp.int32, (Be, s_s * block_n), 1)
    oh_r = jnp.where(cols_r == recv, 1.0, 0.0).astype(jnp.float32)
    oh_s = jnp.where(cols_s == send, 1.0, 0.0).astype(jnp.float32)
    b_win = jnp.concatenate([r[...] for r in b_refs], 0)
    h = onehot_dot(oh_s, b_win)
    return recv, oh_r, oh_s, h, b_win.dtype, Be


def _hc_of(h, b_dtype):
    hm = h.astype(jnp.bfloat16) if b_dtype == jnp.bfloat16 else h
    return jnp.concatenate([hm, -hm], axis=1)


def _dgn_fwd_kernel(fb_ref, wf_ref, recv_ref, send_ref, w_ref, *refs,
                    block_n, K, s_s, data_dtype):
    b_refs = refs[:s_s]
    wslab_ref, mmslab_ref, cnt_ref = refs[-3], refs[-2], refs[-1]
    recv, oh_r, oh_s, h, b_dtype, Be = _common_state(
        recv_ref, send_ref, b_refs, block_n, s_s)
    if data_dtype == "bfloat16":
        hb = h.astype(jnp.bfloat16)
        parts = [onehot_dot_t((oh_r * w).astype(jnp.bfloat16), hb)
                 for w in _w_cols(w_ref, K)]
    else:
        parts = [_wdot_t(oh_r, w, h) for w in _w_cols(w_ref, K)]
    wslab_ref[...] = jnp.concatenate(parts, axis=1).astype(
        wslab_ref.dtype)[None]
    valid = recv >= 0
    slab, cnt_slab = minmax_fwd_slabs(
        recv, oh_r, _hc_of(h, b_dtype), valid, Be)
    mmslab_ref[...] = slab.astype(mmslab_ref.dtype)[None]
    cnt_ref[...] = cnt_slab.astype(cnt_ref.dtype)[None]


def _dgn_bwd_kernel(fb_ref, wf_ref, recv_ref, send_ref, w_ref, *refs,
                    block_n, K, s_s, data_dtype):
    """The WHOLE fused backward in one launch: weighted dW + the merged
    dh (weighted + minmax even-tie-split cotangents) scattered into a
    single dB slab.  The tie counts were produced by the forward, so
    the minmax part only gathers the node-level Gp = g/max(cnt,1)."""
    b_refs = refs[:s_s]
    gw0, gw1, raw0, raw1, gp0, gp1, dw_ref, db_slab_ref = refs[s_s:]
    recv, oh_r, oh_s, h, b_dtype, Be = _common_state(
        recv_ref, send_ref, b_refs, block_n, s_s)
    d = h.shape[1]
    g_span = jnp.concatenate([gw0[...], gw1[...]], 0)   # [2Bn, K*d]
    if data_dtype == "bfloat16":
        g_span = g_span.astype(jnp.bfloat16)
    g_e = onehot_dot(oh_r, g_span)
    dh = jnp.zeros_like(h)
    dws = []
    for k, w in enumerate(_w_cols(w_ref, K)):
        g_k = jax.lax.slice_in_dim(g_e, k * d, (k + 1) * d, axis=1)
        dh = dh + w * g_k
        dws.append(jnp.sum(h * g_k, axis=1, keepdims=True))
    dw_ref[...] = jnp.concatenate(dws, axis=1)          # [Be, K]
    raw_span = jnp.concatenate([raw0[...], raw1[...]], 0)
    gp_span = jnp.concatenate([gp0[...], gp1[...]], 0)
    out_e = onehot_dot(oh_r, raw_span)
    gp_e = onehot_dot(oh_r, gp_span)
    valid = recv >= 0
    dh = dh + minmax_dh_body(_hc_of(h, b_dtype), out_e, gp_e, valid)
    if data_dtype == "bfloat16":
        dh = dh.astype(jnp.bfloat16)
    db_slab_ref[...] = onehot_dot_t(oh_s, dh).astype(
        db_slab_ref.dtype)[None]


def _span2(block_n, width):
    return [
        pl.BlockSpec((block_n, width),
                     lambda t, fb, wf: (_at(fb, t), 0)),
        pl.BlockSpec((block_n, width),
                     lambda t, fb, wf: (_at(fb, t) + 1, 0)),
    ]


def _base_specs(block_e, block_n, d, K, s_s):
    return [
        pl.BlockSpec((1, 1, block_e), lambda t, fb, wf: (t, 0, 0)),
        pl.BlockSpec((1, 1, block_e), lambda t, fb, wf: (t, 0, 0)),
        pl.BlockSpec((block_e, K), lambda t, fb, wf: (t, 0)),
    ] + [
        pl.BlockSpec((block_n, d),
                     lambda t, fb, wf, k=k: (_at(wf, t) + k, 0))
        for k in range(s_s)
    ]


@functools.partial(jax.custom_vjp,
                   nondiff_argnums=(6, 7, 8, 9, 10, 11, 12))
def slab_dgn_fused(B, W, recv_local, send_local, fb_wf, num_real_nodes,
                   num_nodes: int, block_n: int, block_e: int,
                   interpret: bool = False, s_s: int = S_S,
                   data_dtype: str = "float32", kc=(None, None)):
    """(weighted [N, K*d], minmax [N, 2d]) — `slab_weighted_gather` and
    `slab_segment_minmax` fused into one forward launch (and a fused
    backward pass 1).  Same metadata/semantics as the standalone ops."""
    (w_out, mm_out), _ = _dgn_fwd(B, W, recv_local, send_local, fb_wf,
                                  num_nodes, block_n, block_e,
                                  interpret, s_s, data_dtype, kc)
    return w_out, mm_out


def _dgn_fwd(B, W, recv_local, send_local, fb_wf, num_nodes, block_n,
             block_e, interpret, s_s, data_dtype, kc=(None, None)):
    C = fb_wf.shape[1]
    d = B.shape[1]
    K = W.shape[1]
    num_blocks = num_nodes // block_n
    ddt = (jnp.bfloat16 if data_dtype == "bfloat16" else jnp.float32)
    B_p = _pad_nodes(B, num_nodes, ddt)
    W_f = W.astype(jnp.float32)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(C,),
        in_specs=_base_specs(block_e, block_n, d, K, s_s),
        out_specs=[
            pl.BlockSpec((1, S_R * block_n, K * d),
                         lambda t, fb, wf: (t, 0, 0)),
            pl.BlockSpec((1, S_R * block_n, 2 * d),
                         lambda t, fb, wf: (t, 0, 0)),
            pl.BlockSpec((1, S_R * block_n, 2 * d),
                         lambda t, fb, wf: (t, 0, 0)),
        ],
    )
    w_slabs, mm_slabs, cnt_slabs = pl.pallas_call(
        functools.partial(_dgn_fwd_kernel, block_n=block_n, K=K,
                          s_s=s_s, data_dtype=data_dtype),
        grid_spec=grid_spec,
        out_shape=[
            _out_struct((C, S_R * block_n, K * d), _sdt(data_dtype),
                        B_p, W_f, recv_local, send_local, fb_wf),
            _out_struct((C, S_R * block_n, 2 * d), _sdt(data_dtype),
                        B_p, W_f, recv_local, send_local, fb_wf),
            _out_struct((C, S_R * block_n, 2 * d), _sdt(data_dtype),
                        B_p, W_f, recv_local, send_local, fb_wf),
        ],
        interpret=interpret,
    )(fb_wf[0], fb_wf[1],
      recv_local.reshape(C, 1, block_e),
      send_local.reshape(C, 1, block_e),
      W_f, *((B_p,) * s_s))
    w_out = _combine_slabs(w_slabs, _ckey(fb_wf, 0), S_R, num_blocks,
                           block_n, K * d, kc=kc[0],
                           interpret=interpret)
    raw, cnt = _minmax_combine_cnt(mm_slabs, cnt_slabs, _ckey(fb_wf, 0),
                                   num_blocks, block_n, 2 * d,
                                   kc=kc[0], interpret=interpret)
    mm_out = jnp.where(raw <= NEG / 2, 0.0, raw)
    return ((w_out, mm_out),
            (B, W, recv_local, send_local, fb_wf, raw, cnt))


def _dgn_fwd_vjp(B, W, recv_local, send_local, fb_wf, num_real_nodes,
                 num_nodes, block_n, block_e, interpret, s_s,
                 data_dtype, kc=(None, None)):
    out, res = _dgn_fwd(B, W, recv_local, send_local, fb_wf, num_nodes,
                        block_n, block_e, interpret, s_s, data_dtype, kc)
    return out, res


def _dgn_bwd_vjp(num_nodes, block_n, block_e, interpret, s_s,
                 data_dtype, kc, res, g):
    g_w, g_mm = g
    B, W, recv_local, send_local, fb_wf, raw, cnt = res
    C = fb_wf.shape[1]
    d = B.shape[1]
    K = W.shape[1]
    num_blocks = num_nodes // block_n
    ddt = (jnp.bfloat16 if data_dtype == "bfloat16" else jnp.float32)
    B_p = _pad_nodes(B, num_nodes, ddt)
    W_f = W.astype(jnp.float32)
    g_w = jnp.pad(g_w.astype(jnp.float32),
                  ((0, num_nodes - g_w.shape[0]), (0, 0)))
    g_mm = jnp.pad(g_mm.astype(jnp.float32),
                   ((0, num_nodes - g_mm.shape[0]), (0, 0)))
    # tie counts came from the forward combine -> the minmax cotangent
    # is a node-level gather; the whole backward is ONE launch with a
    # single merged dB slab
    gp = g_mm / jnp.maximum(cnt, 1.0)

    grid1 = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(C,),
        in_specs=(_base_specs(block_e, block_n, d, K, s_s)
                  + _span2(block_n, K * d) + _span2(block_n, 2 * d) * 2),
        out_specs=[
            pl.BlockSpec((block_e, K), lambda t, fb, wf: (t, 0)),
            pl.BlockSpec((1, s_s * block_n, d),
                         lambda t, fb, wf: (t, 0, 0)),
        ],
    )
    dW, db_slabs = pl.pallas_call(
        functools.partial(_dgn_bwd_kernel, block_n=block_n, K=K,
                          s_s=s_s, data_dtype=data_dtype),
        grid_spec=grid1,
        out_shape=[
            _out_struct((C * block_e, K), jnp.float32,
                        B_p, W_f, recv_local, send_local, fb_wf, g_w),
            _out_struct((C, s_s * block_n, d), _sdt(data_dtype),
                        B_p, W_f, recv_local, send_local, fb_wf, g_w,
                        g_mm),
        ],
        interpret=interpret,
    )(fb_wf[0], fb_wf[1],
      recv_local.reshape(C, 1, block_e),
      send_local.reshape(C, 1, block_e),
      W_f, *((B_p,) * s_s), g_w, g_w, raw, raw, gp, gp)

    dB = _combine_slabs(db_slabs, _ckey(fb_wf, 1), s_s,
                        num_blocks, block_n, d, kc=kc[1],
                        interpret=interpret)[:B.shape[0]] \
        .astype(B.dtype)
    return (dB, dW[:W.shape[0]].astype(W.dtype), None, None, None, None)


slab_dgn_fused.defvjp(_dgn_fwd_vjp, _dgn_bwd_vjp)
