"""Slab-based fused edge-message kernel — v2, zero edge inflation.

v1 (retired in r4) aligned edge chunks to node blocks, which
padded edge arrays by 25-45% and taxed every edge-level op.  v2 keeps
the batch's edge arrays *dense* (original recv-sorted order, padding at
the tail) and lets each Be-edge chunk write a private output slab
covering the S_R=2 node blocks its receivers span; slabs are then
combined with one cheap sorted segment-sum over (C*S_R) block-rows.
Sender windows span s_s blocks around the chunk's first sender block,
with s_s ADAPTED per batch by ``build_slab_metadata`` (2-3 on molecular
batches; wider for graphs spanning multiple node blocks, up to
MAX_WINDOW).

Per chunk (all in VMEM, MXU matmuls):

    oh_r [Be, 2Bn]    receiver one-hot within the chunk's 2-block span
    oh_s [Be, s_s*Bn] sender one-hot within the s_s-block window
    H    = oh_r @ A_span + oh_s @ B_win (+ Pe + b1);  Hact = act(H)
    slab[t] = oh_rᵀ @ Hact                  # [2Bn, d], no revisiting

Backward returns dH = oh_r @ g_span (masked by act'), and the dA/dB
scatters are the same slab trick with oh_rᵀ / oh_sᵀ — no XLA scatter
anywhere.

Validity: the adaptive window covers each chunk's actual sender block
span (graphs up to ~(MAX_WINDOW-1)*Bn nodes), and a chunk's receivers
span <= 2 blocks when its block_e sorted receivers cover < 2*Bn node
ids — true for molecular batches (the batcher retries with smaller
block_e for sparse ones); the host builder returns None on violation
and callers fall back to the unfused path.
"""

from __future__ import annotations

import functools
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .onehot_dot import onehot_dot, onehot_dot3, onehot_dot_t

S_R = 2   # receiver span (node blocks per slab)
S_S = 4   # default/floor sender window (node blocks); callers pad the
#           shared node space to >= S_S blocks, and the ADAPTIVE window
#           (build_slab_metadata's per-batch s_s) is what the kernel
#           actually reads — the quantization ladder floors at 3 (see
#           below), so molecular batches land on 3 uniformly, up to
#           MAX_WINDOW when a graph spans multiple node blocks
MAX_WINDOW = 8   # VMEM guard: widest per-chunk B window the kernel loads


def build_slab_metadata(recv: np.ndarray, send: np.ndarray,
                        edge_mask: np.ndarray, num_nodes: int,
                        block_n: int = 128,
                        block_e: int = 256,
                        num_send_nodes: Optional[int] = None,
                        s_s: Optional[int] = None
                        ) -> Optional[Dict]:
    """Per-chunk metadata for dense recv-sorted edges.

    ``num_send_nodes``: size of the SENDER index space when it differs
    from the receiver space — under edge-partitioned execution
    (parallel/ep.py) receivers are shard-local node ids while senders
    are global ids into the all-gathered node array; default None means
    one shared space (single-device layout).

    ``s_s``: sender-window width in blocks.  None (default) ADAPTS it to
    this batch: the max over chunks of the sender block span, snapped to
    the quantization ladder (3, 4, 6, MAX_WINDOW) and clamped to
    send_blocks — molecular batches land on 3 (vs the old fixed 4: less
    VMEM traffic, a smaller oh_s dot and dB slab per chunk), while
    graphs wider than block_n nodes get a wider window instead of
    falling off the kernel path entirely (the r3 cap).
    Pass an explicit value to force uniformity across shards (EP builds
    one program for all shards).

    Returns dict with ``fb`` [C] (chunk's first recv block, clipped so
    fb+S_R fits the receiver space), ``wf`` [C] (sender window first
    block, clipped to the sender space), ``recv_local`` [E] in
    [0, S_R*block_n) or -1, ``send_local`` [E] in [0, s_s*block_n) or
    -1, and ``s_s`` — or None when any chunk violates the spans.  The
    kernel MUST be invoked with this metadata's ``s_s``.
    """
    E = len(recv)
    if E % block_e:
        return None
    num_blocks = -(-num_nodes // block_n)
    send_blocks = (num_blocks if num_send_nodes is None
                   else -(-num_send_nodes // block_n))
    if num_blocks < S_R:
        return None
    C = E // block_e
    fb = np.zeros(C, np.int32)
    recv_local = np.full(E, -1, np.int32)
    chunk_rows = []        # (t, s, m) for the second pass
    span_needed = 1
    prev_fb = 0
    for t in range(C):
        lo, hi = t * block_e, (t + 1) * block_e
        m = edge_mask[lo:hi]
        if not m.any():
            fb[t] = prev_fb
            continue
        r = recv[lo:hi][m]
        s = send[lo:hi][m]
        f = int(r.min() // block_n)
        f = min(f, num_blocks - S_R)
        if (r.max() // block_n) - f >= S_R:
            return None           # receiver span too wide (sparse batch)
        span_needed = max(span_needed,
                          int(s.max() // block_n) - int(s.min() // block_n)
                          + 1)
        rl = np.full(block_e, -1, np.int32)
        rl[m] = (r - f * block_n).astype(np.int32)
        recv_local[lo:hi] = rl
        fb[t] = f
        prev_fb = f
        chunk_rows.append((t, s, m))
    if s_s is None:
        # QUANTIZED adaptation: s_s is a static jit/treedef property of
        # the batch, so a per-batch exact span (2 vs 3 depending on
        # where graphs straddle block boundaries) would fragment the
        # one-compiled-shape guarantee of caps_mode='worst' and the
        # scanned-epoch runs (every fresh shape pays a remote compile).
        # Snap to a small ladder instead: molecular datasets land on 3
        # uniformly; multi-block graphs get the next rung.
        for rung in (3, 4, 6, MAX_WINDOW):
            if rung >= span_needed:
                s_s = rung
                break
        else:
            s_s = MAX_WINDOW
        # a window as wide as the whole (padded) sender space always
        # fits trivially, so clamping to send_blocks can only help
        s_s = min(s_s, send_blocks)
    if s_s > MAX_WINDOW or s_s > send_blocks:
        return None
    wf = np.zeros(C, np.int32)
    send_local = np.full(E, -1, np.int32)
    prev_wf = 0
    rows = dict((t, (s, m)) for t, s, m in chunk_rows)
    for t in range(C):
        if t not in rows:
            wf[t] = prev_wf
            continue
        s, m = rows[t]
        lo = t * block_e
        w = min(int(s.min() // block_n), send_blocks - s_s)
        sl = s - w * block_n
        if (sl < 0).any() or (sl >= s_s * block_n).any():
            return None           # span wider than the forced s_s
        sv = np.full(block_e, -1, np.int32)
        sv[m] = sl.astype(np.int32)
        send_local[lo:lo + block_e] = sv
        wf[t] = w
        prev_wf = w
    # static max-contributors-per-output-block for the accumulating
    # Pallas combine (slab_combine.py).  EMPTY chunks inherit prev_fb /
    # prev_wf (DMA coherence for the main kernel) and would otherwise
    # pile dozens of zero contributors onto one block, pushing the count
    # off the ladder — the combine uses SENTINEL keys (= one past the
    # last block) for them instead: sorted sentinels land outside every
    # block's searchsorted window, and their zero slabs are skipped.
    from .slab_combine import combine_kc
    nonempty = np.zeros(C, bool)
    for t, _s, _m in chunk_rows:
        nonempty[t] = True
    fb_comb = np.where(nonempty, fb, num_blocks).astype(np.int32)
    wf_comb = np.where(nonempty, wf, send_blocks).astype(np.int32)
    kc = (combine_kc(fb_comb, S_R, num_blocks),
          combine_kc(wf_comb, s_s, send_blocks))
    return {"fb": fb, "wf": wf, "fb_comb": fb_comb, "wf_comb": wf_comb,
            "recv_local": recv_local,
            "send_local": send_local, "block_n": block_n,
            "block_e": block_e, "num_blocks": num_blocks, "s_s": s_s,
            "kc": kc}


def _onehots(recv_ref, send_ref, block_n, s_s):
    recv = recv_ref[...].reshape(-1, 1).astype(jnp.int32)
    send = send_ref[...].reshape(-1, 1).astype(jnp.int32)
    Be = recv.shape[0]
    cols_r = jax.lax.broadcasted_iota(jnp.int32, (Be, S_R * block_n), 1)
    cols_s = jax.lax.broadcasted_iota(jnp.int32, (Be, s_s * block_n), 1)
    oh_r = jnp.where(cols_r == recv, 1.0, 0.0).astype(jnp.float32)
    oh_s = jnp.where(cols_s == send, 1.0, 0.0).astype(jnp.float32)
    return oh_r, oh_s


# Every dot here multiplies a 0/1 one-hot by real f32 data.  DEFAULT
# (1-pass bf16) would round activations/gradients to bf16 (~4e-3
# relative error per layer); HIGHEST (full f32 emulation, 6+ passes) is
# exact but pays double.  onehot_dot/onehot_dot_t do it exactly in 3
# bf16 passes — both in-kernel and for the XLA-level slab combine.
# (XLA's Precision.HIGH is NOT equivalent: TPU bf16_3x splits each
# operand into only TWO bf16 chunks, i.e. ~16 data mantissa bits.)


def _h(oh_r, oh_s, a_refs, b_refs, pe_ref, bias_ref, has_pe):
    b_win = jnp.concatenate([r[...] for r in b_refs], 0)
    h = onehot_dot(oh_s, b_win)
    if a_refs:     # has_a=False: the A side is identically zero (gin/ogb)
        a_span = jnp.concatenate([r[...] for r in a_refs], 0)
        h = h + onehot_dot(oh_r, a_span)
    if has_pe:
        h = h + pe_ref[...]
    return h + bias_ref[...]


def _fwd_kernel(fb_ref, wf_ref, recv_ref, send_ref, pe_ref,
                *refs, block_n, act, has_pe, has_a=True,
                data_dtype="float32", s_s=S_S):
    a_refs = refs[:2] if has_a else ()
    b_refs = refs[2:2 + s_s] if has_a else refs[0:s_s]
    bias_ref, slab_ref = refs[-2], refs[-1]
    oh_r, oh_s = _onehots(recv_ref, send_ref, block_n, s_s)
    h = _h(oh_r, oh_s, a_refs, b_refs, pe_ref, bias_ref, has_pe)
    if act == "relu":
        h = jnp.maximum(h, 0.0)
    elif act == "id_sq":
        # joint [H, H^2] aggregation: one call yields both first and
        # second masked moments of the pre-activation (for fused BN)
        h = jnp.concatenate([h, h * h], axis=1)
    if data_dtype == "bfloat16" and act != "id_sq":
        # messages are bf16-valued in compute_dtype mode (same rounding
        # the unfused bf16 Dense path applies); each chunk's slab
        # accumulates in f32 via preferred_element_type, and the slab is
        # WRITTEN bf16 — halves the HBM retiling traffic of the combine
        # and makes the combine dot single-pass
        h = h.astype(jnp.bfloat16)
        slab_ref[...] = onehot_dot_t(oh_r, h).astype(jnp.bfloat16)[None]
    else:
        slab_ref[...] = onehot_dot_t(oh_r, h)[None]


def _bwd_kernel(fb_ref, wf_ref, recv_ref, send_ref, pe_ref,
                *refs, block_n, act, has_pe, has_a=True,
                data_dtype="float32", s_s=S_S):
    a_refs = refs[:2] if has_a else ()
    b_refs = refs[2:2 + s_s] if has_a else refs[0:s_s]
    rest = refs[(2 + s_s) if has_a else s_s:]
    if has_a:
        bias_ref, g0, g1, dh_ref, da_slab_ref, db_slab_ref = rest
    else:
        bias_ref, g0, g1, dh_ref, db_slab_ref = rest
        da_slab_ref = None
    oh_r, oh_s = _onehots(recv_ref, send_ref, block_n, s_s)
    g_span = jnp.concatenate([g0[...], g1[...]], 0)   # [2Bn, d or 2d]
    if data_dtype == "bfloat16" and act != "id_sq":
        g_span = g_span.astype(jnp.bfloat16)
    g_e = onehot_dot(oh_r, g_span)
    if act in ("relu", "id_sq"):
        h = _h(oh_r, oh_s, a_refs, b_refs, pe_ref, bias_ref, has_pe)
        if act == "relu":
            g_e = jnp.where(h > 0, g_e, 0.0)
        else:
            d1 = h.shape[1]
            g_e = g_e[:, :d1] + 2.0 * h * g_e[:, d1:]
    if data_dtype == "bfloat16" and act != "id_sq":
        g_e = g_e.astype(jnp.bfloat16)   # single-pass scatter dots;
        #   dH (the dPe/db1 carrier) is also WRITTEN bf16 — it was the
        #   last f32 [E, d] stream in the bwd kernel (89 MB/layer on
        #   molhiv; the downstream consumers are the bf16-class
        #   embedding cotangents)
    # (dtype derived from flags, not dh_ref.dtype: the interpret-mode
    # _W ref emulation wrapper has no dtype attribute)
    dh_ref[...] = g_e
    if data_dtype == "bfloat16" and act != "id_sq":
        if da_slab_ref is not None:
            da_slab_ref[...] = onehot_dot_t(
                oh_r, g_e).astype(jnp.bfloat16)[None]
        db_slab_ref[...] = onehot_dot_t(
            oh_s, g_e).astype(jnp.bfloat16)[None]
    else:
        if da_slab_ref is not None:
            da_slab_ref[...] = onehot_dot_t(oh_r, g_e)[None]
        db_slab_ref[...] = onehot_dot_t(oh_s, g_e)[None]


def _at(arr, t):
    """``arr[t]`` with ``t`` promoted to ``arr``'s varying mesh axes.

    Inside a checked shard_map the scalar-prefetch arrays are
    device-varying (vma={'ep'}) while the grid index is invariant;
    dynamic_slice requires the vma to match, so lift ``t`` first.
    No-op outside shard_map (vma empty / untracked)."""
    try:
        vma = jax.typeof(arr).vma
    except Exception:
        vma = None
    if vma:
        try:
            t = jax.lax.pvary(t, tuple(vma))
        except Exception:
            pass
    return arr[t]


def _specs(block_e, block_n, d1, has_a=True, s_s=S_S):
    """Shared input specs: recv, send, Pe, [A-span (2 blocks) iff has_a],
    B-window (``s_s`` blocks), bias.  has_a=False (gin/ogb: A
    identically 0) drops the A-block DMAs entirely."""
    a_specs = [
        pl.BlockSpec((block_n, d1), lambda t, fb, wf: (_at(fb, t), 0)),
        pl.BlockSpec((block_n, d1),
                     lambda t, fb, wf: (_at(fb, t) + 1, 0)),
    ] if has_a else []
    b_specs = [
        pl.BlockSpec((block_n, d1),
                     lambda t, fb, wf, k=k: (_at(wf, t) + k, 0))
        for k in range(s_s)
    ]
    return [
        pl.BlockSpec((1, 1, block_e), lambda t, fb, wf: (t, 0, 0)),
        pl.BlockSpec((1, 1, block_e), lambda t, fb, wf: (t, 0, 0)),
        pl.BlockSpec((block_e, d1), lambda t, fb, wf: (t, 0)),
    ] + a_specs + b_specs + [
        pl.BlockSpec((1, d1), lambda t, fb, wf: (0, 0)),
    ]


def _ckey(fb_wf, side):
    """Combine key row: 0=receiver (fb), 1=sender (wf).  Rows 2/3,
    when present, carry the empty-chunk-sentinel variants built by
    build_slab_metadata for the Pallas combine."""
    return fb_wf[2 + side] if fb_wf.shape[0] >= 4 else fb_wf[side]


def _combine_slabs(slabs, first_block, span, num_blocks, block_n, d,
                   kc=None, interpret=False):
    """[C, span*Bn, d] chunk slabs -> [num_blocks*Bn, d] block-row
    reduction, expressed as a one-hot MXU matmul.

    ``kc`` (static, from build_slab_metadata's per-batch "kc" pair):
    max contributing chunks per output block — when given (and not
    interpreting) the reduction runs as the accumulating Pallas combine
    kernel instead, which reads each slab block once and writes each
    output block once with NO retiling copy (slab_combine.py).

    XLA lowers the equivalent sorted segment-sum to a serial
    dynamic-update-slice loop (~200 GB/s measured); the [num_blocks,
    C*span] 0/1 assignment matmul reads every slab row once at matmul
    speed and costs only num_blocks*C*span*Bn*d extra MAC flops (~5
    GFLOP on the bench shapes, ~0.1 ms).  The rhs stays RANK-3
    [C*span, Bn, d] (onehot_dot3): flattening to [C*span, Bn*d] forced
    a physical retiling copy that was 13% of the molhiv step."""
    if kc is not None and not interpret:
        from .slab_combine import slab_combine_sum
        return slab_combine_sum(slabs, first_block, span, num_blocks,
                                block_n, d, kc)
    C = slabs.shape[0]
    rows = slabs.reshape(C * span, block_n, d)   # leading merge: free
    ids = (first_block[:, None]
           + jnp.arange(span, dtype=first_block.dtype)[None, :]).reshape(-1)
    assign = (ids[None, :]
              == jnp.arange(num_blocks, dtype=ids.dtype)[:, None]
              ).astype(jnp.float32)
    # onehot_dot3 (bf16x3 for f32 data, 1 pass for bf16): exact f32
    # accumulation of the slab partials
    out = onehot_dot3(assign, rows)
    return out.reshape(num_blocks * block_n, d)


def _pad_nodes(x, rows, dtype=jnp.float32):
    return jnp.pad(x.astype(dtype), ((0, rows - x.shape[0]), (0, 0)))


class _R:
    """Read-only Ref stand-in for the interpret emulation."""
    __slots__ = ("v",)

    def __init__(self, v):
        self.v = v

    def __getitem__(self, k):
        return self.v[k] if k is not Ellipsis else self.v


class _W(_R):
    """Writable Ref stand-in."""

    def __init__(self):
        self.v = None

    def __setitem__(self, k, val):
        self.v = val


def _nb(arr, first_block, k, block_n):
    """Node block ``first_block + k`` of ``arr`` (traced start index)."""
    start = (first_block + k) * block_n
    return jax.lax.dynamic_slice_in_dim(arr, start, block_n, axis=0)


def _ab_refs(A, B, fb, wf, t, block_n, has_a, s_s=S_S):
    """The per-chunk [A-span?, B-window] Ref stand-ins (emulation)."""
    a = ([_R(_nb(A, fb[t], 0, block_n)), _R(_nb(A, fb[t], 1, block_n))]
         if has_a else [])
    return a + [_R(_nb(B, wf[t], k, block_n)) for k in range(s_s)]


def _emu_fwd(fb, wf, recv3, send3, Pe, A, B, bias, block_n, block_e,
             act, has_pe, data_dtype="float32", has_a=True, s_s=S_S):
    """Run ``_fwd_kernel`` chunk-by-chunk without pallas_call.

    The interpret path must work INSIDE a checked shard_map (the EP
    trainer), where pallas interpret mode trips over vma tracking in its
    index-map re-evaluation; this emulation executes the identical
    kernel body with plain traced slicing instead.  The Mosaic path is
    exercised on hardware by scripts/tpu_smoke.py."""
    C = recv3.shape[0]
    slabs = []
    for t in range(C):
        out = _W()
        _fwd_kernel(
            None, None, _R(recv3[t:t + 1]), _R(send3[t:t + 1]),
            _R(Pe[t * block_e:(t + 1) * block_e]),
            *_ab_refs(A, B, fb, wf, t, block_n, has_a, s_s),
            _R(bias), out, block_n=block_n, act=act, has_pe=has_pe,
            has_a=has_a, data_dtype=data_dtype, s_s=s_s)
        slabs.append(out.v)
    return jnp.concatenate(slabs, 0)


def _emu_bwd(fb, wf, recv3, send3, Pe, A, B, bias, g, block_n, block_e,
             act, has_pe, data_dtype="float32", has_a=True, s_s=S_S):
    C = recv3.shape[0]
    dh, da, db = [], [], []
    for t in range(C):
        o_dh, o_da, o_db = _W(), _W(), _W()
        outs = ((o_dh, o_da, o_db) if has_a else (o_dh, o_db))
        _bwd_kernel(
            None, None, _R(recv3[t:t + 1]), _R(send3[t:t + 1]),
            _R(Pe[t * block_e:(t + 1) * block_e]),
            *_ab_refs(A, B, fb, wf, t, block_n, has_a, s_s),
            _R(bias), _R(_nb(g, fb[t], 0, block_n)),
            _R(_nb(g, fb[t], 1, block_n)),
            *outs, block_n=block_n, act=act, has_pe=has_pe,
            has_a=has_a, data_dtype=data_dtype, s_s=s_s)
        dh.append(o_dh.v)
        if has_a:
            da.append(o_da.v)
        db.append(o_db.v)
    return (jnp.concatenate(dh, 0),
            jnp.concatenate(da, 0) if has_a else None,
            jnp.concatenate(db, 0))


def _match_vma(primal, cot):
    """psum a cotangent over any mesh axes the primal does not vary on.

    Under a checked shard_map, the transpose of an invariant->varying
    broadcast is a psum; jax inserts it automatically for primitive ops
    but trusts custom_vjp rules to do it themselves.  A replicated
    parameter (e.g. the bias b1) consumed by varying per-shard edges
    therefore needs its cotangent psum'd here — the value is also the
    mathematically correct global gradient (sum over all shards' edges).
    No-op outside shard_map."""
    if cot is None or primal is None:
        return cot
    try:
        extra = tuple(jax.typeof(cot).vma - jax.typeof(primal).vma)
    except Exception:
        return cot
    return jax.lax.psum(cot, extra) if extra else cot


def _out_struct(shape, dtype, *arrs):
    """ShapeDtypeStruct whose `vma` (varying-mesh-axes) is the union of
    the inputs' — required for pallas_call inside a checked shard_map
    (the checker can't infer how a kernel's output varies)."""
    vma = frozenset()
    for a in arrs:
        try:
            vma = vma | jax.typeof(a).vma
        except Exception:
            continue
    try:
        return jax.ShapeDtypeStruct(shape, dtype, vma=vma)
    except TypeError:      # older jax: no vma kwarg
        return jax.ShapeDtypeStruct(shape, dtype)


@functools.partial(jax.custom_vjp,
                   nondiff_argnums=(8, 9, 10, 11, 12, 13, 14, 15, 16, 17,
                                    18))
def slab_edge_message_aggregate(
        A, B, Pe, b1,
        recv_local, send_local, fb_wf, num_real_nodes,
        num_nodes: int, block_n: int, block_e: int,
        act: str = "relu", has_pe: bool = True,
        interpret: bool = False,
        num_send_nodes: Optional[int] = None,
        data_dtype: str = "float32",
        has_a: bool = True,
        s_s: int = S_S,
        kc=(None, None)):
    """agg[v] = Σ_{e→v} act(A[recv]+B[send]+Pe+b1)   — dense edges.

    fb_wf: stacked [2, C] of (fb, wf).  num_nodes: padded RECEIVER rows
    (multiple of block_n, >= S_R blocks; >= S_S when the sender space is
    shared).  num_send_nodes: padded SENDER rows when B lives in a
    different index space (edge-partitioned execution gathers B globally
    while A/out stay shard-local); None = shared space.
    data_dtype: 'bfloat16' rounds A/B/messages/cotangents to bf16 so
    every one-hot contraction is a single MXU pass (the compute_dtype
    path; aggregation accumulates f32); 'float32' = exact bf16x3.
    has_a=False: A is identically zero (gin/ogb message kinds) — the
    A-side dots, A-block DMAs and the dA slab are skipped entirely.
    Returns [num_nodes, d1] in the data dtype (f32, or bf16 under
    data_dtype='bfloat16'; the fused-BN id_sq moments are always f32)."""
    out, _ = _slab_fwd_impl(A, B, Pe if has_pe else None, b1, recv_local,
                            send_local, fb_wf, num_nodes, block_n,
                            block_e, act, interpret, num_send_nodes,
                            data_dtype, has_a, s_s, kc)
    return out


def _slab_fwd_impl(A, B, Pe, b1, recv_local, send_local, fb_wf,
                   num_nodes, block_n, block_e, act, interpret,
                   num_send_nodes=None, data_dtype="float32",
                   has_a=True, s_s=S_S, kc=(None, None)):
    C = fb_wf.shape[1]
    d1 = A.shape[1]
    od = 2 * d1 if act == "id_sq" else d1   # joint [H, H^2] slabs
    num_blocks = num_nodes // block_n
    has_pe = Pe is not None
    ddt = jnp.bfloat16 if data_dtype == "bfloat16" else jnp.float32
    # slabs are written in the data dtype (combine restores f32) — EXCEPT
    # the joint [H, H^2] fused-BN moments pass: bf16-rounded moments lose
    # most significant digits of var = E[H^2]-E[H]^2 when mean^2 ~ E[H^2]
    # (inputs stay bf16-rounded; H/H^2 accumulate and travel f32)
    odt = jnp.float32 if act == "id_sq" else ddt
    Pe_arr = (Pe.astype(ddt) if has_pe
              else jnp.zeros((C * block_e, d1), ddt))
    A = _pad_nodes(A, num_nodes, ddt)
    B = _pad_nodes(B, num_send_nodes
                   if num_send_nodes is not None else num_nodes, ddt)

    if interpret:
        # same kernel body, no pallas_call (shard_map-safe; Mosaic path
        # validated on hardware by scripts/tpu_smoke.py)
        slabs = _emu_fwd(fb_wf[0], fb_wf[1],
                         recv_local.reshape(C, 1, block_e),
                         send_local.reshape(C, 1, block_e),
                         Pe_arr, A, B,
                         b1.reshape(1, d1).astype(jnp.float32),
                         block_n, block_e, act, has_pe, data_dtype,
                         has_a, s_s)
    else:
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,   # fb, wf
            grid=(C,),
            in_specs=_specs(block_e, block_n, d1, has_a, s_s),
            out_specs=pl.BlockSpec((1, S_R * block_n, od),
                                   lambda t, fb, wf: (t, 0, 0)),
        )
        a_ops = (A, A) if has_a else ()
        slabs = pl.pallas_call(
            functools.partial(_fwd_kernel, block_n=block_n, act=act,
                              has_pe=has_pe, has_a=has_a,
                              data_dtype=data_dtype, s_s=s_s),
            grid_spec=grid_spec,
            out_shape=_out_struct((C, S_R * block_n, od), odt,
                                  A, B, Pe_arr, b1, recv_local,
                                  send_local, fb_wf),
            interpret=interpret,
        )(fb_wf[0], fb_wf[1],
          recv_local.reshape(C, 1, block_e),
          send_local.reshape(C, 1, block_e),
          Pe_arr, *a_ops, *((B,) * s_s),
          b1.reshape(1, d1).astype(jnp.float32))
    out = _combine_slabs(slabs, _ckey(fb_wf, 0), S_R, num_blocks,
                         block_n, od, kc=kc[0], interpret=interpret)
    if data_dtype == "bfloat16" and act != "id_sq":
        # the aggregate leaves in bf16: the next Dense would round it to
        # bf16 anyway (compute_dtype mode), and writing half the bytes
        # deletes a layer-boundary convert fusion.  The fused-BN moments
        # (id_sq) stay f32 — see odt above.
        out = out.astype(jnp.bfloat16)
    return out, None


def _slab_fwd(A, B, Pe, b1, recv_local, send_local, fb_wf, num_real_nodes,
              num_nodes, block_n, block_e, act, has_pe, interpret,
              num_send_nodes=None, data_dtype="float32", has_a=True,
              s_s=S_S, kc=(None, None)):
    out = slab_edge_message_aggregate(
        A, B, Pe, b1, recv_local, send_local, fb_wf, num_real_nodes,
        num_nodes, block_n, block_e, act, has_pe, interpret,
        num_send_nodes, data_dtype, has_a, s_s, kc)
    return out, (A, B, Pe, b1, recv_local, send_local, fb_wf)


def _slab_bwd(num_nodes, block_n, block_e, act, has_pe, interpret,
              num_send_nodes, data_dtype, has_a, s_s, kc, res, g):
    A, B, Pe, b1, recv_local, send_local, fb_wf = res
    C = fb_wf.shape[1]
    d1 = A.shape[1]
    od = 2 * d1 if act == "id_sq" else d1   # incoming cotangent width
    num_blocks = num_nodes // block_n
    num_send = num_send_nodes if num_send_nodes is not None else num_nodes
    send_blocks = num_send // block_n
    ddt = jnp.bfloat16 if data_dtype == "bfloat16" else jnp.float32
    odt = jnp.float32 if act == "id_sq" else ddt   # see _slab_fwd_impl
    Pe_arr = (Pe.astype(ddt) if has_pe
              else jnp.zeros((C * block_e, d1), ddt))
    A_p = _pad_nodes(A, num_nodes, ddt)
    B_p = _pad_nodes(B, num_send, ddt)
    # bf16 mode: ship the cotangent spans bf16 (the kernel casts them
    # anyway before the gather dot — DMAing f32 then rounding in-VMEM
    # paid double bandwidth); id_sq keeps the f32 moments cotangent
    gdt = ddt if act != "id_sq" else jnp.float32
    g = jnp.pad(g.astype(gdt),
                ((0, num_nodes - g.shape[0]), (0, 0)))

    if interpret:
        dH, da_slabs, db_slabs = _emu_bwd(
            fb_wf[0], fb_wf[1],
            recv_local.reshape(C, 1, block_e),
            send_local.reshape(C, 1, block_e),
            Pe_arr, A_p, B_p,
            b1.reshape(1, d1).astype(jnp.float32), g,
            block_n, block_e, act, has_pe, data_dtype, has_a, s_s)
    else:
        da_out_spec = [pl.BlockSpec((1, S_R * block_n, d1),
                                    lambda t, fb, wf: (t, 0, 0))] \
            if has_a else []
        da_out_shape = [_out_struct((C, S_R * block_n, d1), odt,
                                    A_p, B_p, Pe_arr, b1, recv_local,
                                    send_local, fb_wf, g)] if has_a else []
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(C,),
            in_specs=_specs(block_e, block_n, d1, has_a, s_s) + [
                pl.BlockSpec((block_n, od),
                             lambda t, fb, wf: (_at(fb, t), 0)),
                pl.BlockSpec((block_n, od),
                             lambda t, fb, wf: (_at(fb, t) + 1, 0)),
            ],
            out_specs=[
                pl.BlockSpec((block_e, d1), lambda t, fb, wf: (t, 0)),
            ] + da_out_spec + [
                pl.BlockSpec((1, s_s * block_n, d1),
                             lambda t, fb, wf: (t, 0, 0)),
            ],
        )
        a_ops = (A_p, A_p) if has_a else ()
        outs = pl.pallas_call(
            functools.partial(_bwd_kernel, block_n=block_n, act=act,
                              has_pe=has_pe, has_a=has_a,
                              data_dtype=data_dtype, s_s=s_s),
            grid_spec=grid_spec,
            out_shape=[
                _out_struct((C * block_e, d1), odt,
                            A_p, B_p, Pe_arr, b1, recv_local, send_local,
                            fb_wf, g),
            ] + da_out_shape + [
                _out_struct((C, s_s * block_n, d1), odt,
                            A_p, B_p, Pe_arr, b1, recv_local, send_local,
                            fb_wf, g),
            ],
            interpret=interpret,
        )(fb_wf[0], fb_wf[1],
          recv_local.reshape(C, 1, block_e),
          send_local.reshape(C, 1, block_e),
          Pe_arr, *a_ops, *((B_p,) * s_s),
          b1.reshape(1, d1).astype(jnp.float32), g, g)
        if has_a:
            dH, da_slabs, db_slabs = outs
        else:
            (dH, db_slabs), da_slabs = outs, None

    dA = (_combine_slabs(da_slabs, _ckey(fb_wf, 0), S_R, num_blocks,
                         block_n, d1, kc=kc[0],
                         interpret=interpret)[:A.shape[0]].astype(A.dtype)
          if da_slabs is not None else jnp.zeros_like(A))
    dB = _combine_slabs(db_slabs, _ckey(fb_wf, 1), s_s, send_blocks,
                        block_n, d1, kc=kc[1],
                        interpret=interpret)[:B.shape[0]].astype(B.dtype)
    db1 = jnp.sum(dH.astype(jnp.float32), axis=0).astype(b1.dtype)
    dPe = dH.astype(Pe.dtype) if has_pe else None
    return (_match_vma(A, dA), _match_vma(B, dB), _match_vma(Pe, dPe),
            _match_vma(b1, db1), None, None, None, None)


slab_edge_message_aggregate.defvjp(_slab_fwd, _slab_bwd)
