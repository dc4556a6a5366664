"""Accumulating slab-combine kernel.

Every slab kernel ends by reducing per-chunk slabs over their block rows
(``_combine_slabs``): out[b] = Σ {slabs[t, j] : key[t] + j == b}.  The
XLA expression (one-hot assign matmul on a rank-3 rhs) is correct but
pays a physical retiling copy of the whole slab array (~0.2 ms per
combine on the molhiv shape) plus the dot's second read.

This kernel reduces directly: grid ``(num_blocks,)``, one step per
output block, with the block's ≤``kc`` contributing slab blocks bound
as ``kc`` separate input refs (the B-window pattern) so their DMAs
pipeline.  The contributors of ``b`` are the chunks ``t`` with
``key[t] ∈ (b-span, b]`` — a contiguous range of the key-sorted chunk
order (argsort at trace time; receiver-side ``key = fb`` is already
sorted, sender-side ``wf`` generally is not).  ``kc`` (max contributors
over blocks, quantized) is a per-batch STATIC like the sender window
``s_s``, computed by ``build_slab_metadata``; empty chunks carry
sentinel keys there so they never count.  ``kc=None`` falls back to the
XLA combine.

Invalid slots (``k >= cnt(b)``) clamp their index map to the last valid
contributor — Mosaic skips the duplicate DMA — and the body masks the
add.  (A first revision ran a ``(num_blocks, kc)`` grid accumulating
into a revisited output block; the ~4x more, serially-dependent tiny
steps measured SLOWER than the XLA combine.  One step per output block
with unrolled refs is the fast shape.)
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG = -1.0e30    # finite -inf sentinel (slab_minmax.NEG)


def _lift(arr, i):
    """Promote grid index ``i`` to ``arr``'s varying mesh axes (the
    slab_message._at trick) so dynamic indexing type-checks inside a
    checked shard_map."""
    try:
        vma = jax.typeof(arr).vma
    except Exception:
        vma = None
    if vma:
        i = jax.lax.pvary(i, tuple(vma))
    return i


def _contrib_tables(key, span, num_blocks):
    """(order, lo, hi, key32) trace-time contributor tables: block b's
    contributing chunks are order[lo[b]:hi[b]] (key-sorted)."""
    order = jnp.argsort(key).astype(jnp.int32)
    ks = key[order]
    b_ids = jnp.arange(num_blocks, dtype=key.dtype)
    lo = jnp.searchsorted(ks, b_ids - (span - 1)).astype(jnp.int32)
    hi = jnp.searchsorted(ks, b_ids + 1).astype(jnp.int32)
    return order, lo, hi, key.astype(jnp.int32)


def _slab_idx(k, C, span):
    def idx(b, order_r, lo_r, hi_r, key_r):
        bl = _lift(lo_r, b)
        pos = jnp.clip(jnp.minimum(lo_r[bl] + k, hi_r[bl] - 1),
                       0, C - 1)
        t = order_r[pos]
        j = jnp.clip(bl - key_r[t], 0, span - 1)
        return (t, j, 0, 0)

    return idx


def _sum_kernel(order_ref, lo_ref, hi_ref, key_ref, *refs, kc):
    slab_refs, out_ref = refs[:kc], refs[kc]
    b = pl.program_id(0)
    acc = None
    for k in range(kc):
        valid = (lo_ref[b] + k < hi_ref[b]).astype(jnp.float32)
        v = slab_refs[k][0, 0].astype(jnp.float32) * valid
        acc = v if acc is None else acc + v
    out_ref[0] = acc


def slab_combine_sum(slabs, key, span: int, num_blocks: int,
                     block_n: int, d: int, kc: int,
                     interpret: bool = False):
    """[C, span*Bn, d] chunk slabs -> [num_blocks*Bn, d] f32 block-row
    sums (see module docstring).  ``key`` [C] is the per-chunk first
    output block (fb_comb / wf_comb — empty chunks sentineled); need
    not be sorted."""
    C = slabs.shape[0]
    rows = slabs.reshape(C, span, block_n, d)
    order, lo, hi, key32 = _contrib_tables(key, span, num_blocks)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(num_blocks,),
        in_specs=[pl.BlockSpec((1, 1, block_n, d), _slab_idx(k, C, span))
                  for k in range(kc)],
        out_specs=pl.BlockSpec(
            (1, block_n, d),
            lambda b, *refs: (b, 0, 0)),
    )
    from .slab_message import _out_struct
    out = pl.pallas_call(
        functools.partial(_sum_kernel, kc=kc),
        grid_spec=grid_spec,
        out_shape=_out_struct((num_blocks, block_n, d), jnp.float32,
                              slabs, key),
        interpret=interpret,
    )(order, lo, hi, key32, *((rows,) * kc))
    return out.reshape(num_blocks * block_n, d)


def _mm_cnt_kernel(order_ref, lo_ref, hi_ref, key_ref, *refs, kc):
    """Single pass per output block: raw maxima and the global tie
    counts (cnt[v] = Σ_c cnt_c[v]·[max_c[v] == raw[v]]) computed
    in-register from the block's ≤kc contributors."""
    mm_refs = refs[:kc]
    cnt_refs = refs[kc:2 * kc]
    raw_out, cnt_out = refs[2 * kc], refs[2 * kc + 1]
    b = pl.program_id(0)
    mms, valids = [], []
    raw = None
    for k in range(kc):
        valid = (lo_ref[b] + k < hi_ref[b]).astype(jnp.float32)
        mm = jnp.where(valid > 0, mm_refs[k][0, 0].astype(jnp.float32),
                       NEG)
        mms.append(mm)
        valids.append(valid)
        raw = mm if raw is None else jnp.maximum(raw, mm)
    cnt = None
    for k in range(kc):
        agree = (mms[k] == raw).astype(jnp.float32) * valids[k]
        c = cnt_refs[k][0, 0].astype(jnp.float32) * agree
        cnt = c if cnt is None else cnt + c
    raw_out[0] = raw
    cnt_out[0] = cnt


def slab_combine_minmax_cnt(mm_slabs, cnt_slabs, key, span: int,
                            num_blocks: int, block_n: int, d2: int,
                            kc: int, interpret: bool = False):
    """(raw maxima [num_blocks*Bn, d2], global tie counts) — the
    accumulating-kernel version of slab_minmax._minmax_combine_cnt."""
    C = mm_slabs.shape[0]
    mm_rows = mm_slabs.reshape(C, span, block_n, d2)
    cnt_rows = cnt_slabs.reshape(C, span, block_n, d2)
    order, lo, hi, key32 = _contrib_tables(key, span, num_blocks)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(num_blocks,),
        in_specs=(
            [pl.BlockSpec((1, 1, block_n, d2), _slab_idx(k, C, span))
             for k in range(kc)]
            + [pl.BlockSpec((1, 1, block_n, d2), _slab_idx(k, C, span))
               for k in range(kc)]),
        out_specs=[
            pl.BlockSpec((1, block_n, d2), lambda b, *r: (b, 0, 0)),
            pl.BlockSpec((1, block_n, d2), lambda b, *r: (b, 0, 0)),
        ],
    )
    from .slab_message import _out_struct
    raw, cnt = pl.pallas_call(
        functools.partial(_mm_cnt_kernel, kc=kc),
        grid_spec=grid_spec,
        out_shape=[
            _out_struct((num_blocks, block_n, d2), jnp.float32,
                        mm_slabs, key),
            _out_struct((num_blocks, block_n, d2), jnp.float32,
                        cnt_slabs, key),
        ],
        interpret=interpret,
    )(order, lo, hi, key32, *((mm_rows,) * kc), *((cnt_rows,) * kc))
    return (raw.reshape(num_blocks * block_n, d2),
            cnt.reshape(num_blocks * block_n, d2))


def combine_kc(keys, span: int, num_blocks: int,
               ladder=(2, 4, 8, 16, 32)):
    """Host-side: max contributors over output blocks for one combine
    (len-span sliding-window sum of the per-first-block chunk counts),
    snapped to the quantization ladder; None when it exceeds the ladder
    (callers fall back to the XLA combine)."""
    import numpy as np
    cnt = np.bincount(np.asarray(keys, np.int64),
                      minlength=num_blocks)[:num_blocks]
    win = np.convolve(cnt, np.ones(span, np.int64))[:num_blocks]
    need = int(win.max()) if win.size else 1
    for rung in ladder:
        if rung >= need:
            return rung
    return None
