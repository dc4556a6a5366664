"""MXU-based sorted segment-sum (the SpMM scatter side) in Pallas.

XLA's scatter-add for edge aggregation runs at ~5% of v5e HBM peak
(measured in scripts/microbench_segment.py).  This kernel reformulates
the segment sum as a sequence of small one-hot matmuls on the MXU:

    out[nb*Bn:(nb+1)*Bn, :] += onehot(recv_chunk)ᵀ @ msg_chunk

Edges must be sorted by receiver — true by construction in
``GraphBatch`` (per-graph lexicographic edge order + monotone graph
offsets; batch padding edges are excluded via ``edge_mask``).  A
host-side layout pass places each Bn-node block's edges into whole
Be-edge chunks; the chunk count is *static* per batch bucket
(``num_blocks + ceil(E/Be) + 1``) so jit compiles once per bucket.

Grid: one program per edge chunk, sequential; consecutive chunks
targeting the same node block accumulate in VMEM (Pallas revisiting
semantics).  Scalar-prefetched arrays drive the output block index map.

The backward pass is the transposed product ``onehot @ g_block`` — the
same kernel structure reading the cotangent node block — wired up via
``jax.custom_vjp``.
"""

from __future__ import annotations

import functools
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .onehot_dot import onehot_dot, onehot_dot_t

DEFAULT_BLOCK_N = 256
DEFAULT_BLOCK_E = 512


def static_num_chunks(edge_cap: int, num_nodes: int,
                      block_n: int = DEFAULT_BLOCK_N,
                      block_e: int = DEFAULT_BLOCK_E) -> int:
    """Upper bound on chunk count for any batch in this bucket: each node
    block adds at most one partial chunk, plus one all-padding chunk."""
    return num_nodes // block_n + -(-edge_cap // block_e) + 1


def build_block_aligned_layout(
    recv: np.ndarray,
    num_nodes: int,
    block_n: int = DEFAULT_BLOCK_N,
    block_e: int = DEFAULT_BLOCK_E,
    edge_mask: Optional[np.ndarray] = None,
    num_chunks: Optional[int] = None,
) -> Dict[str, np.ndarray]:
    """Host-side layout: permutation + padding placing each node block's
    (real) edges into whole edge chunks.

    Returns arrays sized for ``num_chunks`` chunks (static per bucket):
    - ``perm``       [C*Be]: original edge index per layout slot
      (padding slots point at edge 0 and carry recv_local == -1),
    - ``recv_local`` [C*Be]: receiver minus node-block base, -1 on padding,
    - ``chunk_nb``   [C]: target node block per chunk (non-decreasing),
    - ``chunk_first``[C]: 1 where a chunk is the first of its node block,
    - ``inv_perm``   [E]: layout slot of each original edge (masked edges
      point at a padding slot, so their backward gradient is zero).
    """
    if num_nodes % block_n:
        raise ValueError("num_nodes must be a multiple of block_n")
    num_blocks = num_nodes // block_n
    recv = np.asarray(recv)
    E = len(recv)
    if edge_mask is None:
        edge_mask = np.ones(E, dtype=bool)
    real = np.nonzero(edge_mask)[0]
    recv_real = recv[real]
    if len(recv_real) > 1 and not (np.diff(recv_real) >= 0).all():
        raise ValueError("real edges must be sorted by receiver")

    starts = np.searchsorted(recv_real, np.arange(num_blocks) * block_n)
    ends = np.searchsorted(recv_real,
                           (np.arange(num_blocks) + 1) * block_n)
    counts = ends - starts
    chunks_per_block = np.maximum(1, -(-counts // block_e))

    needed = int(chunks_per_block.sum()) + 1  # +1 guaranteed padding chunk
    C = num_chunks if num_chunks is not None else needed
    if needed > C:
        raise ValueError(f"needs {needed} chunks > static budget {C}")

    E_lay = C * block_e
    perm = np.zeros(E_lay, dtype=np.int32)
    recv_local = np.full(E_lay, -1, dtype=np.int32)
    chunk_nb = np.full(C, num_blocks - 1, dtype=np.int32)
    chunk_first = np.zeros(C, dtype=np.int32)
    inv_perm = np.full(E, E_lay - 1, dtype=np.int32)  # padding slot

    c = 0
    for nb in range(num_blocks):
        n_edges = int(counts[nb])
        src = real[starts[nb]:ends[nb]]
        for j in range(int(chunks_per_block[nb])):
            lo = j * block_e
            hi = min(lo + block_e, n_edges)
            slot0 = c * block_e
            k = hi - lo
            if k > 0:
                perm[slot0: slot0 + k] = src[lo:hi]
                recv_local[slot0: slot0 + k] = (
                    recv[src[lo:hi]] - nb * block_n)
                inv_perm[src[lo:hi]] = slot0 + np.arange(k)
            chunk_nb[c] = nb
            chunk_first[c] = 1 if j == 0 else 0
            c += 1
    return {"perm": perm, "recv_local": recv_local,
            "chunk_nb": chunk_nb, "chunk_first": chunk_first,
            "inv_perm": inv_perm,
            "block_n": block_n, "block_e": block_e,
            "num_blocks": num_blocks}


# ---------------------------------------------------------------------------
# kernels
# ---------------------------------------------------------------------------

def _fwd_kernel(chunk_nb_ref, chunk_first_ref, recv_ref, msg_ref,
                out_ref, *, block_n):
    t = pl.program_id(0)
    first = chunk_first_ref[t] == 1

    recv = recv_ref[...].reshape(1, -1).astype(jnp.int32)   # [1, Be]
    rows = jax.lax.broadcasted_iota(jnp.int32, (block_n, recv.shape[1]), 0)
    # padding slots carry recv == -1 and match no row
    onehot = jnp.where(rows == recv, 1.0, 0.0).astype(jnp.float32)
    contrib = onehot_dot(onehot, msg_ref[...])

    @pl.when(first)
    def _():
        out_ref[...] = contrib

    @pl.when(jnp.logical_not(first))
    def _():
        out_ref[...] = out_ref[...] + contrib


def _bwd_kernel(chunk_nb_ref, chunk_first_ref, recv_ref, g_ref,
                dmsg_ref, *, block_n):
    # dmsg_chunk[e, :] = g_block[recv_local[e], :]  (zero when recv == -1)
    recv = recv_ref[...].reshape(1, -1).astype(jnp.int32)   # [1, Be]
    rows = jax.lax.broadcasted_iota(jnp.int32, (block_n, recv.shape[1]), 0)
    onehot = jnp.where(rows == recv, 1.0, 0.0).astype(jnp.float32)
    dmsg_ref[...] = onehot_dot_t(onehot, g_ref[...])


def _call_fwd(msgs_layout, recv_local, chunk_nb, chunk_first,
              num_nodes, block_n, block_e, interpret):
    C = chunk_nb.shape[0]
    d = msgs_layout.shape[1]
    num_blocks = num_nodes // block_n
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(C,),
        in_specs=[
            # last two block dims must be tile-divisible or equal to the
            # array dims -> recv gets a [C, 1, Be] layout
            pl.BlockSpec((1, 1, block_e), lambda t, nb, cf: (t, 0, 0)),
            pl.BlockSpec((block_e, d), lambda t, nb, cf: (t, 0)),
        ],
        out_specs=pl.BlockSpec((block_n, d),
                               lambda t, nb, cf: (nb[t], 0)),
    )
    return pl.pallas_call(
        functools.partial(_fwd_kernel, block_n=block_n),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((num_blocks * block_n, d),
                                       jnp.float32),
        interpret=interpret,
    )(chunk_nb, chunk_first, recv_local.reshape(C, 1, block_e),
      msgs_layout.astype(jnp.float32))


def _call_bwd(g, recv_local, chunk_nb, chunk_first, block_n, block_e,
              interpret):
    C = chunk_nb.shape[0]
    d = g.shape[1]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(C,),
        in_specs=[
            pl.BlockSpec((1, 1, block_e), lambda t, nb, cf: (t, 0, 0)),
            pl.BlockSpec((block_n, d), lambda t, nb, cf: (nb[t], 0)),
        ],
        out_specs=pl.BlockSpec((block_e, d), lambda t, nb, cf: (t, 0)),
    )
    return pl.pallas_call(
        functools.partial(_bwd_kernel, block_n=block_n),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((C * block_e, d), jnp.float32),
        interpret=interpret,
    )(chunk_nb, chunk_first, recv_local.reshape(C, 1, block_e), g)


# ---------------------------------------------------------------------------
# public API (differentiable)
# ---------------------------------------------------------------------------

@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8))
def mxu_segment_sum(msgs, perm, inv_perm, recv_local, chunk_nb_first,
                    num_nodes: int,
                    block_n: int = DEFAULT_BLOCK_N,
                    block_e: int = DEFAULT_BLOCK_E,
                    interpret: bool = False):
    """Differentiable sorted segment-sum over the MXU.

    ``msgs`` [E, d] in original batch order; layout arrays from
    ``build_block_aligned_layout`` (``chunk_nb_first`` is the stacked
    [2, C] of chunk_nb and chunk_first).  Returns
    [num_nodes rounded to block_n, d]; callers slice to num_nodes.
    """
    msgs_layout = jnp.take(msgs, perm, axis=0)
    return _call_fwd(msgs_layout, recv_local, chunk_nb_first[0],
                     chunk_nb_first[1], num_nodes, block_n, block_e,
                     interpret)


def _mxu_fwd(msgs, perm, inv_perm, recv_local, chunk_nb_first,
             num_nodes, block_n, block_e, interpret):
    out = mxu_segment_sum(msgs, perm, inv_perm, recv_local,
                          chunk_nb_first, num_nodes, block_n, block_e,
                          interpret)
    return out, (inv_perm, recv_local, chunk_nb_first)


def _mxu_bwd(num_nodes, block_n, block_e, interpret, res, g):
    inv_perm, recv_local, chunk_nb_first = res
    dmsg_layout = _call_bwd(g.astype(jnp.float32), recv_local,
                            chunk_nb_first[0], chunk_nb_first[1],
                            block_n, block_e, interpret)
    dmsgs = jnp.take(dmsg_layout, inv_perm, axis=0)
    return (dmsgs, None, None, None, None)


mxu_segment_sum.defvjp(_mxu_fwd, _mxu_bwd)


def segment_sum_via_mxu(msgs, layout: Dict[str, np.ndarray],
                        num_nodes: int, interpret: bool = False):
    """Convenience wrapper over numpy layout dicts (tests/benches)."""
    cnf = jnp.stack([jnp.asarray(layout["chunk_nb"]),
                     jnp.asarray(layout["chunk_first"])])
    out = mxu_segment_sum(
        msgs, jnp.asarray(layout["perm"]), jnp.asarray(layout["inv_perm"]),
        jnp.asarray(layout["recv_local"]), cnf, num_nodes,
        layout["block_n"], layout["block_e"], interpret)
    return out[:num_nodes]


# ---------------------------------------------------------------------------
# pre-aligned variant: the batcher emits edges already in layout order,
# so there is no runtime permutation at all (identity perm)
# ---------------------------------------------------------------------------

@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def mxu_segment_sum_aligned(msgs_layout, recv_local, chunk_nb_first,
                            num_nodes: int,
                            block_n: int = DEFAULT_BLOCK_N,
                            block_e: int = DEFAULT_BLOCK_E,
                            interpret: bool = False):
    """Sorted segment-sum for edge arrays already in block-aligned layout
    (see ``GraphBatch`` mxu layout).  msgs_layout: [C*Be, d]."""
    return _call_fwd(msgs_layout, recv_local, chunk_nb_first[0],
                     chunk_nb_first[1], num_nodes, block_n, block_e,
                     interpret)


def _mxu_aligned_fwd(msgs_layout, recv_local, chunk_nb_first,
                     num_nodes, block_n, block_e, interpret):
    out = mxu_segment_sum_aligned(msgs_layout, recv_local, chunk_nb_first,
                                  num_nodes, block_n, block_e, interpret)
    return out, (recv_local, chunk_nb_first)


def _mxu_aligned_bwd(num_nodes, block_n, block_e, interpret, res, g):
    recv_local, chunk_nb_first = res
    dmsg = _call_bwd(g.astype(jnp.float32), recv_local,
                     chunk_nb_first[0], chunk_nb_first[1],
                     block_n, block_e, interpret)
    return (dmsg, None, None)


mxu_segment_sum_aligned.defvjp(_mxu_aligned_fwd, _mxu_aligned_bwd)
