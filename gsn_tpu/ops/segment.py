"""Masked segment reductions and graph pooling.

These are the TPU-native replacements for the reference's 3-D
``torch.sparse`` sum aggregation (``GSN_sparse.py:140-143``) and sparse
graph pooling (``utils_graph_learning.py:23-41``).  On TPU a sorted
segment-sum lowers to an efficient XLA scatter-add; the Pallas kernels in
``gsn_tpu.ops.pallas`` fuse the gather + message matmul + scatter for the
hot path, with these as the semantic reference.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def masked_segment_sum(
    data: jnp.ndarray,
    segment_ids: jnp.ndarray,
    num_segments: int,
    mask: Optional[jnp.ndarray] = None,
    indices_are_sorted: bool = False,
) -> jnp.ndarray:
    """Segment-sum with optional row mask (padding rows contribute 0)."""
    if mask is not None:
        data = jnp.where(mask.reshape((-1,) + (1,) * (data.ndim - 1)),
                         data, jnp.zeros_like(data))
    return jax.ops.segment_sum(
        data, segment_ids, num_segments=num_segments,
        indices_are_sorted=indices_are_sorted)


def masked_segment_mean(
    data: jnp.ndarray,
    segment_ids: jnp.ndarray,
    num_segments: int,
    mask: Optional[jnp.ndarray] = None,
    indices_are_sorted: bool = False,
) -> jnp.ndarray:
    """Mean with zero-guard on empty segments (reference
    ``degrees[degrees==0]=1`` at ``GSN_sparse.py:147``)."""
    total = masked_segment_sum(data, segment_ids, num_segments, mask,
                               indices_are_sorted)
    ones = jnp.ones(data.shape[0], dtype=data.dtype)
    denom = masked_segment_sum(ones, segment_ids, num_segments, mask,
                               indices_are_sorted)
    denom = jnp.where(denom == 0, jnp.ones_like(denom), denom)
    return total / denom.reshape((-1,) + (1,) * (data.ndim - 1))


def masked_segment_max(
    data: jnp.ndarray,
    segment_ids: jnp.ndarray,
    num_segments: int,
    mask: Optional[jnp.ndarray] = None,
    fill: float = 0.0,
) -> jnp.ndarray:
    """Max; empty segments get ``fill`` (DGL's max_nodes yields 0 on empty)."""
    if mask is not None:
        neg = jnp.full_like(data, -jnp.inf)
        data = jnp.where(mask.reshape((-1,) + (1,) * (data.ndim - 1)),
                         data, neg)
    out = jax.ops.segment_max(data, segment_ids, num_segments=num_segments)
    return jnp.where(jnp.isfinite(out), out, jnp.full_like(out, fill))


def _slab_pool_sum(x, num_graphs, pool_seg):
    from gsn_tpu.ops.pallas.slab_pool import slab_add_pool
    recv_local, fb, block_g, _counts = pool_seg
    n_pad = recv_local.shape[0]
    block_e = n_pad // fb.shape[0]
    if x.dtype != jnp.bfloat16:   # bf16 stays bf16: 1-pass one-hot dots
        x = x.astype(jnp.float32)
    x = jnp.pad(x, ((0, n_pad - x.shape[0]), (0, 0)))
    return slab_add_pool(x, recv_local, fb, num_graphs, block_g, block_e,
                         jax.default_backend() == "cpu")


def broadcast_graph_to_nodes(vn: jnp.ndarray, batch: jnp.ndarray,
                             num_nodes: int, pool_seg=None) -> jnp.ndarray:
    """``vn[batch]`` whose autodiff transpose is a slab-pool MXU matmul
    instead of XLA's serial scatter-add (the GNN_OGB virtual-node
    broadcast, reference models_graph_classification_ogb_original.py:236).
    Padding nodes get 0 on the kernel path (they are masked everywhere
    downstream)."""
    if pool_seg is None:
        return vn[batch]
    from gsn_tpu.ops.pallas.slab_pool import slab_graph_broadcast
    recv_local, fb, block_g, _counts = pool_seg
    n_pad = recv_local.shape[0]
    block_e = n_pad // fb.shape[0]
    out = slab_graph_broadcast(vn, recv_local, fb, vn.shape[0], block_g,
                               block_e, jax.default_backend() == "cpu")
    return out[:num_nodes]


def global_add_pool(x: jnp.ndarray, batch: jnp.ndarray, num_graphs: int,
                    node_mask: Optional[jnp.ndarray] = None,
                    pool_seg=None, axis_name: Optional[str] = None
                    ) -> jnp.ndarray:
    """Per-graph sum readout (reference global_add_pool_sparse).

    ``pool_seg`` = (recv_local, fb, block_g, counts) host-built metadata
    routes through the Pallas one-hot MXU kernel (padding nodes carry
    recv_local == -1, so no mask multiply is needed).

    ``axis_name``: under edge-partitioned shard_map, each device holds a
    node block; partial per-graph sums are psum'd over the axis so every
    device returns the full (replicated) readout."""
    if pool_seg is not None:
        return _slab_pool_sum(x, num_graphs, pool_seg)
    out = masked_segment_sum(x, batch, num_graphs, node_mask,
                             indices_are_sorted=True)
    if axis_name is not None:
        out = jax.lax.psum(out, axis_name)
    return out


def global_mean_pool(x: jnp.ndarray, batch: jnp.ndarray, num_graphs: int,
                     node_mask: Optional[jnp.ndarray] = None,
                     pool_seg=None, axis_name: Optional[str] = None
                     ) -> jnp.ndarray:
    """Per-graph mean readout with empty-graph zero-guard (reference
    global_mean_pool_sparse, ``utils_graph_learning.py:32-41``)."""
    if pool_seg is not None:
        total = _slab_pool_sum(x, num_graphs, pool_seg)
        counts = pool_seg[3][:num_graphs]
        denom = jnp.where(counts == 0, 1.0, counts)
        return total / denom[:, None]
    if axis_name is not None:
        total = masked_segment_sum(x, batch, num_graphs, node_mask,
                                   indices_are_sorted=True)
        total = jax.lax.psum(total, axis_name)
        ones = jnp.ones(x.shape[0], dtype=x.dtype)
        counts = masked_segment_sum(ones, batch, num_graphs, node_mask,
                                    indices_are_sorted=True)
        counts = jax.lax.psum(counts, axis_name)
        denom = jnp.where(counts == 0, jnp.ones_like(counts), counts)
        return total / denom[:, None]
    return masked_segment_mean(x, batch, num_graphs, node_mask,
                               indices_are_sorted=True)
