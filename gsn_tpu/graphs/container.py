"""Batched padded graph container — the TPU-native replacement for PyG's
``Data``/``Batch`` (reference ``main.py:243-258`` uses PyG disjoint-union
batching with dynamic shapes).

Design: struct-of-arrays with *static* shapes.  A batch of graphs is a
single disjoint union padded to fixed node/edge/graph capacities; boolean
masks carry the real extents.  XLA compiles one program per
(node_cap, edge_cap, graph_cap) bucket, and every op downstream
(aggregation, batch-norm, pooling, loss) is masked so padding never
contributes.

Conventions:
- ``edge_index[0]`` is the *receiver* row under the reference's default
  ``flow='target_to_source'`` (see ``GSN_sparse.py:125-128``): messages
  aggregate onto ``edge_index[select]``.
- Padding edges point at node slot 0; their messages are masked out
  before aggregation.
- Padding nodes belong to graph slot 0; their features are masked out
  before pooling.
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional

import jax.numpy as jnp
import numpy as np
from flax import struct


@struct.dataclass
class GraphBatch:
    """One padded disjoint-union batch of graphs (a JAX pytree)."""

    x: jnp.ndarray                 # [N, Dx]  node features (int or float)
    edge_index: jnp.ndarray        # [2, E]   int32
    batch: jnp.ndarray             # [N]      int32 graph id per node
    y: jnp.ndarray                 # [G, ...] labels
    node_mask: jnp.ndarray         # [N]      bool
    edge_mask: jnp.ndarray         # [E]      bool
    graph_mask: jnp.ndarray        # [G]      bool
    degrees: jnp.ndarray           # [N] or [N, Kd]
    identifiers: Optional[jnp.ndarray] = None   # [N, K] or [E, K]
    edge_features: Optional[jnp.ndarray] = None  # [E, De]
    # DGN vector fields (directional_gsn): node- and edge-level 'eig'
    node_eig: Optional[jnp.ndarray] = None      # [N, Dv]
    edge_eig: Optional[jnp.ndarray] = None      # [E, Dv]
    # slab kernel layout (gsn_tpu.ops.pallas.slab_message): recv-local
    # per edge slot and the stacked [2, C] fb/wf chunk arrays
    seg_recv_local: Optional[jnp.ndarray] = None  # [E] int32, -1 padding
    seg_chunks: Optional[jnp.ndarray] = None      # [3, C] int32:
    #                                     (chunk_nb, chunk_first, win_first)
    seg_send_local: Optional[jnp.ndarray] = None  # [E] int32 window-local
    seg_block_n: Optional[int] = struct.field(pytree_node=False,
                                              default=None)
    seg_mode: Optional[str] = struct.field(pytree_node=False,
                                           default=None)  # 'slab'
    # adaptive sender-window width in node blocks (slab mode): computed
    # per batch by build_slab_metadata; the kernel must be launched with
    # exactly this value
    seg_s_s: Optional[int] = struct.field(pytree_node=False, default=None)
    # static (kc_recv, kc_send) max-contributors-per-block pair for the
    # accumulating Pallas slab combine (ops/pallas/slab_combine.py);
    # None entries fall back to the XLA one-hot combine
    seg_kc: Optional[tuple] = struct.field(pytree_node=False,
                                           default=None)
    # host-precomputed receiver in-degree [N] float32 (constant per
    # batch; saves an on-device segment-sum in the fused kernel's
    # second-dense bias correction)
    seg_in_degree: Optional[jnp.ndarray] = None
    # slab-pool metadata (ops/pallas/slab_pool.py): node->graph one-hot
    # MXU pooling; [Np] block-local graph ids (-1 padding), [C] first
    # graph block per node chunk, [G] real node count per graph
    pool_recv_local: Optional[jnp.ndarray] = None
    pool_fb: Optional[jnp.ndarray] = None
    pool_counts: Optional[jnp.ndarray] = None
    pool_block_g: Optional[int] = struct.field(pytree_node=False,
                                               default=None)
    # edge-partitioned execution (gsn_tpu.parallel.ep): when set, this
    # batch is one shard of a node-block-partitioned global batch running
    # under shard_map over mesh axis ``ep_axis``:
    # - node-level arrays hold this device's node block only;
    # - ``edge_index[0]`` is the receiver as a block-LOCAL row id,
    #   ``edge_index[1]`` the sender as a GLOBAL node id (the partitioner
    #   already applied ``flow``);
    # - graph-level arrays are replicated; pooling psums partial
    #   per-graph sums over the axis.
    ep_axis: Optional[str] = struct.field(pytree_node=False, default=None)

    @property
    def num_node_slots(self) -> int:
        return self.x.shape[0]

    @property
    def num_edge_slots(self) -> int:
        return self.edge_index.shape[1]

    @property
    def num_graph_slots(self) -> int:
        return self.y.shape[0]

    def num_real_graphs(self) -> jnp.ndarray:
        return jnp.sum(self.graph_mask)


def _round_up(x: int, multiple: int) -> int:
    return ((x + multiple - 1) // multiple) * multiple if multiple > 1 else x


def pad_cap(n: int, multiple: int = 64) -> int:
    """Bucket capacity: next multiple (keeps lane-dim friendly sizes and
    bounds the number of XLA compilations)."""
    return max(_round_up(max(n, 1), multiple), multiple)


def batch_graphs(
    graphs: List[Dict[str, Any]],
    node_cap: Optional[int] = None,
    edge_cap: Optional[int] = None,
    graph_cap: Optional[int] = None,
    y_shape: tuple = (),
    y_dtype=np.int64,
    mxu_layout: Optional[Dict[str, Any]] = None,
) -> GraphBatch:
    """Disjoint-union a list of numpy graph dicts into one padded batch.

    Each graph dict has keys: ``x`` [n, Dx], ``edge_index`` [2, e],
    ``degrees`` [n] or [n, Kd], ``y``, and optionally ``identifiers``
    ([n, K] for vertex scope / [e, K] for edge scope) and
    ``edge_features`` [e, De].
    """
    n_tot = sum(g["x"].shape[0] for g in graphs)
    e_tot = sum(g["edge_index"].shape[1] for g in graphs)
    node_cap = node_cap or pad_cap(n_tot)
    edge_cap = edge_cap or pad_cap(e_tot)
    graph_cap = graph_cap or pad_cap(len(graphs), 8)
    if n_tot > node_cap or e_tot > edge_cap or len(graphs) > graph_cap:
        raise ValueError(
            f"batch exceeds caps: nodes {n_tot}/{node_cap}, "
            f"edges {e_tot}/{edge_cap}, graphs {len(graphs)}/{graph_cap}")

    def _slim(dt):
        """int64 categorical/count arrays travel as int32: every integer
        feature here is a small vocabulary index or a degree, and the
        host->device transfer (through the remote tunnel) is a measured
        bottleneck for epoch-scanned training."""
        dt = np.dtype(dt)
        return np.int32 if dt == np.int64 else dt

    g0 = graphs[0]
    dx = g0["x"].shape[1:] if g0["x"].ndim > 1 else ()
    x = np.zeros((node_cap,) + dx, dtype=_slim(g0["x"].dtype))
    edge_index = np.zeros((2, edge_cap), dtype=np.int32)
    batch_vec = np.zeros(node_cap, dtype=np.int32)
    node_mask = np.zeros(node_cap, dtype=bool)
    edge_mask = np.zeros(edge_cap, dtype=bool)
    graph_mask = np.zeros(graph_cap, dtype=bool)

    deg_shape = g0["degrees"].shape[1:] if g0["degrees"].ndim > 1 else ()
    degrees = np.zeros((node_cap,) + deg_shape,
                       dtype=_slim(g0["degrees"].dtype))

    has_ids = "identifiers" in g0 and g0["identifiers"] is not None
    has_ef = "edge_features" in g0 and g0["edge_features"] is not None
    if has_ids:
        k = g0["identifiers"].shape[1]
        id_on_edges = g0["identifiers"].shape[0] == g0["edge_index"].shape[1] \
            and g0["identifiers"].shape[0] != g0["x"].shape[0]
        # ambiguous when n == e for the first graph; disambiguate via flag
        id_on_edges = bool(g0.get("ids_on_edges", id_on_edges))
        id_rows = edge_cap if id_on_edges else node_cap
        identifiers = np.zeros((id_rows, k),
                               dtype=_slim(g0["identifiers"].dtype))
    else:
        identifiers = None
    if has_ef:
        ef_shape = g0["edge_features"].shape[1:]
        edge_features = np.zeros((edge_cap,) + ef_shape,
                                 dtype=_slim(g0["edge_features"].dtype))
    else:
        edge_features = None

    y = np.zeros((graph_cap,) + y_shape, dtype=y_dtype)

    has_neig = "node_eig" in g0 and g0["node_eig"] is not None
    has_eeig = "edge_eig" in g0 and g0["edge_eig"] is not None
    node_eig = (np.zeros((node_cap, g0["node_eig"].shape[1]), np.float32)
                if has_neig else None)
    edge_eig = (np.zeros((edge_cap, g0["edge_eig"].shape[1]), np.float32)
                if has_eeig else None)

    n_off, e_off = 0, 0
    for gi, g in enumerate(graphs):
        n, e = g["x"].shape[0], g["edge_index"].shape[1]
        x[n_off:n_off + n] = g["x"]
        edge_index[:, e_off:e_off + e] = g["edge_index"] + n_off
        batch_vec[n_off:n_off + n] = gi
        node_mask[n_off:n_off + n] = True
        edge_mask[e_off:e_off + e] = True
        graph_mask[gi] = True
        degrees[n_off:n_off + n] = g["degrees"]
        if has_ids:
            ids = g["identifiers"]
            if id_on_edges:
                identifiers[e_off:e_off + e] = ids
            else:
                identifiers[n_off:n_off + n] = ids
        if has_ef:
            edge_features[e_off:e_off + e] = g["edge_features"]
        if has_neig:
            node_eig[n_off:n_off + n] = g["node_eig"]
        if has_eeig:
            edge_eig[e_off:e_off + e] = g["edge_eig"]
        yg = np.asarray(g["y"])
        y[gi] = yg.reshape(y_shape) if y_shape else yg.reshape(())
        n_off += n
        e_off += e

    seg_recv_local = seg_chunks = seg_send_local = None
    seg_mode = None
    seg_in_degree = None
    seg_s_s = None
    seg_kc = None
    if mxu_layout is not None:
        seg_mode = mxu_layout.get("mode", "slab")
        if seg_mode != "slab":
            raise ValueError(f"unknown kernel layout mode {seg_mode!r} "
                             "(the v1 'aligned' layout was retired in "
                             "favor of the strictly-better slab layout)")
        edge_ids = identifiers if (has_ids and id_on_edges) else None
        kw = {k: v for k, v in mxu_layout.items() if k != "mode"}
        (edge_index, edge_mask, edge_features, edge_ids,
         seg_recv_local, seg_chunks, seg_send_local, seg_s_s,
         edge_eig, seg_kc) = _apply_slab_layout(
            edge_index, edge_mask, edge_features, edge_ids,
            node_cap, edge_eig=edge_eig, **kw)
        if seg_recv_local is None:
            import logging
            logging.getLogger("gsn_tpu").warning(
                "%s-layout metadata did not build for this batch "
                "(receiver/sender spans exceed the kernel's limits); "
                "falling back to the plain XLA aggregation path",
                seg_mode)
            seg_mode = None
        else:
            sel = (0 if mxu_layout.get("flow", "source_to_target")
                   == "target_to_source" else 1)
            seg_in_degree = np.bincount(
                edge_index[sel][edge_mask],
                minlength=node_cap).astype(np.float32)
        if has_ids and id_on_edges:
            identifiers = edge_ids

    pool_recv_local = pool_fb = pool_counts = None
    pool_block_g = None
    if mxu_layout is not None and seg_mode is not None:
        from gsn_tpu.ops.pallas.slab_pool import build_pool_metadata
        pmeta = build_pool_metadata(batch_vec, node_mask, graph_cap)
        if pmeta is not None:
            pool_recv_local = pmeta["recv_local"]
            pool_fb = pmeta["fb"]
            pool_block_g = pmeta["block_g"]
            pool_counts = np.bincount(
                batch_vec[node_mask],
                minlength=graph_cap).astype(np.float32)

    # Arrays stay HOST-side numpy: one per-array device_put through the
    # remote tunnel costs ~45 ms of latency, and a batch has ~9 arrays
    # (a measured 12 s/epoch tax when batches were device-converted
    # here).  jit/scan dispatch transfers each batch in ONE rpc instead.
    return GraphBatch(
        x=np.asarray(x),
        edge_index=np.asarray(edge_index),
        batch=np.asarray(batch_vec),
        y=np.asarray(y),
        node_mask=np.asarray(node_mask),
        edge_mask=np.asarray(edge_mask),
        graph_mask=np.asarray(graph_mask),
        degrees=np.asarray(degrees),
        identifiers=np.asarray(identifiers) if has_ids else None,
        edge_features=np.asarray(edge_features) if has_ef else None,
        node_eig=np.asarray(node_eig) if has_neig else None,
        edge_eig=np.asarray(edge_eig) if has_eeig else None,
        seg_recv_local=(np.asarray(seg_recv_local)
                        if seg_recv_local is not None else None),
        seg_chunks=(np.asarray(seg_chunks)
                    if seg_chunks is not None else None),
        seg_send_local=(np.asarray(seg_send_local)
                        if seg_send_local is not None else None),
        seg_block_n=(mxu_layout.get("block_n", 128)
                     if seg_mode is not None else None),
        seg_mode=seg_mode,
        seg_s_s=seg_s_s if seg_mode == "slab" else None,
        seg_kc=(tuple(seg_kc) if seg_mode == "slab" and seg_kc is not None
                else None),
        seg_in_degree=(np.asarray(seg_in_degree)
                       if seg_in_degree is not None else None),
        pool_recv_local=(np.asarray(pool_recv_local)
                         if pool_recv_local is not None else None),
        pool_fb=np.asarray(pool_fb) if pool_fb is not None else None,
        pool_counts=(np.asarray(pool_counts)
                     if pool_counts is not None else None),
        pool_block_g=pool_block_g,
    )


def _apply_slab_layout(edge_index, edge_mask, edge_features, edge_ids,
                       node_cap, flow="source_to_target",
                       block_n=128, block_e=256, edge_eig=None,
                       s_s=None):
    """Slab-mode metadata (ops/pallas/slab_message.py): edges stay dense,
    just recv-sorted; per-chunk fb/wf + local indices.  Returns all-None
    metadata when spans are violated (callers fall back)."""
    from gsn_tpu.ops.pallas.slab_message import S_S, build_slab_metadata

    select = 0 if flow == "target_to_source" else 1
    recv = edge_index[select].astype(np.int64)
    real = np.nonzero(edge_mask)[0]
    order = real[np.argsort(recv[real], kind="stable")]
    E = edge_index.shape[1]
    sort_perm = np.concatenate([order, np.setdiff1d(np.arange(E), real)])
    edge_index = edge_index[:, sort_perm]
    edge_mask = edge_mask[sort_perm]
    if edge_features is not None:
        edge_features = edge_features[sort_perm]
    if edge_ids is not None:
        edge_ids = edge_ids[sort_perm]
    if edge_eig is not None:
        edge_eig = edge_eig[sort_perm]

    # pad edges to a chunk multiple
    pad = (-E) % block_e
    if pad:
        edge_index = np.pad(edge_index, ((0, 0), (0, pad)))
        edge_mask = np.pad(edge_mask, (0, pad))
        if edge_features is not None:
            edge_features = np.pad(
                edge_features, ((0, pad),) + ((0, 0),)
                * (edge_features.ndim - 1))
        if edge_ids is not None:
            edge_ids = np.pad(edge_ids, ((0, pad), (0, 0)))
        if edge_eig is not None:
            edge_eig = np.pad(edge_eig, ((0, pad), (0, 0)))

    padded_nodes = max(-(-node_cap // block_n), S_S) * block_n
    # sparse batches (low average degree) can make a 256-edge chunk's
    # receivers straddle 3 node blocks; halving the chunk halves the id
    # range per chunk, so retry with smaller block_e before giving up
    # (edge arrays are padded to the ORIGINAL block_e multiple, which
    # every smaller power-of-two divides)
    meta = None
    # dedup'd ladder; retries must divide the padded edge count (edges
    # were padded to the ORIGINAL block_e multiple above)
    ladder = dict.fromkeys(
        b for b in (block_e, 128, 64)
        if b <= block_e and (block_e * max(E // block_e, 1)) % b == 0)
    for be in ladder:
        meta = build_slab_metadata(
            edge_index[select], edge_index[1 - select], edge_mask,
            padded_nodes, block_n, be, s_s=s_s)
        if meta is not None:
            break
    if meta is None:
        return (edge_index, edge_mask, edge_features, edge_ids,
                None, None, None, None, edge_eig, None)
    seg_chunks = np.stack([meta["fb"], meta["wf"],
                           meta["fb_comb"], meta["wf_comb"]])
    return (edge_index, edge_mask, edge_features, edge_ids,
            meta["recv_local"], seg_chunks, meta["send_local"],
            meta["s_s"], edge_eig, meta.get("kc"))
