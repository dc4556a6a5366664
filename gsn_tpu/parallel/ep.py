"""Edge-partitioned execution of the FULL GSN model.

``parallel/edge_partition.py`` proves the exchange primitives
(all-gather / ring-ppermute propagate) in isolation; this module runs
the *real* model — every layer, encoder, BN, pooling, loss, Adam —
under ``shard_map`` over mesh axis ``ep``:

- node-level arrays are block-partitioned (device d owns rows
  [d*N/D, (d+1)*N/D) of the padded disjoint union);
- edges are receiver-partitioned so the message scatter-add is entirely
  local; sender features cross the mesh once per layer as the narrow
  post-projection d_hidden-wide rows (``EdgeMessageMLP.ep_axis``);
- BN statistics psum over the axis (``MaskedBatchNorm.axis_name``) and
  pooling psums partial per-graph sums, so graph-level compute and the
  loss are replicated — numerics match the single-device model exactly
  (pinned by tests/test_ep_model.py).

The reference has no distributed execution (SURVEY §2.3); this is the
scaling layer for a batch/graph exceeding one chip's HBM.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import core
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from gsn_tpu.config import GSNConfig
from gsn_tpu.graphs.container import GraphBatch
from gsn_tpu.nn.models import build_model
from gsn_tpu.train.loop import TrainState
from gsn_tpu.train.metrics import LOSSES
from gsn_tpu.train.optim import make_optimizer


def _unvary_graph_level(data: GraphBatch, axis: str) -> GraphBatch:
    """Re-mark the tiled graph-level arrays as mesh-invariant.

    ``make_ep_batch`` replicates y/graph_mask by tiling, so they enter
    shard_map with vma={axis} even though every copy is identical; BN
    statistics over the (replicated) virtual-node rows then look varying
    and the checker cannot prove the updated batch_stats replicated.  A
    pmax of identical copies is the value itself and is
    variant->invariant, restoring the provable replication (negligible
    cost: [G]-sized arrays once per step)."""
    def inv(a):
        if a is None:
            return None
        if a.dtype == jnp.bool_:
            return jax.lax.pmax(a.astype(jnp.int8), axis) > 0
        return jax.lax.pmax(a, axis)

    return dataclasses.replace(data, y=inv(data.y),
                               graph_mask=inv(data.graph_mask))


def _shard_map_no_vma(f, **kw):
    """Checked shard_map (vma tracking on).  The Pallas kernels annotate
    their out_shapes with the union of input vma so the checker accepts
    kernel launches inside the sharded region (check_vma=False is NOT a
    workable alternative: grad-of-psum then fails the transpose-side vma
    check in jax 0.9)."""
    return shard_map(f, **kw)


def make_ep_batch(data: GraphBatch, num_devices: int,
                  flow: str = "source_to_target",
                  axis: str = "ep",
                  ids_on_edges: bool | None = None,
                  mxu_layout: Optional[Dict] = None,
                  e_cap: Optional[int] = None) -> GraphBatch:
    """Re-shape one padded GraphBatch into per-device edge-partitioned
    shards stacked on a leading device axis.

    Node-level arrays become [D, N/D, ...]; edge-level arrays are
    receiver-partitioned to [D, Ecap, ...] with ``edge_index`` rows
    (local receiver, global sender); graph-level arrays are tiled
    (replicated).  ``flow`` picks the receiver row exactly as
    ``GSNLayer`` would (reference GSN_sparse.py:125-128).

    ``mxu_layout={"mode": "slab", ...}`` additionally builds PER-SHARD
    slab-kernel metadata (split receiver/sender index spaces: local
    receivers, global senders into the all-gathered send rows) so the
    edge-partitioned step runs the Pallas fused path; on any span
    violation the metadata is dropped and the step falls back to the
    standard segment ops."""
    N = data.num_node_slots
    if N % num_devices:
        raise ValueError(f"node cap {N} not divisible by {num_devices}")
    D = num_devices
    block = N // D

    ei = np.asarray(data.edge_index)
    em = np.asarray(data.edge_mask)
    select = 0 if flow == "target_to_source" else 1
    recv_g, send_g = ei[select], ei[1 - select]

    slab = (mxu_layout is not None
            and mxu_layout.get("mode", "slab") == "slab")
    block_e = mxu_layout.get("block_e", 256) if slab else 128
    sel = [(recv_g // block == d) & em for d in range(D)]
    need = max(int(s.sum()) for s in sel)
    # optional caller-provided floor (`e_cap`): a high-water mark reused
    # across batches bounds the number of compiled per-shard shapes —
    # otherwise every shuffle's receiver skew mints a fresh XLA program
    e_cap = max(-(-need // block_e) * block_e, block_e, e_cap or 0)

    def node_part(arr):
        if arr is None:
            return None
        a = np.asarray(arr)
        return a.reshape((D, block) + a.shape[1:])

    def rep(arr):
        if arr is None:
            return None
        a = np.asarray(arr)
        return np.broadcast_to(a[None], (D,) + a.shape).copy()

    ei_local = np.zeros((D, 2, e_cap), np.int32)
    mask = np.zeros((D, e_cap), bool)
    for d in range(D):
        r = recv_g[sel[d]] - d * block
        s = send_g[sel[d]]
        # receiver-sort within the shard: the local scatter-add then
        # runs on sorted segment ids
        order = np.argsort(r, kind="stable")
        ei_local[d, 0, : len(r)] = r[order]
        ei_local[d, 1, : len(s)] = s[order]
        mask[d, : len(r)] = True

    def edge_part_sorted(arr):
        if arr is None:
            return None
        a = np.asarray(arr)
        out = np.zeros((D, e_cap) + a.shape[1:], a.dtype)
        for d in range(D):
            rows = a[sel[d]]
            order = np.argsort(recv_g[sel[d]] - d * block, kind="stable")
            out[d, : len(rows)] = rows[order]
        return out

    # per-shard slab-kernel metadata: receiver space = this shard's node
    # block (padded), sender space = the all-gathered global rows (padded)
    seg_recv_local = seg_chunks = seg_send_local = seg_in_degree = None
    seg_block_n = None
    seg_mode = None
    seg_s_s = None
    seg_kc = None
    if slab:
        from gsn_tpu.ops.pallas.slab_message import (S_R, S_S,
                                                     build_slab_metadata)
        block_n = mxu_layout.get("block_n", 128)
        pad_recv = max(-(-block // block_n), S_R) * block_n
        pad_send = max(-(-N // block_n), S_S) * block_n
        C = e_cap // block_e
        indeg = np.zeros((D, block), np.float32)
        # two passes: the adaptive sender window (meta["s_s"]) must be
        # UNIFORM across shards — one SPMD program runs all of them —
        # so rebuild any shard whose own need is narrower than the max
        metas = []
        for d in range(D):
            meta = build_slab_metadata(
                ei_local[d, 0], ei_local[d, 1], mask[d], pad_recv,
                block_n, block_e, num_send_nodes=pad_send)
            if meta is None:
                metas = None
                break
            metas.append(meta)
            indeg[d] = np.bincount(ei_local[d, 0][mask[d]],
                                   minlength=block)[:block]
        if metas is not None:
            smax = max(m["s_s"] for m in metas)
            rl = np.zeros((D, e_cap), np.int32)
            sl = np.zeros((D, e_cap), np.int32)
            fbwf = np.zeros((D, 4, C), np.int32)
            kcs = []
            ok = True
            for d in range(D):
                meta = metas[d]
                if meta["s_s"] != smax:
                    meta = build_slab_metadata(
                        ei_local[d, 0], ei_local[d, 1], mask[d],
                        pad_recv, block_n, block_e,
                        num_send_nodes=pad_send, s_s=smax)
                if meta is None:
                    ok = False
                    break
                rl[d] = meta["recv_local"]
                sl[d] = meta["send_local"]
                fbwf[d] = np.stack([meta["fb"], meta["wf"],
                                    meta["fb_comb"], meta["wf_comb"]])
                kcs.append(meta.get("kc", (None, None)))
            if ok:
                seg_recv_local, seg_send_local = rl, sl
                seg_chunks = fbwf
                seg_in_degree = indeg
                seg_block_n = block_n
                seg_mode = "slab"
                seg_s_s = smax
                # ONE SPMD program runs every shard: the combine-kernel
                # contributor cap must be the max over shards (None
                # poisons -> XLA combine everywhere)
                if all(k[0] is not None for k in kcs) \
                        and all(k[1] is not None for k in kcs):
                    seg_kc = (max(k[0] for k in kcs),
                              max(k[1] for k in kcs))

    # node- vs edge-level identifiers: same disambiguation rule as
    # batch_graphs (container.py) — row count matching edges AND not
    # matching nodes; when caps bucket to the same value the shape is
    # ambiguous and the caller must say (ids_on_edges)
    if data.identifiers is not None:
        rows = np.asarray(data.identifiers).shape[0]
        if ids_on_edges is None:
            if rows == ei.shape[1] and rows == N:
                raise ValueError(
                    "identifiers row count matches both node and edge "
                    "caps; pass ids_on_edges=True/False explicitly")
            ids_on_edges = rows == ei.shape[1] and rows != N
        id_is_edge_level = bool(ids_on_edges)
    else:
        id_is_edge_level = False
    return GraphBatch(
        x=node_part(data.x),
        edge_index=ei_local,
        batch=node_part(data.batch),
        y=rep(data.y),
        node_mask=node_part(data.node_mask),
        edge_mask=mask,
        graph_mask=rep(data.graph_mask),
        degrees=node_part(data.degrees),
        identifiers=(edge_part_sorted(data.identifiers)
                     if id_is_edge_level else node_part(data.identifiers)),
        edge_features=edge_part_sorted(data.edge_features),
        node_eig=node_part(data.node_eig),
        edge_eig=edge_part_sorted(data.edge_eig),
        seg_recv_local=seg_recv_local,
        seg_chunks=seg_chunks,
        seg_send_local=seg_send_local,
        seg_block_n=seg_block_n,
        seg_mode=seg_mode,
        seg_s_s=seg_s_s,
        seg_kc=seg_kc,
        seg_in_degree=seg_in_degree,
        ep_axis=axis,
    )


class EdgePartitionedTrainer:
    """Full train/eval steps of the real model under edge partitioning."""

    def __init__(self, model_cfg: GSNConfig, mesh: Mesh,
                 lr: float = 1e-3, weight_decay: float = 0.0,
                 loss_fn: str = "CrossEntropyLoss", axis: str = "ep"):
        self.mesh = mesh
        self.axis = axis
        self.model_cfg = dataclasses.replace(
            model_cfg.finalize(), bn_axis_name=axis, _finalized=True)
        self.model = build_model(self.model_cfg)
        self.loss_fn = LOSSES[loss_fn]
        self.tx = make_optimizer(lr, weight_decay)

        shard = P(axis)
        rep = P()
        self._train_step = jax.jit(_shard_map_no_vma(
            self._step_local, mesh=mesh,
            in_specs=(rep, shard, rep, rep), out_specs=(rep, rep)))
        self._forward = jax.jit(_shard_map_no_vma(
            self._forward_local, mesh=mesh,
            in_specs=(rep, rep, shard), out_specs=rep))

    # ------------------------------------------------------------------
    def init_state(self, ep_batch: GraphBatch, seed: int = 0) -> TrainState:
        local = jax.tree_util.tree_map(lambda x: x[0], ep_batch)
        # init single-device: ep collectives need the mesh, so init on a
        # de-partitioned view instead (param shapes are shard-invariant)
        local = dataclasses.replace(local, ep_axis=None)
        rngs = {"params": jax.random.PRNGKey(seed),
                "dropout": jax.random.PRNGKey(seed + 1),
                "random_features": jax.random.PRNGKey(seed + 2)}
        variables = self.model.init(rngs, local, train=False)
        params = variables["params"]
        batch_stats = variables.get("batch_stats", core.FrozenDict())
        return TrainState(params=params, batch_stats=batch_stats,
                          opt_state=self.tx.init(params), epoch=0)

    # ------------------------------------------------------------------
    def _forward_local(self, params, batch_stats, data: GraphBatch):
        data = jax.tree_util.tree_map(lambda x: x[0], data)
        data = _unvary_graph_level(data, self.axis)
        return self.model.apply(
            {"params": params, "batch_stats": batch_stats}, data,
            train=False)

    def forward(self, state: TrainState, ep_batch: GraphBatch):
        """Replicated [G, out] predictions."""
        return self._forward(state.params, state.batch_stats, ep_batch)

    # ------------------------------------------------------------------
    def _global_loss(self, loss):
        """Replicated per-device loss -> the same value expressed as the
        explicit cross-device mean.  Every device computes the identical
        loss redundantly (pooling psums make predictions replicated), so
        shard_map's replicated-param transpose would psum D identical
        gradient copies; averaging the D copies divides that back out —
        verified exact vs the single-device gradient
        (tests/test_ep_model.py)."""
        D = self.mesh.shape[self.axis]
        try:
            loss = jax.lax.pvary(loss, (self.axis,))
        except AttributeError:
            pass   # older jax: no varying-axes tracking
        except ValueError:
            pass   # already device-varying (e.g. via the sharded labels)
        return jax.lax.psum(loss, self.axis) / D

    # ------------------------------------------------------------------
    def _step_local(self, state: TrainState, data: GraphBatch, lr, key):
        data = jax.tree_util.tree_map(lambda x: x[0], data)
        data = _unvary_graph_level(data, self.axis)
        # The key is NOT folded by device here: graph-level dropout acts
        # on replicated pooled features, so those masks must agree across
        # shards.  NODE-level dropout (GNN_OGB dropout_features) is
        # decorrelated per shard INSIDE the model — NodeDropout folds the
        # key with lax.axis_index(ep_axis) (nn/models.py) — so
        # dropout-regularized OGB training runs edge-partitioned with iid
        # masks (tests/test_ep_model.py::test_ep_node_dropout_decorrelated).
        rngs = {"dropout": key,
                "random_features": jax.random.fold_in(key, 1)}

        def loss_wrapped(params):
            out, mutated = self.model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                data, train=True, rngs=rngs, mutable=["batch_stats"])
            # pooling psum'd inside the model -> `out` is replicated and
            # the per-device loss already equals the global loss
            loss = self._global_loss(
                self.loss_fn(out, data.y, data.graph_mask))
            return loss, mutated["batch_stats"]

        (loss, new_stats), grads = jax.value_and_grad(
            loss_wrapped, has_aux=True)(state.params)
        hp = dict(state.opt_state.hyperparams)
        hp["learning_rate"] = jnp.asarray(lr, jnp.float32)
        opt_state = state.opt_state._replace(hyperparams=hp)
        updates, opt_state = self.tx.update(grads, opt_state, state.params)
        params = jax.tree_util.tree_map(lambda p, u: p + u,
                                        state.params, updates)
        return dataclasses.replace(state, params=params,
                                   batch_stats=new_stats,
                                   opt_state=opt_state), loss

    def train_step(self, state: TrainState, ep_batch: GraphBatch, lr, key):
        return self._train_step(state, ep_batch, lr, key)

    # ------------------------------------------------------------------
    def grads(self, state: TrainState, ep_batch: GraphBatch):
        """Loss gradients (for parity tests vs the single-device model)."""

        def local(params, batch_stats, data):
            data = jax.tree_util.tree_map(lambda x: x[0], data)
            data = _unvary_graph_level(data, self.axis)

            def lw(p):
                out, _ = self.model.apply(
                    {"params": p, "batch_stats": batch_stats}, data,
                    train=True, mutable=["batch_stats"])
                return self._global_loss(
                    self.loss_fn(out, data.y, data.graph_mask))

            return jax.grad(lw)(params)

        fn = jax.jit(_shard_map_no_vma(local, mesh=self.mesh,
                                       in_specs=(P(), P(), P(self.axis)),
                                       out_specs=P()))
        return fn(state.params, state.batch_stats, ep_batch)
