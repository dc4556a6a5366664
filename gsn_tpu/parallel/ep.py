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


def make_ep_batch(data: GraphBatch, num_devices: int,
                  flow: str = "source_to_target",
                  axis: str = "ep",
                  ids_on_edges: bool | None = None) -> GraphBatch:
    """Re-shape one padded GraphBatch into per-device edge-partitioned
    shards stacked on a leading device axis.

    Node-level arrays become [D, N/D, ...]; edge-level arrays are
    receiver-partitioned to [D, Ecap, ...] with ``edge_index`` rows
    (local receiver, global sender); graph-level arrays are tiled
    (replicated).  ``flow`` picks the receiver row exactly as
    ``GSNLayer`` would (reference GSN_sparse.py:125-128)."""
    N = data.num_node_slots
    if N % num_devices:
        raise ValueError(f"node cap {N} not divisible by {num_devices}")
    D = num_devices
    block = N // D

    ei = np.asarray(data.edge_index)
    em = np.asarray(data.edge_mask)
    select = 0 if flow == "target_to_source" else 1
    recv_g, send_g = ei[select], ei[1 - select]

    sel = [(recv_g // block == d) & em for d in range(D)]
    e_cap = max(int(s.sum()) for s in sel)
    e_cap = max(((e_cap + 127) // 128) * 128, 128)

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
        self._train_step = jax.jit(shard_map(
            self._step_local, mesh=mesh,
            in_specs=(rep, shard, rep, rep), out_specs=(rep, rep)))
        self._forward = jax.jit(shard_map(
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
        # NB: key is NOT folded by device — graph-level dropout acts on
        # replicated pooled features, so masks must agree across shards.
        # Known limitation: NODE-level dropout (GNN_OGB dropout_features)
        # therefore draws the same mask pattern in every node block
        # (correlated across shards).  Exact only for dropout == 0; use
        # DP or single-device for dropout-regularized OGB training.
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

            def lw(p):
                out, _ = self.model.apply(
                    {"params": p, "batch_stats": batch_stats}, data,
                    train=True, mutable=["batch_stats"])
                return self._global_loss(
                    self.loss_fn(out, data.y, data.graph_mask))

            return jax.grad(lw)(params)

        fn = jax.jit(shard_map(local, mesh=self.mesh,
                               in_specs=(P(), P(), P(self.axis)),
                               out_specs=P()))
        return fn(state.params, state.batch_stats, ep_batch)
