"""Data-parallel training over a device mesh.

Graphs of a global batch are packed into one padded per-device shard
each; all shard arrays are stacked on a leading device axis and sharded
over the mesh's ``dp`` axis.  The train step runs under ``shard_map``:
each device computes the forward/backward on its local shard, gradients
and the loss are ``psum``-averaged over ICI, and the (replicated)
parameters are updated identically everywhere.  Masked BatchNorm uses
cross-replica statistics via ``axis_name='dp'`` so numerics match the
reference's single-device whole-batch BN (SURVEY §7 "BN + DP").
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List

import jax
import jax.numpy as jnp
import numpy as np
from flax import core
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from gsn_tpu.config import GSNConfig
from gsn_tpu.graphs.container import GraphBatch, batch_graphs
from gsn_tpu.nn.models import build_model
from gsn_tpu.train.loop import TrainState
from gsn_tpu.train.metrics import LOSSES
from gsn_tpu.train.optim import make_optimizer


def shard_batches(shards: List[GraphBatch]) -> GraphBatch:
    """Stack per-device GraphBatches along a new leading axis."""
    return jax.tree_util.tree_map(
        lambda *xs: jnp.stack(xs, axis=0), *shards)


def make_global_batch(graphs: List[Dict], num_devices: int,
                      node_cap: int, edge_cap: int, graph_cap: int,
                      y_shape=(), y_dtype=np.int64) -> GraphBatch:
    """Round-robin graphs into per-device shards, pad each to identical
    caps, stack on the device axis."""
    per_dev: List[List[Dict]] = [[] for _ in range(num_devices)]
    for i, g in enumerate(graphs):
        per_dev[i % num_devices].append(g)
    if not all(per_dev):
        raise ValueError(
            f"need >= {num_devices} graphs per global batch, got {len(graphs)}")
    shards = [batch_graphs(chunk, node_cap, edge_cap, graph_cap,
                           y_shape=y_shape, y_dtype=y_dtype)
              for chunk in per_dev]
    return shard_batches(shards)


class DataParallelTrainer:
    """DP train/eval steps compiled once over the mesh."""

    def __init__(self, model_cfg: GSNConfig, mesh: Mesh,
                 lr: float = 1e-3, weight_decay: float = 0.0,
                 loss_fn: str = "CrossEntropyLoss"):
        self.mesh = mesh
        self.model_cfg = dataclasses.replace(
            model_cfg.finalize(), bn_axis_name="dp", _finalized=True)
        self.model = build_model(self.model_cfg)
        self.loss_fn = LOSSES[loss_fn]
        self.tx = make_optimizer(lr, weight_decay)

        batch_spec = P("dp")
        rep = P()
        self._train_step = jax.jit(shard_map(
            self._step_local, mesh=mesh,
            in_specs=(rep, batch_spec, rep, rep),
            out_specs=(rep, rep)))

    # ------------------------------------------------------------------
    def init_state(self, global_batch: GraphBatch, seed: int = 0):
        local = jax.tree_util.tree_map(lambda x: x[0], global_batch)
        rngs = {"params": jax.random.PRNGKey(seed),
                "dropout": jax.random.PRNGKey(seed + 1),
                "random_features": jax.random.PRNGKey(seed + 2)}
        variables = self.model.init(rngs, local, train=False)
        params = variables["params"]
        batch_stats = variables.get("batch_stats", core.FrozenDict())
        return TrainState(params=params, batch_stats=batch_stats,
                          opt_state=self.tx.init(params), epoch=0)

    # ------------------------------------------------------------------
    def _step_local(self, state: TrainState, data: GraphBatch, lr, key):
        # inside shard_map: data has leading dev axis of size 1 locally
        data = jax.tree_util.tree_map(lambda x: x[0], data)
        key = jax.random.fold_in(key, jax.lax.axis_index("dp"))
        rngs = {"dropout": key,
                "random_features": jax.random.fold_in(key, 1)}

        def loss_wrapped(params):
            out, mutated = self.model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                data, train=True, rngs=rngs, mutable=["batch_stats"])
            # Differentiate the *global* mean loss (psums inside the
            # differentiated fn): cross-replica BN statistics couple the
            # shards, so a local-loss gradient would miss the cross-shard
            # terms flowing through the psum'd moments.
            local_n = jnp.sum(data.graph_mask).astype(jnp.float32)
            wloss = self.loss_fn(out, data.y, data.graph_mask) * local_n
            total_n = jnp.maximum(jax.lax.psum(local_n, "dp"), 1.0)
            gloss = jax.lax.psum(wloss, "dp") / total_n
            return gloss, mutated["batch_stats"]

        (loss, new_stats), grads = jax.value_and_grad(
            loss_wrapped, has_aux=True)(state.params)
        # NB: no explicit grad psum — params are replicated inputs, so
        # shard_map's transpose already psums the per-shard contributions
        # to make the cotangent replicated (check_vma machinery)
        # batch stats were computed with cross-replica psum (bn axis_name),
        # so every replica already holds identical values
        hp = dict(state.opt_state.hyperparams)
        hp["learning_rate"] = jnp.asarray(lr, jnp.float32)
        opt_state = state.opt_state._replace(hyperparams=hp)
        updates, opt_state = self.tx.update(grads, opt_state, state.params)
        params = jax.tree_util.tree_map(lambda p, u: p + u,
                                        state.params, updates)
        return dataclasses.replace(state, params=params,
                                   batch_stats=new_stats,
                                   opt_state=opt_state), loss

    # ------------------------------------------------------------------
    def train_step(self, state: TrainState, global_batch: GraphBatch,
                   lr: float, key):
        return self._train_step(state, global_batch, lr, key)

    # ------------------------------------------------------------------
    def grads(self, state: TrainState, global_batch: GraphBatch):
        """Global-mean-loss gradients (for parity tests / inspection)."""

        def local(params, batch_stats, data):
            data = jax.tree_util.tree_map(lambda x: x[0], data)

            def lw(p):
                out, _ = self.model.apply(
                    {"params": p, "batch_stats": batch_stats}, data,
                    train=True, mutable=["batch_stats"])
                n = jnp.sum(data.graph_mask).astype(jnp.float32)
                wl = self.loss_fn(out, data.y, data.graph_mask) * n
                tn = jnp.maximum(jax.lax.psum(n, "dp"), 1.0)
                return jax.lax.psum(wl, "dp") / tn

            return jax.grad(lw)(params)

        fn = jax.jit(shard_map(local, mesh=self.mesh,
                               in_specs=(P(), P(), P("dp")),
                               out_specs=P()))
        return fn(state.params, state.batch_stats, global_batch)
