"""The full L4 training engine running under data- or edge-parallel
``shard_map`` — the composition of ``train/loop.py`` (scheduler, eval,
checkpointing, fold CV, scanned epochs) with the parallel layer
(``parallel/dp.py`` / ``parallel/ep.py`` step semantics).

The reference has no distributed training at all (SURVEY §2.3); the
step-level trainers in dp.py/ep.py prove the SPMD numerics (grad-exact
vs a single device), and this subclass makes them *drivable*: the CLI's
``--parallel {dp,ep}`` constructs a :class:`ParallelTrainer` whose
``fit``/``evaluate``/checkpoint/scan-epoch machinery is inherited
unchanged from :class:`~gsn_tpu.train.loop.Trainer` while every jitted
step runs under ``shard_map`` over the mesh:

- **dp**: each global batch of ``batch_size`` graphs is round-robin
  split into one padded shard per device (exactly
  ``parallel/dp.py make_global_batch``); BatchNorm statistics psum over
  the axis and the *global* graph-weighted loss is differentiated, so
  the parameter trajectory matches the single-device trainer on the same
  batches up to float reassociation.
- **ep**: each single-device batch is node-block partitioned with
  ``make_ep_batch`` (receivers local, senders exchanged once per layer);
  pooling/BN psum inside the model and the loss is replicated.

Multi-process execution (``distributed=True``): the same shard_map
programs run over the cluster-global mesh; each process materializes
only its own devices' shards (``make_global_batch_from_local``) and
epoch scanning is disabled (batches are assembled as global
``jax.Array``s per step).  Rank-0 gating of checkpoint/log writes stays
in the CLI.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from gsn_tpu.graphs.batching import epoch_caps
from gsn_tpu.graphs.container import GraphBatch, batch_graphs
from gsn_tpu.train.loop import Trainer, TrainerConfig
from .ep import _unvary_graph_level, make_ep_batch
from .mesh import make_mesh


def _mask_off(shard: GraphBatch) -> GraphBatch:
    """All-padding view of a shard (dummy shards of a tail batch whose
    graph count isn't divisible by the device count): every mask False,
    so BN stats, pooling, loss and metrics see zero real elements."""
    return dataclasses.replace(
        shard,
        node_mask=np.zeros_like(np.asarray(shard.node_mask)),
        edge_mask=np.zeros_like(np.asarray(shard.edge_mask)),
        graph_mask=np.zeros_like(np.asarray(shard.graph_mask)))


class ParallelTrainer(Trainer):
    """Trainer whose jitted steps run under shard_map over ``mesh``.

    Drop-in for :class:`Trainer`: ``init_state`` takes the same
    single-device example batch, and ``fit``/``evaluate``/``train_epoch``
    keep their signatures — batch construction and the step functions are
    the only overridden pieces.
    """

    def __init__(self, model_cfg, tcfg: TrainerConfig,
                 graphs_train: List[Dict], mesh: Optional[Mesh] = None,
                 mode: str = "dp", model=None, distributed: bool = False):
        if mode not in ("dp", "ep"):
            raise ValueError(f"parallel mode {mode!r} (want 'dp'|'ep')")
        self.mode = mode
        self.axis = mode
        if mesh is None:
            mesh = make_mesh(axis_names=(self.axis,))
        self.mesh = mesh
        self.n_devices = mesh.shape[self.axis]
        self.distributed = distributed
        if distributed:
            # epoch scanning stacks host batches; under multi-process
            # feeding every batch is a global jax.Array assembled from
            # process-local rows, dispatched per step
            tcfg = dataclasses.replace(tcfg, scan_epochs=False)
        if model is None and hasattr(model_cfg, "bn_axis_name"):
            # cross-replica/shard BN statistics (SURVEY §7 "BN + DP")
            model_cfg = dataclasses.replace(
                model_cfg.finalize(), bn_axis_name=self.axis,
                _finalized=True)
        super().__init__(model_cfg, tcfg, graphs_train, model=model)

        D = self.n_devices
        if self.mode == "dp":
            # per-device shard capacities: worst case over any
            # ceil(batch_size/D)-graph shard (round-robin split)
            self.shard_bs = -(-tcfg.batch_size // D)
            self.shard_caps = epoch_caps(graphs_train, self.shard_bs)
            if distributed and self.mxu_layout is not None:
                # the adaptive sender window must be uniform across the
                # WHOLE mesh; a process only sees its own shards, so the
                # kernel layout is disabled under multi-process feeding
                self.mxu_layout = None
        else:
            # edge partitioning needs the node cap divisible by D
            if self.caps is not None:
                n, e, g = self.caps
                self.caps = (-(-n // D) * D, e, g)
            self._ep_ecap = 0   # high-water per-shard edge cap (bounds
            #                     the number of compiled shapes)
        self._flow = getattr(self.model_cfg, "flow", "source_to_target")
        g0 = graphs_train[0]
        ids = g0.get("identifiers")
        self._ids_on_edges = (
            ids is not None
            and ids.shape[0] == g0["edge_index"].shape[1]
            and ids.shape[0] != g0["x"].shape[0])

        shard, rep = P(self.axis), P()
        stacked = P(None, self.axis)     # [T, D, ...] scan stacks
        self._jit_train_step = jax.jit(shard_map(
            self._par_train_step, mesh=mesh,
            in_specs=(rep, shard, rep, rep), out_specs=(rep, rep)))
        self._jit_eval_step = jax.jit(shard_map(
            self._par_eval_step, mesh=mesh,
            in_specs=(rep, shard), out_specs=rep))
        self._jit_train_scan = jax.jit(shard_map(
            self._par_train_scan, mesh=mesh,
            in_specs=(rep, stacked, rep, rep, rep),
            out_specs=(rep, rep)))
        self._jit_eval_scan = jax.jit(shard_map(
            self._par_eval_scan, mesh=mesh,
            in_specs=(rep, stacked), out_specs=rep))

    # ------------------------------------------------------------------
    # local (inside-shard_map) step plumbing
    # ------------------------------------------------------------------
    def _local_data(self, data: GraphBatch) -> GraphBatch:
        """Strip the (locally size-1) device axis; EP additionally
        re-marks tiled graph-level arrays as provably replicated."""
        data = jax.tree_util.tree_map(lambda x: x[0], data)
        if self.mode == "ep":
            data = _unvary_graph_level(data, self.axis)
        return data

    def _fold_step_key(self, key):
        if self.mode == "dp":
            # decorrelated dropout per shard; EP does NOT fold here —
            # graph-level dropout acts on replicated pooled features and
            # must agree across shards (node-level dropout decorrelates
            # inside the model via NodeDropout(ep_axis))
            return jax.random.fold_in(key, jax.lax.axis_index(self.axis))
        return key

    def _par_train_step(self, state, data, lr, key):
        return self._train_step(state, self._local_data(data), lr,
                                self._fold_step_key(key))

    def _par_eval_step(self, state, data):
        return self._eval_step(state, self._local_data(data))

    def _par_train_scan(self, state, stacked, idxs, lr, keys):
        def body(st, xs):
            idx, key = xs
            data = jax.tree_util.tree_map(lambda a: a[idx], stacked)
            return self._train_step(st, self._local_data(data), lr,
                                    self._fold_step_key(key))

        return jax.lax.scan(body, state, (idxs, keys))

    def _par_eval_scan(self, state, stacked):
        def body(carry, data):
            return carry, self._eval_step(state, self._local_data(data))

        _, outs = jax.lax.scan(body, 0, stacked)
        return outs

    # ------------------------------------------------------------------
    # loss / metric hooks (called inside shard_map)
    # ------------------------------------------------------------------
    def _step_loss(self, y_hat, data: GraphBatch):
        loss = self.loss_fn(y_hat, data.y, data.graph_mask)
        if self.mode == "dp":
            # global graph-weighted mean, psum'd INSIDE the
            # differentiated fn (cross-replica BN couples the shards —
            # parallel/dp.py)
            n = jnp.sum(data.graph_mask).astype(jnp.float32)
            total = jnp.maximum(jax.lax.psum(n, self.axis), 1.0)
            return jax.lax.psum(loss * n, self.axis) / total
        # ep: pooling psums make the per-device loss already global and
        # replicated; express it as the explicit cross-device mean so the
        # replicated-param transpose's psum of D identical grad copies
        # divides back out (parallel/ep.py:_global_loss)
        try:
            loss = jax.lax.pvary(loss, (self.axis,))
        except (AttributeError, ValueError):
            pass
        return jax.lax.psum(loss, self.axis) / self.n_devices

    def _eval_counts(self, y_hat, data: GraphBatch):
        num, acc_sum = super()._eval_counts(y_hat, data)
        if self.mode == "dp":
            num = jax.lax.psum(num, self.axis)
            acc_sum = jax.lax.psum(acc_sum, self.axis)
        # ep: graph-level arrays are replicated — the local count IS the
        # global count (a psum would multiply by D)
        return num, acc_sum

    def _eval_pack(self, y_hat, data: GraphBatch):
        pack = super()._eval_pack(y_hat, data)
        if self.mode == "dp":
            # replicate every device's rows so the host-side evaluator
            # (ROC-AUC concat) works identically in multi-process runs.
            # all_gather output is value-replicated but vma-varying; a
            # pmax of the identical copies proves the replication to the
            # checker (the parallel/ep.py _unvary_graph_level idiom)
            def rep(a):
                g = jax.lax.all_gather(a, self.axis)
                if g.dtype == jnp.bool_:
                    return jax.lax.pmax(g.astype(jnp.int8), self.axis) > 0
                return jax.lax.pmax(g, self.axis)

            pack = jax.tree_util.tree_map(rep, pack)
        return pack

    # ------------------------------------------------------------------
    # batch construction
    # ------------------------------------------------------------------
    def _train_batches(self, graphs: List[Dict]) -> List[GraphBatch]:
        if self.mode == "ep":
            return [self._ep_ify(b) for b in super()._train_batches(graphs)]
        order = np.arange(len(graphs))
        if self.tcfg.shuffle:
            self.rng.shuffle(order)
        bs = self.tcfg.batch_size
        return [self._dp_stack([graphs[j] for j in order[i:i + bs]],
                               self.shard_caps)
                for i in range(0, len(order), bs)]

    def _eval_batches(self, graphs: List[Dict],
                      n_iters: Optional[int]) -> List[GraphBatch]:
        if self.mode == "ep":
            return [self._ep_ify(b)
                    for b in super()._eval_batches(graphs, n_iters)]
        caps = tuple(max(a, b) for a, b in zip(
            self.shard_caps, epoch_caps(graphs, self.shard_bs)))
        bs = self.tcfg.batch_size
        batches = []
        for it_idx, i in enumerate(range(0, len(graphs), bs)):
            if n_iters is not None and it_idx >= n_iters:
                break
            batches.append(self._dp_stack(graphs[i:i + bs], caps))
        return batches

    # ---- dp ----------------------------------------------------------
    def _build_shards(self, per_dev, template, caps, mxu_layout):
        shards = []
        for chunk in per_dev:
            shards.append(batch_graphs(
                chunk or [template], *caps, y_shape=self.y_shape,
                y_dtype=self.y_dtype, mxu_layout=mxu_layout))
        return shards

    def _dp_stack(self, chunk: List[Dict], caps) -> GraphBatch:
        """Round-robin ``chunk`` into one padded shard per device and
        stack on a leading device axis (multi-process: assemble only this
        process's rows into a global jax.Array)."""
        D = self.n_devices
        per_dev = [chunk[d::D] for d in range(D)]
        dummy = [not pd for pd in per_dev]
        mxu = self.mxu_layout if not any(dummy) else None

        if self.distributed:
            from .distributed import _local_rows, make_global_batch_from_local
            row0, L = _local_rows(self.mesh, self.axis)
            shards = self._build_shards(per_dev[row0:row0 + L], chunk[0],
                                        caps, None)
            shards = [_mask_off(s) if dummy[row0 + d] else s
                      for d, s in enumerate(shards)]
            local = jax.tree_util.tree_map(
                lambda *xs: np.stack(xs, 0), *shards)
            return make_global_batch_from_local(local, self.mesh,
                                                self.axis, D)

        shards = self._build_shards(per_dev, chunk[0], caps, mxu)
        if mxu is not None:
            # ONE SPMD program runs all shards: static metadata (s_s,
            # block_e ladder) must agree.  Adaptive build first; if only
            # the sender window differs, rebuild the narrow shards with
            # the max; any other mismatch (or a failed shard) falls back
            # to the plain path for this batch.
            def uniform(ss):
                return (len({self._batch_sig(s) for s in ss}) == 1
                        and ss[0].seg_mode == "slab")

            if not uniform(shards):
                if all(s.seg_mode == "slab" for s in shards):
                    smax = max(s.seg_s_s for s in shards)
                    forced = dict(mxu, s_s=smax)
                    shards = self._build_shards(per_dev, chunk[0], caps,
                                                forced)
                if not uniform(shards):
                    shards = self._build_shards(per_dev, chunk[0], caps,
                                                None)
        shards = [_mask_off(s) if dummy[d] else s
                  for d, s in enumerate(shards)]
        return jax.tree_util.tree_map(lambda *xs: np.stack(xs, 0),
                                      *shards)

    # ---- ep ----------------------------------------------------------
    def _ep_ify(self, data: GraphBatch) -> GraphBatch:
        ep = make_ep_batch(
            data, self.n_devices, flow=self._flow, axis=self.axis,
            ids_on_edges=(self._ids_on_edges
                          if data.identifiers is not None else None),
            mxu_layout=self.mxu_layout,
            e_cap=self._ep_ecap or None)
        self._ep_ecap = max(self._ep_ecap, ep.edge_index.shape[-1])
        if self.distributed:
            from .distributed import shard_stacked_batch
            ep = shard_stacked_batch(ep, self.mesh, self.axis)
        return ep
