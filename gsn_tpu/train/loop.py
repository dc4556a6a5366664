"""Training / evaluation engine.

TPU-native counterpart of reference ``train_test_funcs.py``: jitted
train/eval steps over padded batches, Adam + StepLR/Plateau scheduling,
periodic eval + checkpointing, lr-floor early stop, OGB-evaluator-style
metrics, and partial-epoch iteration (num_iters wrap-around).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import core, struct

from gsn_tpu.graphs.batching import (epoch_caps, infer_y_spec,
                                     iterate_batches, tight_epoch_caps)
from gsn_tpu.graphs.container import GraphBatch
from gsn_tpu.nn.models import build_model
from .metrics import LOSSES, PREDICTION_FNS, roc_auc_score
from .optim import make_optimizer, make_scheduler


@struct.dataclass
class TrainState:
    params: core.FrozenDict
    batch_stats: core.FrozenDict
    opt_state: Any
    epoch: int = 0


@dataclasses.dataclass
class TrainerConfig:
    lr: float = 0.01
    regularization: float = 0.0           # Adam weight_decay
    scheduler: str = "StepLR"
    decay_steps: int = 50
    decay_rate: float = 0.5
    patience: int = 20
    min_lr: float = 0.0
    batch_size: int = 16
    num_epochs: int = 300
    num_iters: Optional[int] = None       # partial epochs (wrap-around)
    num_iters_test: Optional[int] = None
    eval_frequency: int = 1
    loss_fn: str = "CrossEntropyLoss"
    prediction_fn: str = "multi_class_accuracy"
    evaluator: Optional[str] = None       # None | 'rocauc'
    seed: int = 0
    shuffle: bool = True
    caps_mode: str = "worst"   # 'worst' = one shape forever; 'tight' =
    #                            per-epoch bucketed caps (skewed datasets)
    # Pallas kernel edge layout: False = plain XLA; True / "slab" = the
    # slab layout (the only kernel layout since r4)
    use_mxu_segment_sum: object = False
    scan_epochs: bool = True   # run each epoch as ONE lax.scan dispatch
    #   (contiguous same-shape batch runs).  Small-graph workloads are
    #   dispatch-latency-bound on TPU (~100 ms/RPC through the remote
    #   tunnel vs ~1 ms device time per step); scanning an epoch turns
    #   O(iters) round-trips into O(1) with identical numerics.


class Trainer:
    """Owns the jitted steps + python-side scheduler/checkpoint state."""

    def __init__(self, model_cfg, tcfg: TrainerConfig,
                 graphs_train: List[Dict], model=None):
        self.model_cfg = (model_cfg.finalize()
                          if hasattr(model_cfg, "finalize") else model_cfg)
        self.tcfg = tcfg
        self.model = model if model is not None \
            else build_model(self.model_cfg)
        self.loss_fn = LOSSES[tcfg.loss_fn]
        self.pred_fn = PREDICTION_FNS.get(tcfg.prediction_fn)
        self.tx = make_optimizer(tcfg.lr, tcfg.regularization)
        self.scheduler = make_scheduler(
            tcfg.scheduler, tcfg.lr, tcfg.decay_steps, tcfg.decay_rate,
            tcfg.patience)
        self.caps = (epoch_caps(graphs_train, tcfg.batch_size)
                     if tcfg.caps_mode == "worst" else None)
        self.y_shape, self.y_dtype = infer_y_spec(graphs_train)
        # use_mxu_segment_sum: True -> "slab" (PERFORMANCE.md)
        self.mxu_layout = None
        if tcfg.use_mxu_segment_sum:
            mode = ("slab" if tcfg.use_mxu_segment_sum is True
                    else str(tcfg.use_mxu_segment_sum))
            self.mxu_layout = {
                "mode": mode,
                "flow": (self.model_cfg.flow
                         if hasattr(self.model_cfg, "flow")
                         else "source_to_target"),
                "block_n": 128 if mode == "slab" else 256,
                "block_e": 256}
        self.rng = np.random.RandomState(tcfg.seed)
        self._jit_train_step = jax.jit(self._train_step)
        self._jit_eval_step = jax.jit(self._eval_step)
        self._jit_train_scan = jax.jit(self._train_scan)
        self._jit_eval_scan = jax.jit(self._eval_scan)
        self._eval_plans: Dict = {}

    # ------------------------------------------------------------------
    def init_state(self, example: GraphBatch, seed: int = 0) -> TrainState:
        rngs = {"params": jax.random.PRNGKey(seed),
                "dropout": jax.random.PRNGKey(seed + 1),
                "random_features": jax.random.PRNGKey(seed + 2)}
        variables = self.model.init(rngs, example, train=False)
        params = variables["params"]
        batch_stats = variables.get("batch_stats", core.FrozenDict())
        opt_state = self.tx.init(params)
        return TrainState(params=params, batch_stats=batch_stats,
                          opt_state=opt_state, epoch=0)

    # ------------------------------------------------------------------
    def _apply(self, params, batch_stats, data, train, rngs):
        variables = {"params": params, "batch_stats": batch_stats}
        if train:
            out, mutated = self.model.apply(
                variables, data, train=True, rngs=rngs,
                mutable=["batch_stats"])
            return out, mutated["batch_stats"]
        return self.model.apply(variables, data, train=False,
                                rngs=rngs), batch_stats

    def _step_loss(self, y_hat, data: GraphBatch):
        """Batch loss.  Overridden by the parallel trainer to express the
        cross-device *global* loss (psum'd inside the differentiated fn,
        see parallel/trainer.py)."""
        return self.loss_fn(y_hat, data.y, data.graph_mask)

    def _train_step(self, state: TrainState, data: GraphBatch, lr,
                    rng_key):
        rngs = {"dropout": rng_key,
                "random_features": jax.random.fold_in(rng_key, 1)}

        def loss_wrapped(params):
            y_hat, new_stats = self._apply(params, state.batch_stats, data,
                                           True, rngs)
            loss = self._step_loss(y_hat, data)
            return loss, new_stats

        (loss, new_stats), grads = jax.value_and_grad(
            loss_wrapped, has_aux=True)(state.params)
        opt_state = self._with_lr(state.opt_state, lr)
        updates, opt_state = self.tx.update(grads, opt_state, state.params)
        params = jax.tree_util.tree_map(
            lambda p, u: p + u, state.params, updates)
        return dataclasses.replace(
            state, params=params, batch_stats=new_stats,
            opt_state=opt_state), loss

    @staticmethod
    def _with_lr(opt_state, lr):
        hp = dict(opt_state.hyperparams)
        hp["learning_rate"] = jnp.asarray(lr, jnp.float32)
        return opt_state._replace(hyperparams=hp)

    def _eval_counts(self, y_hat, data: GraphBatch):
        """(num_graphs, metric_sum) of this batch — global totals under
        the parallel trainer (psum'd across devices)."""
        num = jnp.sum(data.graph_mask)
        acc_sum = (self.pred_fn(y_hat, data.y, data.graph_mask)
                   if self.pred_fn is not None else jnp.asarray(0.0))
        return num, acc_sum

    def _eval_pack(self, y_hat, data: GraphBatch):
        """(y_hat, y, graph_mask) shipped to the host for evaluator-style
        metrics (ROC-AUC on concatenated predictions).  The parallel
        trainer overrides this to all-gather the per-device rows so every
        process can compute the metric without touching remote shards."""
        return y_hat, data.y, data.graph_mask

    def _eval_step(self, state: TrainState, data: GraphBatch):
        y_hat, _ = self._apply(state.params, state.batch_stats, data,
                               False, None)
        loss = self._step_loss(y_hat, data)
        num, acc_sum = self._eval_counts(y_hat, data)
        return self._eval_pack(y_hat, data), loss, num, acc_sum

    # ---- scanned (one-dispatch) epoch variants ------------------------
    def _train_scan(self, state: TrainState, stacked: GraphBatch, idxs,
                    lr, keys):
        """Scan over iteration indices into the stacked UNIQUE batches:
        wrap-around iterations (num_iters > #batches) index the same
        slot instead of shipping duplicate arrays through the
        host->device tunnel (a measured bottleneck)."""

        def body(st, xs):
            idx, key = xs
            data = jax.tree_util.tree_map(lambda a: a[idx], stacked)
            st, loss = self._train_step(st, data, lr, key)
            return st, loss

        return jax.lax.scan(body, state, (idxs, keys))

    def _eval_scan(self, state: TrainState, stacked: GraphBatch):
        def body(carry, data):
            return carry, self._eval_step(state, data)

        _, outs = jax.lax.scan(body, 0, stacked)
        return outs

    @staticmethod
    def _batch_sig(data: GraphBatch):
        leaves, treedef = jax.tree_util.tree_flatten(data)
        return (treedef,
                tuple((tuple(l.shape), str(l.dtype)) for l in leaves))

    @staticmethod
    def _stack_batches(batches: List[GraphBatch]) -> GraphBatch:
        return jax.tree_util.tree_map(lambda *xs: np.stack(xs), *batches)

    @staticmethod
    def _host_prng_key(seed: int) -> np.ndarray:
        """jax.random.PRNGKey(seed) built host-side (the [2]uint32
        threefry key layout) — avoids one device round-trip per iter."""
        return np.array([seed >> 32, seed & 0xFFFFFFFF], np.uint32)

    @staticmethod
    def _runs(sigs):
        """Contiguous [i, j) runs of equal shape signature (scan needs a
        homogeneous batch stack; order is preserved exactly)."""
        i = 0
        while i < len(sigs):
            j = i + 1
            while j < len(sigs) and sigs[j] == sigs[i]:
                j += 1
            yield i, j
            i = j

    # ------------------------------------------------------------------
    def _train_batches(self, graphs: List[Dict]) -> List[GraphBatch]:
        """One epoch's (shuffled) train batches.  The parallel trainer
        overrides this to emit device-axis-stacked shards."""
        return list(iterate_batches(
            graphs, self.tcfg.batch_size, shuffle=self.tcfg.shuffle,
            rng=self.rng, caps=self.caps, y_shape=self.y_shape,
            y_dtype=self.y_dtype, mxu_layout=self.mxu_layout))

    def train_epoch(self, state: TrainState, graphs: List[Dict]):
        batches = self._train_batches(graphs)
        n_iters = self.tcfg.num_iters or len(batches)
        seq, keys = [], []
        k = 0
        for _ in range(n_iters):
            if k >= len(batches):
                k = 0
            seq.append(batches[k])
            k += 1
            keys.append(self._host_prng_key(
                self.rng.randint(0, 2**31 - 1)))
        losses = []
        if self.tcfg.scan_epochs:
            sigs = [self._batch_sig(b) for b in seq]
            for i, j in self._runs(sigs):
                if j - i == 1:
                    state, loss = self._jit_train_step(
                        state, seq[i], self.scheduler.lr, keys[i])
                    losses.append(float(loss))
                else:
                    uniq, idxs, slot = [], [], {}
                    for b in seq[i:j]:
                        if id(b) not in slot:
                            slot[id(b)] = len(uniq)
                            uniq.append(b)
                        idxs.append(slot[id(b)])
                    state, ls = self._jit_train_scan(
                        state, self._stack_batches(uniq),
                        np.asarray(idxs, np.int32),
                        self.scheduler.lr, np.stack(keys[i:j]))
                    losses.extend(np.asarray(ls).tolist())
        else:
            for data, key in zip(seq, keys):
                state, loss = self._jit_train_step(
                    state, data, self.scheduler.lr, key)
                losses.append(float(loss))
        state = dataclasses.replace(state, epoch=state.epoch + 1)
        return state, float(np.mean(losses)) if losses else 0.0

    def _eval_plan(self, graphs: List[Dict], n_iters: Optional[int]):
        """Eval batches are deterministic (no shuffle, fixed caps), so
        the stacked device arrays are built and transferred ONCE per
        split and reused every eval epoch — re-shipping them each epoch
        dominated eval time through the remote-device tunnel.  Keyed by
        the (live) list object; bounded to the few splits of a run."""
        key = (id(graphs), len(graphs), n_iters)
        plan = self._eval_plans.get(key)
        # the cached entry keeps a strong reference to the list, so its
        # id cannot be recycled while cached; the `is` check guards the
        # eviction race (a new list reusing an evicted entry's id)
        if plan is not None and plan[0] is graphs:
            return plan[1], plan[2]
        batches = self._eval_batches(graphs, n_iters)
        runs = []
        if self.tcfg.scan_epochs:
            sigs = [self._batch_sig(b) for b in batches]
            for i, j in self._runs(sigs):
                stacked = (jax.device_put(self._stack_batches(
                    batches[i:j])) if j - i > 1 else None)
                runs.append((i, j, stacked))
        if len(self._eval_plans) >= 8:   # bound device-resident caches
            self._eval_plans.pop(next(iter(self._eval_plans)))
        self._eval_plans[key] = (graphs, batches, runs)
        return batches, runs

    def _eval_batches(self, graphs: List[Dict],
                      n_iters: Optional[int]) -> List[GraphBatch]:
        """Deterministic eval batches for one split (overridden by the
        parallel trainer)."""
        # worst-mode caps come from the TRAIN split; a skewed eval split
        # can exceed them, so take the elementwise max with this split's
        # own tight caps (one extra compile per split, cached)
        caps = self.caps
        if caps is not None:
            tight = tight_epoch_caps(np.arange(len(graphs)), graphs,
                                     self.tcfg.batch_size)
            caps = tuple(max(a, b) for a, b in zip(caps, tight))
        batches = []
        for it_idx, data in enumerate(iterate_batches(
                graphs, self.tcfg.batch_size, shuffle=False,
                caps=caps, y_shape=self.y_shape,
                y_dtype=self.y_dtype, mxu_layout=self.mxu_layout)):
            if n_iters is not None and it_idx >= n_iters:
                break
            batches.append(data)
        return batches

    def evaluate(self, state: TrainState, graphs: List[Dict],
                 n_iters: Optional[int] = None):
        """Returns (avg_loss, avg_metric).  avg_loss weights each batch
        loss by its graph count (reference test(), :198-206); metric is
        either the sum-reduction prediction fn / |D| or the evaluator
        (ROC-AUC) on concatenated predictions."""
        batches, runs = self._eval_plan(graphs, n_iters)

        per_batch = []   # (pack, loss, num, acc_sum)
        if self.tcfg.scan_epochs:
            for i, j, stacked in runs:
                if j - i == 1:
                    per_batch.append(tuple(
                        self._jit_eval_step(state, batches[i])))
                else:
                    pack, loss, num, acc = jax.device_get(
                        self._jit_eval_scan(state, stacked))
                    for t in range(j - i):
                        per_batch.append(
                            (jax.tree_util.tree_map(lambda a: a[t], pack),
                             loss[t], num[t], acc[t]))
        else:
            for data in batches:
                per_batch.append(tuple(self._jit_eval_step(state, data)))

        total_loss = total_acc = 0.0
        total_n = 0
        y_true_all, y_pred_all = [], []
        for pack, loss, num, acc_sum in per_batch:
            n = int(num)
            total_loss += float(loss) * n
            total_acc += float(acc_sum)
            total_n += n
            if self.tcfg.evaluator is not None:
                y_hat, y, mask = (np.asarray(v) for v in pack)
                y_true_all.append(y[mask])
                y_pred_all.append(y_hat[mask])
        avg_loss = total_loss / max(total_n, 1)
        if self.tcfg.evaluator == "rocauc":
            metric = roc_auc_score(np.concatenate(y_true_all),
                                   np.concatenate(y_pred_all))
        else:
            metric = total_acc / max(total_n, 1)
        return avg_loss, metric

    # ------------------------------------------------------------------
    def fit(self, state: TrainState, graphs_train: List[Dict],
            graphs_test: List[Dict],
            graphs_val: Optional[List[Dict]] = None,
            checkpoint_file: Optional[str] = None,
            log_fn: Optional[Callable] = print,
            logger=None):
        """Full training loop (reference train(), train_test_funcs.py:48-174).

        Returns (state, history dict of per-eval losses/metrics)."""
        hist = {"train_losses": [], "train_accs": [], "test_losses": [],
                "test_accs": [], "val_losses": [], "val_accs": []}
        t = self.tcfg
        for epoch in range(state.epoch, t.num_epochs):
            state, _ = self.train_epoch(state, graphs_train)
            if not isinstance(self.scheduler, type(None)) \
                    and self.scheduler.__class__.__name__ == "StepLR":
                self.scheduler.step()

            if epoch % t.eval_frequency == 0:
                train_loss, train_acc = self.evaluate(
                    state, graphs_train, t.num_iters_test)
                test_loss, test_acc = self.evaluate(
                    state, graphs_test, t.num_iters_test)
                hist["train_losses"].append(train_loss)
                hist["train_accs"].append(train_acc)
                hist["test_losses"].append(test_loss)
                hist["test_accs"].append(test_acc)
                if graphs_val is not None:
                    val_loss, val_acc = self.evaluate(
                        state, graphs_val, t.num_iters_test)
                    hist["val_losses"].append(val_loss)
                    hist["val_accs"].append(val_acc)
                if self.scheduler.__class__.__name__ == "ReduceLROnPlateau":
                    ref = (hist["val_losses"][-1] if graphs_val is not None
                           else test_loss)
                    self.scheduler.step(ref)
                if logger is not None:
                    rec = {"train_loss": train_loss, "train_acc": train_acc,
                           "test_loss": test_loss, "test_acc": test_acc,
                           "lr": self.scheduler.lr}
                    if graphs_val is not None:
                        rec["val_loss"] = hist["val_losses"][-1]
                        rec["val_acc"] = hist["val_accs"][-1]
                    logger.log(rec, step=epoch)
                if log_fn:
                    msg = (f"Epoch: {epoch:03d}, Train: {train_acc:.4f}, "
                           f"Test: {test_acc:.4f}")
                    if graphs_val is not None:
                        msg += (f", Val: {hist['val_accs'][-1]:.4f}, "
                                f"Val Loss: {hist['val_losses'][-1]:.4f}")
                    msg += f", lr: {self.scheduler.lr:.8f}"
                    log_fn(msg)
                if checkpoint_file:
                    from .checkpoint import save_checkpoint
                    save_checkpoint(checkpoint_file, state, self.scheduler)

            if self.scheduler.lr < t.min_lr:
                break
        return state, hist
