"""Data-parallel tests on the 8-device virtual CPU mesh: the DP train
step must match single-device training numerically (cross-replica BN +
psum-averaged grads make the math identical to one big batch)."""

import dataclasses

import jax
import numpy as np
import pytest

from gsn_tpu.config import GSNConfig
from gsn_tpu.data.encoding import encode
from gsn_tpu.data.pipeline import generate_dataset
from gsn_tpu.graphs.batching import iterate_batches
from gsn_tpu.graphs.patterns import cycle_graph
from gsn_tpu.parallel import DataParallelTrainer, make_global_batch, make_mesh
from gsn_tpu.train.loop import Trainer, TrainerConfig

from test_train import make_synthetic_dataset


@pytest.fixture(scope="module")
def prepared():
    graphs = make_synthetic_dataset(n_per_class=16)
    vocab = [cycle_graph(3), cycle_graph(4)]
    graphs, _ = generate_dataset(graphs, vocab, id_scope="global")
    graphs, _eid, d_id, _ed, _dd = encode(graphs, "one_hot_unique")
    return graphs, d_id


def _cfg(d_id):
    return GSNConfig(model_name="GSN_sparse", num_layers=2, d_out=16,
                     out_features=2, msg_kind="general", id_scope="global",
                     bn=True, in_features=1, d_in_id=d_id)


def test_mesh_has_8_devices():
    assert len(jax.devices()) == 8


def test_dp_step_runs_and_improves(prepared):
    graphs, d_id = prepared
    mesh = make_mesh(8)
    dpt = DataParallelTrainer(_cfg(d_id), mesh, lr=0.01)

    gb = make_global_batch(graphs[:32], 8, node_cap=128, edge_cap=256,
                           graph_cap=8)
    state = dpt.init_state(gb, seed=0)
    losses = []
    for step in range(20):
        state, loss = dpt.train_step(state, gb, 0.01,
                                     jax.random.PRNGKey(step))
        losses.append(float(loss))
    assert losses[-1] < losses[0] * 0.5, losses


def test_dp_grads_match_single_device(prepared):
    """One DP step on 8 shards == one single-device step on the union
    batch (cross-replica BN makes stats identical)."""
    graphs, d_id = prepared
    cfg = _cfg(d_id)
    mesh = make_mesh(8)
    dpt = DataParallelTrainer(cfg, mesh, lr=0.01)
    batch_graphs_list = graphs[:16]

    gb = make_global_batch(batch_graphs_list, 8, node_cap=64,
                           edge_cap=128, graph_cap=8)
    state = dpt.init_state(gb, seed=0)

    # single-device trainer with identical init
    tcfg = TrainerConfig(lr=0.01, batch_size=16, scheduler="None",
                         shuffle=False)
    trainer = Trainer(cfg, tcfg, batch_graphs_list)
    single = next(iterate_batches(batch_graphs_list, 16,
                                  caps=(512, 1024, 16)))
    sstate = trainer.init_state(single, seed=0)
    # share params: copy DP init into single state
    sstate = dataclasses.replace(sstate, params=state.params,
                                 batch_stats=state.batch_stats)

    key = jax.random.PRNGKey(7)
    state2, dp_loss = dpt.train_step(state, gb, 0.01, key)
    sstate2, s_loss = trainer._jit_train_step(sstate, single, 0.01, key)
    np.testing.assert_allclose(float(dp_loss), float(s_loss), rtol=2e-4)

    # compare GRADIENTS (post-Adam params amplify float noise to +/-lr on
    # analytically-zero-grad leaves such as BN-absorbed biases)
    dp_grads = dpt.grads(state, gb)

    def s_loss_fn(params):
        out, _ = trainer.model.apply(
            {"params": params, "batch_stats": state.batch_stats}, single,
            train=True, mutable=["batch_stats"])
        return trainer.loss_fn(out, single.y, single.graph_mask)

    s_grads = jax.grad(s_loss_fn)(state.params)
    scale = max(float(np.max(np.abs(np.asarray(leaf))))
                for leaf in jax.tree_util.tree_leaves(s_grads))
    for a, b in zip(jax.tree_util.tree_leaves(dp_grads),
                    jax.tree_util.tree_leaves(s_grads)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-4 * scale, rtol=1e-3)
