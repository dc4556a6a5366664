"""The CLI-drivable parallel trainer (gsn_tpu/parallel/trainer.py): the
full L4 engine (scan-epochs, eval plans, scheduler) running under
dp/ep shard_map must reproduce the single-device Trainer's numerics.

Post-Adam *parameter* trajectories are chaotic on zero-gradient leaves
(update ≈ lr·sign(noise), see CLAUDE.md), so the pinned quantities are
per-epoch training losses from identical states, evaluate() outputs,
and metric trajectories — not raw params after several Adam steps.
"""

import dataclasses

import jax
import numpy as np
import pytest

from gsn_tpu.config import GSNConfig
from gsn_tpu.data.encoding import encode
from gsn_tpu.data.pipeline import generate_dataset
from gsn_tpu.graphs.batching import iterate_batches
from gsn_tpu.graphs.patterns import cycle_graph
from gsn_tpu.parallel.mesh import make_mesh
from gsn_tpu.parallel.trainer import ParallelTrainer
from gsn_tpu.train.loop import Trainer, TrainerConfig

from test_train import make_synthetic_dataset


@pytest.fixture(scope="module")
def prepared():
    # 36 graphs so batch_size=8 leaves a 4-graph tail batch: on the
    # 8-device dp mesh that exercises the dummy-shard masking
    graphs = make_synthetic_dataset(n_per_class=18)
    vocab = [cycle_graph(3), cycle_graph(4)]
    graphs, _ = generate_dataset(graphs, vocab, id_scope="global")
    graphs, _eid, d_id, _ed, _dd = encode(graphs, "one_hot_unique")
    return graphs, d_id


def _cfg(d_id):
    return GSNConfig(model_name="GSN_sparse", num_layers=2, d_out=16,
                     out_features=2, msg_kind="general", id_scope="global",
                     bn=True, in_features=1, d_in_id=d_id)


def _tcfg(**kw):
    base = dict(lr=0.01, batch_size=8, scheduler="StepLR", num_epochs=2,
                seed=0, shuffle=False)
    base.update(kw)
    return TrainerConfig(**base)


def _pair(prepared, mode, n_dev, **tkw):
    graphs, d_id = prepared
    train = graphs[:28]
    cfg = _cfg(d_id)
    single = Trainer(cfg, _tcfg(**tkw), train)
    mesh = make_mesh(n_dev, axis_names=(mode,))
    par = ParallelTrainer(cfg, _tcfg(**tkw), train, mesh=mesh, mode=mode)
    ex = next(iterate_batches(train, 8))
    s_single = single.init_state(ex, seed=0)
    s_par = par.init_state(ex, seed=0)
    # identical init params by construction (same example, same seed)
    for a, b in zip(jax.tree_util.tree_leaves(s_single.params),
                    jax.tree_util.tree_leaves(s_par.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    return train, single, par, s_single, s_par


def test_dp_epoch_matches_single_device(prepared):
    train, single, par, ss, sp = _pair(prepared, "dp", 8)
    _, loss_s = single.train_epoch(ss, train)
    _, loss_p = par.train_epoch(sp, train)
    np.testing.assert_allclose(loss_p, loss_s, rtol=1e-4)

    l_s, m_s = single.evaluate(ss, train)
    l_p, m_p = par.evaluate(sp, train)
    np.testing.assert_allclose(l_p, l_s, rtol=1e-5)
    np.testing.assert_allclose(m_p, m_s, rtol=1e-6)


def test_dp_tail_batch_dummy_shards(prepared):
    """The 4-graph tail batch on an 8-device mesh: per-step losses on
    the tail must match the single-device step exactly (masked dummy
    shards contribute nothing)."""
    train, single, par, ss, sp = _pair(prepared, "dp", 8)
    b_s = single._train_batches(train)
    b_p = par._train_batches(train)
    assert len(b_s) == len(b_p) == 4
    # tail batch: 4 real graphs in both layouts
    assert int(np.asarray(b_p[-1].graph_mask).sum()) == 4
    key = np.array([0, 7], np.uint32)
    _, l_s = single._jit_train_step(ss, b_s[-1], 0.01, key)
    _, l_p = par._jit_train_step(sp, b_p[-1], 0.01, key)
    np.testing.assert_allclose(float(l_p), float(l_s), rtol=1e-4)


def test_dp_fit_metric_trajectory(prepared):
    """Full fit() (scan epochs + scheduler + eval plans): the metric
    trajectory matches the single-device engine."""
    graphs, d_id = prepared
    train, test = graphs[:28], graphs[28:]
    _, single, par, ss, sp = _pair(prepared, "dp", 8,
                                   shuffle=True, num_epochs=3)
    ss, h_s = single.fit(ss, train, test, log_fn=None)
    sp, h_p = par.fit(sp, train, test, log_fn=None)
    np.testing.assert_allclose(h_p["test_accs"], h_s["test_accs"],
                               atol=1e-6)
    assert h_p["train_losses"][-1] < h_p["train_losses"][0]


def test_dp_rocauc_evaluator_pack(prepared):
    """BCE + ROC-AUC evaluator: the all-gathered (y_hat, y, mask) pack
    must reproduce the single-device concatenated-predictions metric."""
    graphs, d_id = prepared
    graphs_f = [dict(g, y=np.array([float(g["y"])], np.float32))
                for g in graphs]
    train = graphs_f[:28]
    cfg = dataclasses.replace(_cfg(d_id), out_features=1)
    tkw = dict(loss_fn="BCEWithLogitsLoss", prediction_fn="None",
               evaluator="rocauc")
    single = Trainer(cfg, _tcfg(**tkw), train)
    par = ParallelTrainer(cfg, _tcfg(**tkw), train,
                          mesh=make_mesh(8, axis_names=("dp",)),
                          mode="dp")
    ex = next(iterate_batches(train, 8, y_shape=(1,),
                              y_dtype=np.float32))
    ss = single.init_state(ex, seed=0)
    sp = par.init_state(ex, seed=0)
    out_s = single.evaluate(ss, train)
    out_p = par.evaluate(sp, train)
    np.testing.assert_allclose(out_p, out_s, rtol=1e-5)


def test_ep_epoch_matches_single_device(prepared):
    train, single, par, ss, sp = _pair(prepared, "ep", 4)
    _, loss_s = single.train_epoch(ss, train)
    _, loss_p = par.train_epoch(sp, train)
    np.testing.assert_allclose(loss_p, loss_s, rtol=1e-4)

    l_s, m_s = single.evaluate(ss, train)
    l_p, m_p = par.evaluate(sp, train)
    np.testing.assert_allclose(l_p, l_s, rtol=1e-5)
    np.testing.assert_allclose(m_p, m_s, rtol=1e-6)


def test_dp_slab_kernel_path(prepared):
    """DP shards carrying slab-kernel metadata (uniform sender window
    across shards) match the single-device slab path."""
    train, single, par, ss, sp = _pair(prepared, "dp", 8,
                                       use_mxu_segment_sum=True)
    b_p = par._train_batches(train)
    assert b_p[0].seg_mode == "slab", "kernel metadata did not build"
    _, loss_s = single.train_epoch(ss, train)
    _, loss_p = par.train_epoch(sp, train)
    np.testing.assert_allclose(loss_p, loss_s, rtol=1e-4)
