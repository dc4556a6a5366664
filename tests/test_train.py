"""Training-engine tests: synthetic learnable task, metrics oracles,
scheduler semantics, checkpoint round-trip."""

import os

import jax
import numpy as np
import pytest

from gsn_tpu.config import GSNConfig
from gsn_tpu.data.encoding import encode
from gsn_tpu.data.pipeline import generate_dataset
from gsn_tpu.graphs.batching import iterate_batches
from gsn_tpu.graphs.patterns import cycle_graph, complete_graph, path_graph
from gsn_tpu.train.loop import Trainer, TrainerConfig
from gsn_tpu.train.metrics import roc_auc_score
from gsn_tpu.train.optim import ReduceLROnPlateau, StepLR


def make_synthetic_dataset(n_per_class=30, seed=0):
    """Class 0: a triangle + path tail; class 1: a 4-cycle + path tail.
    Trivially separable by triangle counts -> GSN must reach 100%."""
    rng = np.random.RandomState(seed)
    graphs = []
    for label, cyc in [(0, 3), (1, 4)]:
        for _ in range(n_per_class):
            tail = rng.randint(1, 4)
            edges = list(cycle_graph(cyc))
            nxt = cyc
            attach = 0
            for _ in range(tail):
                edges.append((attach, nxt))
                attach = nxt
                nxt += 1
            und = {(min(u, v), max(u, v)) for u, v in edges}
            both = sorted([(u, v) for u, v in und]
                          + [(v, u) for u, v in und])
            n = nxt
            graphs.append({
                "x": np.ones((n, 1), dtype=np.float32),
                "edge_index": np.array(both, dtype=np.int64).T,
                "y": np.int64(label),
            })
    rng.shuffle(graphs)
    return graphs


@pytest.fixture(scope="module")
def synthetic_prepared():
    graphs = make_synthetic_dataset()
    vocab = [cycle_graph(3), cycle_graph(4)]
    graphs, sizes = generate_dataset(graphs, vocab, id_scope="global",
                                     induced=False)
    graphs, _eid, d_id, _ed, _dd = encode(graphs, "one_hot_unique")
    return graphs, d_id


def test_gsn_learns_synthetic_cycles(synthetic_prepared):
    graphs, d_id = synthetic_prepared
    train, test = graphs[:48], graphs[48:]
    cfg = GSNConfig(
        model_name="GSN_sparse", num_layers=2, d_out=16, out_features=2,
        msg_kind="general", id_scope="global",
        id_embedding="one_hot_encoder", bn=True, readout="sum",
        in_features=1, d_in_id=d_id)
    tcfg = TrainerConfig(lr=0.01, num_epochs=30, batch_size=16,
                         scheduler="None", eval_frequency=29)
    trainer = Trainer(cfg, tcfg, train)
    example = next(iterate_batches(train, tcfg.batch_size,
                                   caps=trainer.caps))
    state = trainer.init_state(example, seed=0)
    state, hist = trainer.fit(state, train, test, log_fn=None)
    assert hist["test_accs"][-1] >= 0.95, hist["test_accs"]


def test_roc_auc_matches_closed_form():
    y = np.array([0, 0, 1, 1])
    s = np.array([0.1, 0.4, 0.35, 0.8])
    # sklearn value for this classic example is 0.75
    assert abs(roc_auc_score(y, s) - 0.75) < 1e-9
    # perfect / inverted
    assert roc_auc_score(np.array([0, 1]), np.array([0.0, 1.0])) == 1.0
    assert roc_auc_score(np.array([1, 0]), np.array([0.0, 1.0])) == 0.0
    # ties average to 0.5
    assert abs(roc_auc_score(np.array([0, 1]),
                             np.array([0.5, 0.5])) - 0.5) < 1e-9
    # NaN labels ignored
    assert abs(roc_auc_score(np.array([0.0, 1.0, np.nan]),
                             np.array([0.0, 1.0, 0.7])) - 1.0) < 1e-9


def test_steplr_schedule():
    s = StepLR(base_lr=1.0, decay_steps=2, decay_rate=0.5)
    lrs = [s.lr]
    for _ in range(4):
        s.step()
        lrs.append(s.lr)
    assert lrs == [1.0, 1.0, 0.5, 0.5, 0.25]


def test_plateau_schedule():
    s = ReduceLROnPlateau(base_lr=1.0, decay_rate=0.1, patience=1)
    s.step(1.0)      # best=1.0
    s.step(1.0)      # bad 1
    assert s.lr == 1.0
    s.step(1.0)      # bad 2 > patience -> decay
    assert abs(s.lr - 0.1) < 1e-12
    s.step(0.5)      # new best resets
    s.step(0.4)
    assert abs(s.lr - 0.1) < 1e-12


def test_checkpoint_roundtrip(tmp_path, synthetic_prepared):
    from gsn_tpu.train.checkpoint import load_checkpoint, save_checkpoint
    graphs, d_id = synthetic_prepared
    cfg = GSNConfig(model_name="GSN_sparse", num_layers=1, d_out=8,
                    out_features=2, in_features=1, d_in_id=d_id,
                    id_scope="global")
    tcfg = TrainerConfig(lr=0.01, num_epochs=2, batch_size=8)
    trainer = Trainer(cfg, tcfg, graphs)
    example = next(iterate_batches(graphs, 8, caps=trainer.caps))
    state = trainer.init_state(example)
    state, _ = trainer.train_epoch(state, graphs[:16])
    path = os.path.join(tmp_path, "ckpt.pkl")
    save_checkpoint(path, state, trainer.scheduler)

    state2 = trainer.init_state(example, seed=42)
    state2, start_epoch = load_checkpoint(path, state2, trainer.scheduler)
    assert start_epoch == 2
    import jax
    for a, b in zip(jax.tree_util.tree_leaves(state.params),
                    jax.tree_util.tree_leaves(state2.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_f1_and_mae():
    from gsn_tpu.train.metrics import binary_f1_score, mean_absolute_error
    yt = np.array([1, 1, 0, 0, 1])
    yp = np.array([1, 0, 0, 1, 1])
    # tp=2 fp=1 fn=1 -> f1 = 4/(4+2) = 2/3
    assert abs(binary_f1_score(yt, yp) - 2 / 3) < 1e-9
    assert binary_f1_score(np.zeros(3), np.zeros(3)) == 0.0
    assert abs(mean_absolute_error([1.0, 2.0], [1.5, 1.0]) - 0.75) < 1e-9


def test_scan_epochs_match_loop(synthetic_prepared):
    """One-dispatch scanned epochs must be numerically identical to the
    per-batch dispatch loop (same batches, same rng draws, same Adam
    trajectory)."""
    import jax

    graphs, d_id = synthetic_prepared
    train = graphs[:48]
    cfg = GSNConfig(
        model_name="GSN_sparse", num_layers=2, d_out=16, out_features=2,
        msg_kind="general", id_scope="global", bn=True, bn_mlp=False,
        readout="sum", in_features=1, d_in_id=d_id)

    states = []
    for scan in (True, False):
        tcfg = TrainerConfig(lr=0.01, batch_size=16, num_epochs=3,
                             scheduler="None", seed=3, scan_epochs=scan)
        trainer = Trainer(cfg, tcfg, train)
        data = next(iterate_batches(train, 16, caps=trainer.caps))
        state = trainer.init_state(data, seed=0)
        for _ in range(3):
            state, _ = trainer.train_epoch(state, train)
        loss, acc = trainer.evaluate(state, train)
        states.append((state, loss, acc))

    (s_scan, l_scan, a_scan), (s_loop, l_loop, a_loop) = states
    for a, b in zip(jax.tree_util.tree_leaves(s_scan.params),
                    jax.tree_util.tree_leaves(s_loop.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-6)
    assert l_scan == pytest.approx(l_loop, rel=1e-6)
    assert a_scan == pytest.approx(a_loop, rel=1e-6)


def test_trainer_use_mxu_slab_matches_plain(synthetic_prepared):
    """TrainerConfig(use_mxu_segment_sum=True) routes batches through
    the slab kernel layout (the CLI --use_mxu path); losses must match
    the plain-XLA trainer step to float tolerance."""
    graphs, d_id = synthetic_prepared
    cfg = GSNConfig(
        model_name="GSN_sparse", num_layers=2, d_out=16, out_features=2,
        msg_kind="general", id_scope="global",
        id_embedding="one_hot_encoder", bn=True, readout="sum",
        in_features=1, d_in_id=d_id)
    common = dict(lr=0.01, num_epochs=2, batch_size=16,
                  scheduler="None", eval_frequency=1, caps_mode="worst",
                  shuffle=False)
    t_plain = Trainer(cfg, TrainerConfig(**common), graphs)
    t_slab = Trainer(cfg, TrainerConfig(use_mxu_segment_sum=True,
                                        **common), graphs)
    assert t_slab.mxu_layout["mode"] == "slab"

    ex_p = next(iterate_batches(graphs, 16, caps=t_plain.caps))
    ex_s = next(iterate_batches(graphs, 16, caps=t_slab.caps,
                                mxu_layout=t_slab.mxu_layout))
    assert ex_s.seg_mode == "slab"
    state_p = t_plain.init_state(ex_p, seed=0)
    state_s = t_slab.init_state(ex_s, seed=0)
    # single-step loss is float-exact across the layouts; whole loss
    # TRAJECTORIES are not comparable (Adam turns 1e-5 gradient noise
    # into lr-sized sign flips on near-zero leaves — see CLAUDE.md)
    key = jax.random.PRNGKey(0)
    _, loss_p = t_plain._jit_train_step(state_p, ex_p, 1e-3, key)
    _, loss_s = t_slab._jit_train_step(state_s, ex_s, 1e-3, key)
    np.testing.assert_allclose(float(loss_s), float(loss_p), rtol=2e-5)
    # and the slab-layout trainer must still learn the synthetic task
    ss, hist_s = t_slab.fit(state_s, graphs[:48], graphs[48:],
                            log_fn=None)
    assert np.isfinite(hist_s["train_losses"]).all()
