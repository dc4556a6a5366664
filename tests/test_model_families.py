"""Model-family coverage: GNN_OGB (virtual node, ogb msg kind, atom/bond
encoders), MLPSubstructures, GSN gin variants, degree-as-tag paths."""

import jax
import numpy as np
import pytest

from gsn_tpu.config import GSNConfig
from gsn_tpu.data.encoding import encode
from gsn_tpu.data.pipeline import generate_dataset
from gsn_tpu.graphs.batching import iterate_batches
from gsn_tpu.graphs.patterns import cycle_graph
from gsn_tpu.nn.models import build_model
from gsn_tpu.train.loop import Trainer, TrainerConfig


def ogb_like_graphs(num=24, seed=0):
    """Synthetic graphs in ogbg-molhiv format: 9 int atom features, 3 int
    bond features, float {0,1} labels with some NaNs (unlabeled)."""
    rng = np.random.RandomState(seed)
    graphs = []
    for i in range(num):
        n = rng.randint(8, 20)
        edges = {(j, j + 1) for j in range(n - 1)}
        label = float(i % 2)
        if label:
            edges |= {(0, 2), (1, 3)}
        both = sorted([(u, v) for u, v in edges]
                      + [(v, u) for u, v in edges])
        ei = np.array(both).T
        x = np.stack([rng.randint(0, d, n) for d in
                      [119, 4, 12, 12, 10, 6, 6, 2, 2]], 1).astype(np.int64)
        ef = np.stack([rng.randint(0, d, ei.shape[1]) for d in
                       [5, 6, 2]], 1).astype(np.int64)
        y = np.float32(np.nan) if i % 7 == 3 else np.float32(label)
        graphs.append({"x": x, "edge_index": ei, "edge_features": ef,
                       "y": y})
    return graphs


@pytest.fixture(scope="module")
def ogb_prepared():
    graphs = ogb_like_graphs()
    graphs, sizes = generate_dataset(
        graphs, [cycle_graph(k) for k in (3, 4, 5, 6)],
        id_scope="local", induced=True)
    graphs, _eid, d_id, _ed, _dd = encode(graphs, "one_hot_unique")
    return graphs, d_id


def test_gnn_ogb_virtual_node_forward_and_train(ogb_prepared):
    """Reference molhiv config shape: GSN_edge_sparse_ogb + vn + atom/bond
    encoders + embedding ids + ogb msg (README.md:121)."""
    graphs, d_id = ogb_prepared
    cfg = GSNConfig(
        model_name="GSN_edge_sparse_ogb", num_layers=3, d_out=32,
        out_features=1, msg_kind="ogb", id_scope="local",
        id_embedding="embedding", d_out_id_embedding=32,
        input_node_encoder="atom_encoder", edge_encoder="bond_encoder",
        input_vn_encoder="embedding", vn=True, readout="mean",
        dropout_features=0.5, final_projection=[False], jk_mlp=False,
        in_features=9, in_edge_features=3, d_in_id=d_id)
    tcfg = TrainerConfig(lr=1e-3, batch_size=8, num_epochs=2,
                         scheduler="None", loss_fn="BCEWithLogitsLoss",
                         prediction_fn="None", evaluator="rocauc")
    trainer = Trainer(cfg, tcfg, graphs)
    example = next(iterate_batches(graphs, 8, caps=trainer.caps,
                                   y_shape=(), y_dtype=np.float32))
    state = trainer.init_state(example, seed=0)
    state, hist = trainer.fit(state, graphs[:16], graphs[16:], log_fn=None)
    # NaN labels must not poison the loss
    assert np.isfinite(hist["train_losses"]).all()
    assert 0.0 <= hist["test_accs"][-1] <= 1.0  # rocauc


def test_gnn_ogb_residual_and_global_scope(ogb_prepared):
    graphs, d_id = ogb_prepared
    # re-count at vertex scope for global ids
    raw = ogb_like_graphs()
    raw, _ = generate_dataset(raw, [cycle_graph(3)], id_scope="global")
    raw, _eid, d_idg, _ed, _dd = encode(raw, "one_hot_unique")
    cfg = GSNConfig(
        model_name="GSN_edge_sparse_ogb", num_layers=2, d_out=16,
        out_features=1, msg_kind="ogb", id_scope="global",
        id_embedding="embedding", d_out_id_embedding=16,
        input_node_encoder="atom_encoder", edge_encoder="bond_encoder",
        vn=False, residual=True, in_features=9, in_edge_features=3,
        d_in_id=d_idg)
    model = build_model(cfg)
    data = next(iterate_batches(raw, 8, y_shape=(), y_dtype=np.float32))
    variables = model.init(jax.random.PRNGKey(0), data, train=False)
    out = model.apply(variables, data, train=False)
    assert out.shape == (data.num_graph_slots, 1)
    assert np.isfinite(np.asarray(out)).all()


def test_mlp_substructures_baseline(ogb_prepared):
    graphs, d_id = ogb_prepared
    cfg = GSNConfig(
        model_name="MLP", num_layers=1, d_out=32, out_features=1,
        id_scope="local", id_embedding="one_hot_encoder",
        input_node_encoder="atom_encoder", readout="sum",
        in_features=9, in_edge_features=3, d_in_id=d_id)
    model = build_model(cfg)
    data = next(iterate_batches(graphs, 8, y_shape=(),
                                y_dtype=np.float32))
    variables = model.init(jax.random.PRNGKey(0), data, train=False)
    out = model.apply(variables, data, train=False)
    assert out.shape == (data.num_graph_slots, 1)


def test_gin_msg_kind_with_degree_as_tag():
    rng = np.random.RandomState(0)
    graphs = []
    for i in range(16):
        n = rng.randint(5, 10)
        edges = [(j, j + 1) for j in range(n - 1)]
        both = sorted(edges + [(v, u) for u, v in edges])
        graphs.append({"x": np.ones((n, 1), np.float32),
                       "edge_index": np.array(both).T,
                       "y": np.int64(i % 2)})
    graphs, _ = generate_dataset(graphs, [cycle_graph(3)],
                                 id_scope="local")
    graphs, _eid, d_id, _ed, d_degree = encode(
        graphs, "one_hot_unique", "one_hot_unique")
    cfg = GSNConfig(
        model_name="GSN_sparse", num_layers=2, d_out=16, out_features=2,
        msg_kind="gin", id_scope="local", id_embedding="one_hot_encoder",
        degree_as_tag=True, retain_features=True, train_eps=True,
        degree_embedding="one_hot_encoder",
        in_features=1, d_in_id=d_id, d_degree=d_degree)
    model = build_model(cfg)
    data = next(iterate_batches(graphs, 8))
    variables = model.init(jax.random.PRNGKey(0), data, train=False)
    out = model.apply(variables, data, train=False)
    assert out.shape == (data.num_graph_slots, 2)
    # trainable eps parameter exists
    flat = jax.tree_util.tree_leaves_with_path(variables["params"])
    assert any("eps" in jax.tree_util.keystr(p) for p, _ in flat)


def test_random_features_path():
    rng = np.random.RandomState(0)
    graphs = []
    for i in range(8):
        n = 6
        edges = [(j, (j + 1) % n) for j in range(n)]
        both = sorted(edges + [(v, u) for u, v in edges])
        graphs.append({"x": np.ones((n, 1), np.float32),
                       "edge_index": np.array(both).T,
                       "y": np.int64(i % 2)})
    graphs, _ = generate_dataset(graphs, [cycle_graph(3)],
                                 id_scope="global")
    graphs, _eid, d_id, _ed, _dd = encode(graphs, "one_hot_unique")
    cfg = GSNConfig(model_name="GSN_sparse", num_layers=1, d_out=8,
                    out_features=2, id_scope="global",
                    random_features=True, in_features=1, d_in_id=d_id)
    model = build_model(cfg)
    data = next(iterate_batches(graphs, 8))
    variables = model.init(
        {"params": jax.random.PRNGKey(0),
         "random_features": jax.random.PRNGKey(1)}, data, train=False)
    o1 = model.apply(variables, data, train=False,
                     rngs={"random_features": jax.random.PRNGKey(2)})
    o2 = model.apply(variables, data, train=False,
                     rngs={"random_features": jax.random.PRNGKey(3)})
    # different random features -> different outputs
    assert not np.allclose(np.asarray(o1), np.asarray(o2))
