"""DGN (directional_gsn) tests: aggregator math vs hand-built dense
mailbox oracles, layer/model forward, synthetic learnability."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gsn_tpu.data.directional import assemble_directions, laplacian_eig
from gsn_tpu.graphs.batching import iterate_batches
from gsn_tpu.graphs.container import batch_graphs
from gsn_tpu.nn.dgn import (DGNConfig, DGNNet, compute_avg_d, dgn_aggregate,
                            dgn_scale, EPS)


def dense_oracle(name, h_src_all, vf_all, h_in, edges, num_nodes):
    """Reference-style padded-mailbox computation in numpy
    (aggregators.py:8-71)."""
    outs = np.zeros((num_nodes, h_in.shape[1]))
    for v in range(num_nodes):
        idx = [i for i, (s, d) in enumerate(edges) if d == v]
        if not idx:
            continue
        h = h_src_all[idx]                      # [deg, d]
        vf = vf_all[idx] if vf_all is not None else None
        if name == "mean":
            outs[v] = h.mean(0)
        elif name == "sum":
            outs[v] = h.sum(0)
        elif name == "max":
            outs[v] = h.max(0)
        elif name == "min":
            outs[v] = h.min(0)
        elif name == "var":
            outs[v] = np.maximum((h * h).mean(0) - h.mean(0) ** 2, 0)
        elif name == "std":
            outs[v] = np.sqrt(
                np.maximum((h * h).mean(0) - h.mean(0) ** 2, 0) + EPS)
        elif name == "dir0-av":
            w = np.abs(vf[:, 0]) / (np.abs(vf[:, 0]).sum() + EPS)
            outs[v] = (h * w[:, None]).sum(0)
        elif name == "dir0-dx":
            u = vf[:, 0] / (np.abs(vf[:, 0]).sum() + EPS)
            outs[v] = np.abs((h * u[:, None]).sum(0) - u.sum() * h_in[v])
        elif name == "dir0-dx-no-abs":
            u = vf[:, 0] / (np.abs(vf[:, 0]).sum() + EPS)
            outs[v] = (h * u[:, None]).sum(0) - u.sum() * h_in[v]
        elif name == "dir0-0.1":
            lg = 0.1 * np.abs(vf[:, 0])
            w = np.exp(lg - lg.max())
            w = w / w.sum()
            outs[v] = (h * w[:, None]).sum(0)
        else:
            raise NotImplementedError(name)
    return outs


@pytest.mark.parametrize("name", ["mean", "sum", "max", "min", "var", "std",
                                  "dir0-av", "dir0-dx", "dir0-dx-no-abs",
                                  "dir0-0.1"])
def test_aggregators_match_dense_oracle(name):
    rng = np.random.RandomState(3)
    n, d, dv = 7, 5, 2
    edges = [(s, t) for s in range(n) for t in range(n)
             if s != t and rng.rand() < 0.45]
    h_in = rng.randn(n, d).astype(np.float32)
    vf = rng.randn(len(edges), dv).astype(np.float32)
    src = np.array([e[0] for e in edges])
    dst = np.array([e[1] for e in edges])
    h_src = h_in[src]

    got = np.asarray(dgn_aggregate(
        name, jnp.asarray(h_src), jnp.asarray(vf), jnp.asarray(h_in),
        jnp.asarray(dst), n, jnp.ones(len(edges), bool)))
    want = dense_oracle(name, h_src, vf, h_in, edges, n)
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-6)


def test_scalers():
    h = jnp.ones((4, 3))
    deg = jnp.array([1.0, 2.0, 3.0, 4.0])
    avg_d = {"log": 1.1}
    out = np.asarray(dgn_scale("amplification", h, deg, avg_d))
    np.testing.assert_allclose(out[:, 0], np.log(np.arange(1, 5) + 1) / 1.1,
                               rtol=1e-6)
    out = np.asarray(dgn_scale("attenuation", h, deg, avg_d))
    np.testing.assert_allclose(out[:, 0], 1.1 / np.log(np.arange(1, 5) + 1),
                               rtol=1e-6)


def test_laplacian_eig_path_graph():
    # path graph P3: L eigenvalues 0, 1, 3
    ei = np.array([[0, 1, 1, 2], [1, 0, 2, 1]])
    vecs = laplacian_eig(ei, 3, 3)
    assert vecs.shape == (3, 3)
    # first eigenvector is constant (eigenvalue 0)
    v0 = vecs[:, 0]
    np.testing.assert_allclose(v0, v0[0], rtol=1e-5)


def _mol_like_graphs(num=40, seed=0):
    rng = np.random.RandomState(seed)
    graphs = []
    for i in range(num):
        n = rng.randint(8, 16)
        edges = {(j, j + 1) for j in range(n - 1)}
        label = i % 2
        if label:
            edges |= {(0, 2), (2, 4)}  # add triangles
        both = sorted([(u, v) for u, v in edges]
                      + [(v, u) for u, v in edges])
        ei = np.array(both).T
        x = np.zeros((n, 9), dtype=np.int64)
        x[:, 0] = rng.randint(0, 20, n)
        counts = rng.rand(ei.shape[1], 4).astype(np.float32)
        graphs.append({
            "x": x, "edge_index": ei,
            "identifiers": counts, "ids_on_edges": True,
            "degrees": np.zeros(n, np.float32),
            "y": np.float32(label),
        })
    return graphs


def test_dgn_forward_and_gradients():
    graphs = _mol_like_graphs()
    graphs = assemble_directions(graphs, directions=("eig", "subgraphs"),
                                 id_scope="local")
    avg_d = compute_avg_d(graphs)
    cfg = DGNConfig(hidden_dim=32, out_dim=32, num_layers=2,
                    aggregators=("mean", "max", "min", "dir1-dx",
                                 "dir1-av"),
                    avg_d=avg_d)
    model = DGNNet(cfg)
    data = next(iterate_batches(graphs, 16, y_shape=(), y_dtype=np.float32))
    variables = model.init(jax.random.PRNGKey(0), data, train=False)
    out = model.apply(variables, data, train=False)
    assert out.shape == (data.num_graph_slots, 1)
    assert np.isfinite(np.asarray(out)).all()

    # gradient flows
    def loss(params):
        y = model.apply({"params": params,
                         "batch_stats": variables["batch_stats"]},
                        data, train=True, rngs={"dropout":
                                                jax.random.PRNGKey(1)},
                        mutable=["batch_stats"])[0]
        return jnp.sum(y ** 2)

    g = jax.grad(loss)(variables["params"])
    norms = [float(jnp.abs(x).sum())
             for x in jax.tree_util.tree_leaves(g)]
    assert any(v > 0 for v in norms)


def test_drop_small_graphs():
    g_small = {"x": np.zeros((4, 9), np.int64),
               "edge_index": np.array([[0, 1], [1, 0]]),
               "identifiers": np.zeros((2, 1), np.float32),
               "degrees": np.zeros(4), "y": np.float32(0)}
    out = assemble_directions([g_small], directions=("subgraphs",))
    assert out == []


def test_dgn_trains_on_synthetic():
    """DGN net + Trainer end-to-end (the cli_directional path without the
    OGB download): BCE loss, ROC-AUC eval, Plateau schedule on -val ROC."""
    from gsn_tpu.train.loop import Trainer, TrainerConfig

    graphs = _mol_like_graphs(num=48, seed=1)
    graphs = assemble_directions(graphs, directions=("subgraphs",),
                                 id_scope="local")
    train, test = graphs[:32], graphs[32:]
    avg_d = compute_avg_d(train)
    cfg = DGNConfig(hidden_dim=24, out_dim=24, num_layers=2,
                    aggregators=("mean", "max", "dir1-av"),
                    avg_d=avg_d, dropout=0.0, out_features=1)
    model = DGNNet(cfg)
    tcfg = TrainerConfig(lr=5e-3, batch_size=16, num_epochs=10,
                         scheduler="ReduceLROnPlateau", patience=3,
                         loss_fn="BCEWithLogitsLoss", prediction_fn="None",
                         evaluator="rocauc", eval_frequency=9,
                         caps_mode="tight")
    trainer = Trainer(cfg, tcfg, train, model=model)
    example = next(iterate_batches(train, 16, y_shape=(),
                                   y_dtype=np.float32))
    state = trainer.init_state(example, seed=0)
    state, hist = trainer.fit(state, train, test, log_fn=None)
    # synthetic labels are determined by triangle chords: must beat chance
    assert hist["test_accs"][-1] > 0.6, hist["test_accs"]


SLAB = {"mode": "slab", "flow": "source_to_target",
        "block_n": 128, "block_e": 256}


def test_dgn_slab_kernel_matches_segment_path():
    """The one-pass weighted slab kernel (ops/pallas/slab_weighted.py)
    must match the masked-segment-op path for every weighted aggregator
    kind, forward AND gradients, on a full DGNNet."""
    graphs = _mol_like_graphs(num=48, seed=3)
    graphs = assemble_directions(graphs, directions=("eig", "subgraphs"),
                                 id_scope="local")
    avg_d = compute_avg_d(graphs)
    cfg = DGNConfig(hidden_dim=32, out_dim=32, num_layers=2,
                    aggregators=("mean", "max", "min", "sum",
                                 "dir1-av", "dir1-dx", "dir2-dx-no-abs",
                                 "dir0-0.1"),
                    avg_d=avg_d)
    model = DGNNet(cfg)
    caps = (768, 2048, 48)
    plain = next(iterate_batches(graphs, 48, caps=caps, y_shape=(),
                                 y_dtype=np.float32))
    slab = next(iterate_batches(graphs, 48, caps=caps, y_shape=(),
                                y_dtype=np.float32, mxu_layout=SLAB))
    assert slab.seg_mode == "slab"
    assert slab.node_eig is not None

    variables = model.init(jax.random.PRNGKey(0), plain, train=False)
    out_plain = np.asarray(model.apply(variables, plain, train=False))
    out_slab = np.asarray(model.apply(variables, slab, train=False))
    np.testing.assert_allclose(out_slab, out_plain, rtol=1e-3, atol=1e-4)

    def loss(params, data):
        out, _ = model.apply(
            {"params": params, "batch_stats": variables["batch_stats"]},
            data, train=True, mutable=["batch_stats"],
            rngs={"dropout": jax.random.PRNGKey(1)})
        return ((out ** 2) * data.graph_mask[:, None]).sum()

    g_plain = jax.grad(loss)(variables["params"], plain)
    g_slab = jax.grad(loss)(variables["params"], slab)
    scale = max(float(np.max(np.abs(np.asarray(x))))
                for x in jax.tree_util.tree_leaves(g_plain))
    for a, b in zip(jax.tree_util.tree_leaves(g_slab),
                    jax.tree_util.tree_leaves(g_plain)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-3, atol=5e-4 * scale)


def test_dgn_slab_edge_eig_sorted_with_layout():
    """edge-level vector fields must be re-sorted with the slab edge
    order (the layout permutes edges by receiver)."""
    graphs = _mol_like_graphs(num=24, seed=5)
    graphs = assemble_directions(graphs, directions=("subgraphs",),
                                 id_scope="local")
    caps = (384, 1024, 24)
    plain = next(iterate_batches(graphs, 24, caps=caps, y_shape=(),
                                 y_dtype=np.float32))
    slab = next(iterate_batches(graphs, 24, caps=caps, y_shape=(),
                                y_dtype=np.float32, mxu_layout=SLAB))
    assert slab.edge_eig is not None
    # per-edge (dst, src, vf) triples must be the same SET in both
    def trips(b):
        em = np.asarray(b.edge_mask)
        return sorted(map(tuple, np.concatenate(
            [np.asarray(b.edge_index).T[em],
             np.asarray(b.edge_eig)[em]], axis=1).tolist()))
    assert trips(plain) == trips(slab)


def test_dgn_bf16_close_to_f32_on_slab_path():
    """compute_dtype='bfloat16' (the bench-winning DGN variant) must
    stay bf16-close to f32 on the kernel path: loss near-equal and
    gradient direction aligned."""
    import jax.numpy as jnp

    graphs = _mol_like_graphs(num=48, seed=7)
    graphs = assemble_directions(graphs, directions=("eig", "subgraphs"),
                                 id_scope="local")
    avg_d = compute_avg_d(graphs)
    caps = (768, 2048, 48)
    slab = next(iterate_batches(graphs, 48, caps=caps, y_shape=(),
                                y_dtype=np.float32, mxu_layout=SLAB))
    assert slab.seg_mode == "slab"

    losses, grads = {}, {}
    for dt in (None, "bfloat16"):
        cfg = DGNConfig(hidden_dim=32, out_dim=32, num_layers=2,
                        aggregators=("mean", "max", "min", "dir1-av",
                                     "dir1-dx"),
                        avg_d=avg_d, dropout=0.0, compute_dtype=dt)
        model = DGNNet(cfg)
        variables = model.init(jax.random.PRNGKey(0), slab, train=False)

        def loss(params):
            out, _ = model.apply(
                {"params": params,
                 "batch_stats": variables["batch_stats"]},
                slab, train=True, mutable=["batch_stats"],
                rngs={"dropout": jax.random.PRNGKey(1)})
            return ((out ** 2) * slab.graph_mask[:, None]).sum()

        losses[dt] = float(loss(variables["params"]))
        g = jax.grad(loss)(variables["params"])
        grads[dt] = np.concatenate(
            [np.asarray(x, np.float32).ravel()
             for x in jax.tree_util.tree_leaves(g)])
    assert losses["bfloat16"] == pytest.approx(losses[None], rel=3e-2)
    a, b = grads[None], grads["bfloat16"]
    cos = float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-30))
    assert cos > 0.99, cos
