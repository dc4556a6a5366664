"""End-to-end equivalence of the MXU segment-sum path: the same model
applied to an mxu-layout batch and a plain batch must produce identical
node/graph outputs (edge order differs, node-level results must not)."""

import jax
import numpy as np
import pytest

from gsn_tpu.config import GSNConfig
from gsn_tpu.data.encoding import encode
from gsn_tpu.data.pipeline import generate_dataset
from gsn_tpu.graphs.batching import iterate_batches
from gsn_tpu.graphs.patterns import cycle_graph
from gsn_tpu.nn.models import build_model

from test_train import make_synthetic_dataset

MXU = {"flow": "source_to_target", "block_n": 256, "block_e": 256}


@pytest.fixture(scope="module")
def prepared():
    graphs = make_synthetic_dataset(n_per_class=12)
    graphs, _ = generate_dataset(graphs, [cycle_graph(3), cycle_graph(4)],
                                 id_scope="global")
    graphs, _eid, d_id, _ed, _dd = encode(graphs, "one_hot_unique")
    return graphs, d_id


@pytest.mark.parametrize("msg_kind,id_scope", [
    ("general", "global"), ("gin", "global"), ("ogb", "global")])
def test_mxu_path_matches_plain(prepared, msg_kind, id_scope):
    graphs, d_id = prepared
    cfg = GSNConfig(
        model_name="GSN_sparse", num_layers=2, d_out=16, out_features=2,
        msg_kind=msg_kind, id_scope=id_scope, bn=True,
        in_features=1, d_in_id=d_id).finalize()
    model = build_model(cfg)

    caps = (256, 512, 24)
    plain = next(iterate_batches(graphs, 24, caps=caps))
    mxu = next(iterate_batches(graphs, 24, caps=caps, mxu_layout=MXU))
    assert mxu.seg_recv_local is not None

    variables = model.init(jax.random.PRNGKey(0), plain, train=False)
    out_plain = np.asarray(model.apply(variables, plain, train=False))
    out_mxu = np.asarray(model.apply(variables, mxu, train=False))
    np.testing.assert_allclose(out_mxu, out_plain, rtol=2e-4, atol=2e-5)


def test_mxu_path_gradients_match(prepared):
    graphs, d_id = prepared
    cfg = GSNConfig(
        model_name="GSN_sparse", num_layers=2, d_out=16, out_features=2,
        msg_kind="general", id_scope="global", bn=True,
        in_features=1, d_in_id=d_id).finalize()
    model = build_model(cfg)

    caps = (256, 512, 24)
    plain = next(iterate_batches(graphs, 24, caps=caps))
    mxu = next(iterate_batches(graphs, 24, caps=caps, mxu_layout=MXU))
    variables = model.init(jax.random.PRNGKey(0), plain, train=False)

    def loss(params, data):
        out, _ = model.apply(
            {"params": params, "batch_stats": variables["batch_stats"]},
            data, train=True, mutable=["batch_stats"])
        return ((out ** 2) * data.graph_mask[:, None]).sum()

    g_plain = jax.grad(loss)(variables["params"], plain)
    g_mxu = jax.grad(loss)(variables["params"], mxu)
    # edge reordering changes float association inside BN statistics;
    # tolerance is absolute against the overall gradient scale
    scale = max(float(np.max(np.abs(np.asarray(x))))
                for x in jax.tree_util.tree_leaves(g_plain))
    for a, b in zip(jax.tree_util.tree_leaves(g_mxu),
                    jax.tree_util.tree_leaves(g_plain)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-3, atol=1e-4 * scale)


def test_mxu_edge_scope_ids_and_features(prepared):
    """Edge-scope identifiers + edge features must be re-laid
    consistently with the edge permutation."""
    graphs0 = make_synthetic_dataset(n_per_class=8)
    rng = np.random.RandomState(0)
    for g in graphs0:
        e = g["edge_index"].shape[1]
        g["edge_features"] = rng.randint(0, 3, (e, 1)).astype(np.int64)
    graphs0, _ = generate_dataset(graphs0, [cycle_graph(3)],
                                  id_scope="local")
    graphs0, _eid, d_id, _ed, _dd = encode(graphs0, "one_hot_unique")

    cfg = GSNConfig(
        model_name="GSN_edge_sparse", num_layers=1, d_out=16,
        out_features=2, msg_kind="general", id_scope="local",
        edge_encoder="one_hot_encoder", d_in_edge_encoder=[3],
        in_edge_features=1, in_features=1, d_in_id=d_id).finalize()
    model = build_model(cfg)

    caps = (256, 512, 16)
    plain = next(iterate_batches(graphs0, 16, caps=caps))
    mxu = next(iterate_batches(graphs0, 16, caps=caps, mxu_layout=MXU))
    variables = model.init(jax.random.PRNGKey(0), plain, train=False)
    out_plain = np.asarray(model.apply(variables, plain, train=False))
    out_mxu = np.asarray(model.apply(variables, mxu, train=False))
    np.testing.assert_allclose(out_mxu, out_plain, rtol=2e-4, atol=2e-5)


def test_fused_kernel_path_matches_plain(prepared):
    """bn_mlp=False + one hidden layer + relu triggers the fully-fused
    Pallas message kernel; outputs must match the plain path."""
    graphs, d_id = prepared
    cfg = GSNConfig(
        model_name="GSN_sparse", num_layers=2, d_out=16, out_features=2,
        msg_kind="general", id_scope="global", bn=True, bn_mlp=False,
        activation_mlp="relu", in_features=1, d_in_id=d_id).finalize()
    model = build_model(cfg)

    caps = (256, 512, 24)
    plain = next(iterate_batches(graphs, 24, caps=caps))
    mxu = next(iterate_batches(graphs, 24, caps=caps, mxu_layout=MXU))
    assert mxu.seg_send_local is not None  # fused eligible

    variables = model.init(jax.random.PRNGKey(0), plain, train=False)
    out_plain = np.asarray(model.apply(variables, plain, train=False))
    out_mxu = np.asarray(model.apply(variables, mxu, train=False))
    np.testing.assert_allclose(out_mxu, out_plain, rtol=2e-4, atol=2e-5)

    # gradients through the fused custom_vjp
    def loss(params, data):
        out, _ = model.apply(
            {"params": params, "batch_stats": variables["batch_stats"]},
            data, train=True, mutable=["batch_stats"])
        return ((out ** 2) * data.graph_mask[:, None]).sum()

    g_plain = jax.grad(loss)(variables["params"], plain)
    g_mxu = jax.grad(loss)(variables["params"], mxu)
    scale = max(float(np.max(np.abs(np.asarray(x))))
                for x in jax.tree_util.tree_leaves(g_plain))
    for a, b in zip(jax.tree_util.tree_leaves(g_mxu),
                    jax.tree_util.tree_leaves(g_plain)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-3, atol=1e-4 * scale)


SLAB = {"mode": "slab", "flow": "source_to_target",
        "block_n": 128, "block_e": 256}


def test_slab_mode_matches_plain(prepared):
    """mode='slab' (dense edges, slab kernel) must match the plain path
    in forward and gradients."""
    graphs, d_id = prepared
    cfg = GSNConfig(
        model_name="GSN_sparse", num_layers=2, d_out=16, out_features=2,
        msg_kind="general", id_scope="global", bn=True, bn_mlp=False,
        activation_mlp="relu", in_features=1, d_in_id=d_id).finalize()
    model = build_model(cfg)

    caps = (256, 512, 24)
    plain = next(iterate_batches(graphs, 24, caps=caps))
    slab = next(iterate_batches(graphs, 24, caps=caps, mxu_layout=SLAB))
    assert slab.seg_mode == "slab"
    # dense: no slot inflation beyond chunk rounding
    assert slab.num_edge_slots <= plain.num_edge_slots + 256

    variables = model.init(jax.random.PRNGKey(0), plain, train=False)
    out_plain = np.asarray(model.apply(variables, plain, train=False))
    out_slab = np.asarray(model.apply(variables, slab, train=False))
    np.testing.assert_allclose(out_slab, out_plain, rtol=2e-4, atol=2e-5)

    def loss(params, data):
        out, _ = model.apply(
            {"params": params, "batch_stats": variables["batch_stats"]},
            data, train=True, mutable=["batch_stats"])
        return ((out ** 2) * data.graph_mask[:, None]).sum()

    g_plain = jax.grad(loss)(variables["params"], plain)
    g_slab = jax.grad(loss)(variables["params"], slab)
    scale = max(float(np.max(np.abs(np.asarray(x))))
                for x in jax.tree_util.tree_leaves(g_plain))
    for a, b in zip(jax.tree_util.tree_leaves(g_slab),
                    jax.tree_util.tree_leaves(g_plain)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-3, atol=1e-4 * scale)


def test_slab_mode_ogb_msg_kind(prepared):
    """ogb message kind fuses through the slab kernel (A=0, B=x+id,
    Pe=edge features)."""
    graphs, d_id = prepared
    cfg = GSNConfig(
        model_name="GSN_sparse", num_layers=2, d_out=16, out_features=2,
        msg_kind="ogb", id_scope="global", bn=True,
        id_embedding="one_hot_encoder",
        in_features=1, d_in_id=d_id).finalize()
    model = build_model(cfg)

    caps = (256, 512, 24)
    plain = next(iterate_batches(graphs, 24, caps=caps))
    slab = next(iterate_batches(graphs, 24, caps=caps, mxu_layout=SLAB))
    variables = model.init(jax.random.PRNGKey(0), plain, train=False)
    out_plain = np.asarray(model.apply(variables, plain, train=False))
    out_slab = np.asarray(model.apply(variables, slab, train=False))
    np.testing.assert_allclose(out_slab, out_plain, rtol=2e-4, atol=2e-5)

    def loss(params, data):
        out, _ = model.apply(
            {"params": params, "batch_stats": variables["batch_stats"]},
            data, train=True, mutable=["batch_stats"])
        return ((out ** 2) * data.graph_mask[:, None]).sum()

    g_plain = jax.grad(loss)(variables["params"], plain)
    g_slab = jax.grad(loss)(variables["params"], slab)
    scale = max(float(np.max(np.abs(np.asarray(x))))
                for x in jax.tree_util.tree_leaves(g_plain))
    for a, b in zip(jax.tree_util.tree_leaves(g_slab),
                    jax.tree_util.tree_leaves(g_plain)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-3, atol=1e-4 * scale)


def test_slab_mode_gin_msg_kind(prepared):
    """gin messages (concat parts) aggregate part-wise through the slab
    kernel with identity activation."""
    graphs, d_id = prepared
    cfg = GSNConfig(
        model_name="GSN_sparse", num_layers=2, d_out=16, out_features=2,
        msg_kind="gin", id_scope="global", bn=True, train_eps=True,
        id_embedding="one_hot_encoder",
        in_features=1, d_in_id=d_id).finalize()
    model = build_model(cfg)

    caps = (256, 512, 24)
    plain = next(iterate_batches(graphs, 24, caps=caps))
    slab = next(iterate_batches(graphs, 24, caps=caps, mxu_layout=SLAB))
    variables = model.init(jax.random.PRNGKey(0), plain, train=False)
    out_plain = np.asarray(model.apply(variables, plain, train=False))
    out_slab = np.asarray(model.apply(variables, slab, train=False))
    np.testing.assert_allclose(out_slab, out_plain, rtol=2e-4, atol=2e-5)

    def loss(params, data):
        out, _ = model.apply(
            {"params": params, "batch_stats": variables["batch_stats"]},
            data, train=True, mutable=["batch_stats"])
        return ((out ** 2) * data.graph_mask[:, None]).sum()

    g_plain = jax.grad(loss)(variables["params"], plain)
    g_slab = jax.grad(loss)(variables["params"], slab)
    scale = max(float(np.max(np.abs(np.asarray(x))))
                for x in jax.tree_util.tree_leaves(g_plain))
    for a, b in zip(jax.tree_util.tree_leaves(g_slab),
                    jax.tree_util.tree_leaves(g_plain)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-3, atol=1e-4 * scale)


def test_slab_mode_gin_local_scope():
    """gin + edge-scope ids exercise the CentralEncoder-transformed
    edge identifiers through the slab path."""
    graphs0 = make_synthetic_dataset(n_per_class=8)
    graphs0, _ = generate_dataset(graphs0, [cycle_graph(3)],
                                  id_scope="local")
    graphs0, _eid, d_id, _ed, _dd = encode(graphs0, "one_hot_unique")
    cfg = GSNConfig(
        model_name="GSN_sparse", num_layers=1, d_out=16, out_features=2,
        msg_kind="gin", id_scope="local", bn=True,
        id_embedding="one_hot_encoder",
        in_features=1, d_in_id=d_id).finalize()
    model = build_model(cfg)

    caps = (256, 512, 16)
    plain = next(iterate_batches(graphs0, 16, caps=caps))
    slab = next(iterate_batches(graphs0, 16, caps=caps, mxu_layout=SLAB))
    variables = model.init(jax.random.PRNGKey(0), plain, train=False)
    out_plain = np.asarray(model.apply(variables, plain, train=False))
    out_slab = np.asarray(model.apply(variables, slab, train=False))
    np.testing.assert_allclose(out_slab, out_plain, rtol=2e-4, atol=2e-5)


def test_slab_mode_bn_mlp_fused(prepared):
    """bn_mlp=True (BN inside the message MLP — the reference default,
    main.py:608) rides the fused slab path via the [H, H^2] moments
    pass; forward, batch_stats updates, and substantive gradients must
    match the unfused plain path."""
    graphs, d_id = prepared
    cfg = GSNConfig(
        model_name="GSN_sparse", num_layers=2, d_out=16, out_features=2,
        msg_kind="general", id_scope="global", bn=True, bn_mlp=True,
        activation_mlp="relu", in_features=1, d_in_id=d_id).finalize()
    model = build_model(cfg)

    caps = (256, 512, 24)
    plain = next(iterate_batches(graphs, 24, caps=caps))
    slab = next(iterate_batches(graphs, 24, caps=caps, mxu_layout=SLAB))
    assert slab.seg_mode == "slab"

    variables = model.init(jax.random.PRNGKey(0), plain, train=False)
    out_plain = np.asarray(model.apply(variables, plain, train=False))
    out_slab = np.asarray(model.apply(variables, slab, train=False))
    np.testing.assert_allclose(out_slab, out_plain, rtol=2e-4, atol=2e-5)

    # train mode: outputs + running-stat updates
    o_p, m_p = model.apply(variables, plain, train=True,
                           mutable=["batch_stats"])
    o_s, m_s = model.apply(variables, slab, train=True,
                           mutable=["batch_stats"])
    np.testing.assert_allclose(np.asarray(o_s), np.asarray(o_p),
                               rtol=2e-4, atol=2e-4)
    for a, b in zip(jax.tree_util.tree_leaves(m_s),
                    jax.tree_util.tree_leaves(m_p)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)

    def loss(params, data):
        out, _ = model.apply(
            {"params": params, "batch_stats": variables["batch_stats"]},
            data, train=True, mutable=["batch_stats"])
        return ((out ** 2) * data.graph_mask[:, None]).sum()

    g_plain = jax.grad(loss)(variables["params"], plain)
    g_slab = jax.grad(loss)(variables["params"], slab)
    # absolute tolerance against the global gradient scale: BN shift
    # invariance makes pre-BN bias grads pure cancellation noise
    scale = max(float(np.max(np.abs(np.asarray(x))))
                for x in jax.tree_util.tree_leaves(g_plain))
    for a, b in zip(jax.tree_util.tree_leaves(g_slab),
                    jax.tree_util.tree_leaves(g_plain)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-3, atol=2e-4 * scale)


def _ppa_like_graphs(num_graphs=6, seed=0):
    """ogbg-ppa shape class: ~200-260 nodes per graph (well past one
    128-node block), avg degree ~9.  Exercises the ADAPTIVE sender
    window (VERDICT r3 #4: the old fixed 4-block window silently
    excluded graphs > block_n nodes)."""
    rng = np.random.RandomState(seed)
    graphs = []
    for gi in range(num_graphs):
        n = int(rng.randint(200, 260))
        edges = {(i, i + 1) for i in range(n - 1)}
        for _ in range(4 * n):
            u, v = rng.randint(0, n, 2)
            if u != v:
                edges.add((min(u, v), max(u, v)))
        both = sorted([(u, v) for u, v in edges]
                      + [(v, u) for u, v in edges])
        graphs.append({
            "x": np.ones((n, 1), np.float32),
            "edge_index": np.array(both, np.int64).T,
            "y": np.int64(gi % 2),
        })
    return graphs


def test_slab_mode_large_graphs_adaptive_window():
    """Graphs of 200-260 nodes (> block_n=128) must still build slab
    metadata — via a sender window wider than the old fixed 4 blocks —
    and match the plain path exactly."""
    graphs = _ppa_like_graphs()
    vocab = [cycle_graph(3)]
    graphs, _ = generate_dataset(graphs, vocab, id_scope="global")
    graphs, _eid, d_id, _ed, _dd = encode(graphs, "one_hot_unique")

    cfg = GSNConfig(
        model_name="GSN_sparse", num_layers=2, d_out=16, out_features=2,
        msg_kind="general", id_scope="global", bn=True, bn_mlp=False,
        activation_mlp="relu", in_features=1, d_in_id=d_id).finalize()
    model = build_model(cfg)

    caps = (1536, 16384, 8)
    plain = next(iterate_batches(graphs, 8, caps=caps))
    slab = next(iterate_batches(graphs, 8, caps=caps, mxu_layout=SLAB))
    assert slab.seg_mode == "slab", "large graphs must ride the kernel"
    # a >=200-node graph spans >= 2 node blocks -> window must be > 2
    assert slab.seg_s_s >= 3, slab.seg_s_s

    variables = model.init(jax.random.PRNGKey(0), plain, train=False)
    out_plain = np.asarray(model.apply(variables, plain, train=False))
    out_slab = np.asarray(model.apply(variables, slab, train=False))
    np.testing.assert_allclose(out_slab, out_plain, rtol=2e-4, atol=2e-5)

    def loss(params, data):
        out, _ = model.apply(
            {"params": params, "batch_stats": variables["batch_stats"]},
            data, train=True, mutable=["batch_stats"])
        return ((out ** 2) * data.graph_mask[:, None]).sum()

    g_plain = jax.grad(loss)(variables["params"], plain)
    g_slab = jax.grad(loss)(variables["params"], slab)
    scale = max(float(np.max(np.abs(np.asarray(x))))
                for x in jax.tree_util.tree_leaves(g_plain))
    for a, b in zip(jax.tree_util.tree_leaves(g_slab),
                    jax.tree_util.tree_leaves(g_plain)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-3, atol=1e-4 * scale)


def test_adaptive_window_narrows_on_molecular_batches():
    """Small-molecule batches need only a 2-3 block window (the r3 fixed
    window was 4): less VMEM traffic per chunk."""
    graphs = make_synthetic_dataset(n_per_class=24)
    vocab = [cycle_graph(3)]
    graphs, _ = generate_dataset(graphs, vocab, id_scope="global")
    graphs, _eid, d_id, _ed, _dd = encode(graphs, "one_hot_unique")
    slab = next(iterate_batches(graphs, 48, caps=(512, 1024, 48),
                                mxu_layout=SLAB))
    assert slab.seg_mode == "slab"
    assert slab.seg_s_s is not None and slab.seg_s_s <= 3, slab.seg_s_s
