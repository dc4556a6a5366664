"""Extended activation-parity suite (VERDICT r1 item 5).

Numpy oracles transcribed from the *reference equations* — not from this
repo's parameter decomposition — for the model families the original
parity test left unpinned:

- gin message kind with local-scope ids + CentralEncoder dummy
  (reference GSN_sparse.py:103-111, utils_graph_learning.py:211-259);
- general message kind with edge features, oracle evaluated in the
  reference's concatenated-dense form MLP(cat(x_i, x_j, id_i, id_j, e))
  (GSN_edge_sparse.py:152-168);
- GNN_OGB: virtual node, residual, ogb message, last-layer-no-activation
  (models_graph_classification_ogb_original.py:209-268,
  GSN_edge_sparse_ogb.py:75-129);
- train-mode BN: masked batch statistics + torch-style running-stat
  updates (BatchNorm1d semantics: momentum 0.1, unbiased running var).

All oracles share weights with the flax models and must match to 5e-4.
"""

import jax
import numpy as np

from gsn_tpu.config import GSNConfig
from gsn_tpu.data.encoding import encode
from gsn_tpu.data.pipeline import generate_dataset
from gsn_tpu.graphs.batching import iterate_batches
from gsn_tpu.graphs.patterns import cycle_graph
from gsn_tpu.nn.models import build_model

from test_activation_parity import np_mlp, np_relu
from test_train import make_synthetic_dataset


def _randomize(variables, seed=7, scale=0.3):
    """Replace every param with random normals so zero-init paths (vn
    table, biases) carry signal in the parity comparison."""
    leaves, treedef = jax.tree_util.tree_flatten(variables["params"])
    rng = np.random.RandomState(seed)
    new = [np.asarray(rng.randn(*l.shape) * scale, l.dtype) for l in leaves]
    out = dict(variables)
    out["params"] = jax.tree_util.tree_unflatten(treedef, new)
    return out


def _make_graphs(with_ef=False, categorical_x=False, n_per_class=6,
                 seed=0):
    rng = np.random.RandomState(seed)
    graphs = make_synthetic_dataset(n_per_class=n_per_class)
    for g in graphs:
        if with_ef:
            E = g["edge_index"].shape[1]
            g["edge_features"] = rng.randint(0, 4, (E, 1)).astype(np.int64)
        if categorical_x:
            g["x"] = rng.randint(0, 5, (g["x"].shape[0], 1)).astype(
                np.int64)
    return graphs


def _one_hot_ids(ids_cat, d_in_id):
    return np.concatenate(
        [np.eye(d, dtype=np.float32)[ids_cat[:, i]]
         for i, d in enumerate(d_in_id)], 1)


def _embed_sum(tree, x_cat):
    """MultiEmbedding, aggr='sum' (reference multi_embedding)."""
    out = 0.0
    for i in range(x_cat.shape[1]):
        table = np.asarray(tree["MultiEmbedding_0"][f"embed_{i}"]
                           ["embedding"])
        out = out + table[x_cat[:, i]]
    return out


def _bn_eval(p, bs, name, x):
    mean = np.asarray(bs[name]["mean"])
    var = np.asarray(bs[name]["var"])
    return ((x - mean) / np.sqrt(var + 1e-5)
            * np.asarray(p[name]["scale"]) + np.asarray(p[name]["bias"]))


# ---------------------------------------------------------------------
# 1. gin message kind, local scope (IMDB GSN-e configuration shape)
# ---------------------------------------------------------------------
def test_gin_local_parity():
    graphs = _make_graphs(categorical_x=True)
    graphs, _ = generate_dataset(graphs, [cycle_graph(3), cycle_graph(4)],
                                 id_scope="local")
    graphs, _e, d_id, _ed, _dd = encode(graphs, "one_hot_unique")

    cfg = GSNConfig(
        model_name="GSN_sparse", num_layers=2, d_out=8, out_features=2,
        msg_kind="gin", id_scope="local", bn=True, bn_mlp=False,
        readout="mean", jk_mlp=False, final_projection=[True],
        id_embedding="one_hot_encoder", input_node_encoder="embedding",
        d_out_node_encoder=8, in_features=1, d_in_node_encoder=[5],
        d_in_id=d_id).finalize()
    model = build_model(cfg)
    data = next(iterate_batches(graphs, len(graphs), caps=(128, 256, 16)))
    variables = _randomize(model.init(jax.random.PRNGKey(0), data,
                                      train=False))
    ours = np.asarray(model.apply(variables, data,
                                  train=False))[:len(graphs)]

    v = jax.device_get(variables)
    p, bs = v["params"], v["batch_stats"]
    outs = []
    for g in graphs:
        x = _embed_sum(p["input_node_encoder"], g["x"])
        # local ids one-hot + CentralEncoder extension
        # (utils_graph_learning.py:225-259): neighbors get a zero column
        # prepended, central nodes the one-hot of the new category
        ids = _one_hot_ids(g["identifiers"], d_id)
        ids_nb = np.concatenate(
            [np.zeros((ids.shape[0], 1), np.float32), ids], 1)
        d_ext = ids.shape[1] + 1
        central = np.tile(np.eye(d_ext, dtype=np.float32)[0],
                          (x.shape[0], 1))
        recv, send = g["edge_index"][1], g["edge_index"][0]

        x_interm = [x]
        for li in range(2):
            if li == 0:
                self_msg = np.concatenate([x, central], 1)
                msgs = np.concatenate([x[send], ids_nb], 1)
            else:   # inject_ids off: degrades to plain gin MPNN
                self_msg = x
                msgs = x[send]
            agg = np.zeros((x.shape[0], msgs.shape[1]), np.float32)
            np.add.at(agg, recv, msgs)
            # update = MLP((1+eps) self + agg), eps = 0
            x = np_mlp(p[f"conv_{li}"]["update_fn"], self_msg + agg)
            x = np_relu(_bn_eval(p, bs, f"bn_{li}", x))
            x_interm.append(x)

        pred = 0.0
        for i, xi in enumerate(x_interm):
            pooled = xi.mean(0)   # readout mean
            proj = p[f"lin_proj_{i}"]
            pred = pred + pooled @ np.asarray(proj["kernel"]) \
                + np.asarray(proj["bias"])
        outs.append(pred)
    np.testing.assert_allclose(ours, np.stack(outs), rtol=5e-4, atol=5e-4)


# ---------------------------------------------------------------------
# 2. general message kind + edge features (ZINC GSN-EF configuration
#    shape), oracle in the reference's concatenated-dense form
# ---------------------------------------------------------------------
def test_general_edge_features_parity():
    graphs = _make_graphs(with_ef=True, categorical_x=True)
    graphs, _ = generate_dataset(graphs, [cycle_graph(3), cycle_graph(4)],
                                 id_scope="global")
    graphs, _e, d_id, _ed, _dd = encode(graphs, "one_hot_unique")

    cfg = GSNConfig(
        model_name="GSN_edge_sparse", num_layers=2, d_out=8,
        out_features=1, msg_kind="general", id_scope="global", bn=True,
        bn_mlp=False, readout="sum", jk_mlp=False, final_projection=[True],
        id_embedding="one_hot_encoder", input_node_encoder="embedding",
        d_out_node_encoder=8, edge_encoder="one_hot_encoder",
        in_features=1, d_in_node_encoder=[5], d_in_edge_encoder=[4],
        in_edge_features=1, d_in_id=d_id).finalize()
    model = build_model(cfg)
    data = next(iterate_batches(graphs, len(graphs), caps=(128, 256, 16)))
    variables = _randomize(model.init(jax.random.PRNGKey(1), data,
                                      train=False))
    ours = np.asarray(model.apply(variables, data,
                                  train=False))[:len(graphs)]

    v = jax.device_get(variables)
    p, bs = v["params"], v["batch_stats"]
    outs = []
    for g in graphs:
        x = _embed_sum(p["input_node_encoder"], g["x"])
        ids = _one_hot_ids(g["identifiers"], d_id)
        ef = np.eye(4, dtype=np.float32)[g["edge_features"][:, 0]]
        recv, send = g["edge_index"][1], g["edge_index"][0]

        x_interm = [x]
        for li in range(2):
            conv = p[f"conv_{li}"]["msg_fn"]
            # reference form: one dense over cat(x_i, x_j[, id_i, id_j],
            # e) — reconstruct the concatenated kernel from the per-part
            # projections (GSN_edge_sparse.py:152-168)
            if li == 0:   # ids only in layer 0 (inject_ids off)
                W = np.concatenate([
                    np.asarray(conv["dense_0_p0"]["kernel"]),   # x_i
                    np.asarray(conv["dense_0_p1"]["kernel"]),   # x_j
                    np.asarray(conv["dense_0_p2"]["kernel"]),   # id_i
                    np.asarray(conv["dense_0_p3"]["kernel"]),   # id_j
                    np.asarray(conv["dense_0_p4"]["kernel"]),   # e
                ], 0)
                feat = np.concatenate(
                    [x[recv], x[send], ids[recv], ids[send], ef], 1)
            else:
                W = np.concatenate([
                    np.asarray(conv["dense_0_p0"]["kernel"]),
                    np.asarray(conv["dense_0_p1"]["kernel"]),
                    np.asarray(conv["dense_0_p2"]["kernel"]),   # e
                ], 0)
                feat = np.concatenate([x[recv], x[send], ef], 1)
            h = feat @ W + np.asarray(conv["dense_0_bias"])
            h = np_relu(h)
            msgs = h @ np.asarray(conv["dense_1"]["kernel"]) + np.asarray(
                conv["dense_1_bias"])
            agg = np.zeros((x.shape[0], msgs.shape[1]), np.float32)
            np.add.at(agg, recv, msgs)
            x = np_mlp(p[f"conv_{li}"]["update_fn"],
                       np.concatenate([x, agg], 1))
            x = np_relu(_bn_eval(p, bs, f"bn_{li}", x))
            x_interm.append(x)

        pred = 0.0
        for i, xi in enumerate(x_interm):
            pooled = xi.sum(0)
            proj = p[f"lin_proj_{i}"]
            pred = pred + pooled @ np.asarray(proj["kernel"]) \
                + np.asarray(proj["bias"])
        outs.append(pred)
    np.testing.assert_allclose(ours, np.stack(outs), rtol=5e-4, atol=5e-4)


# ---------------------------------------------------------------------
# 3. GNN_OGB: virtual node + residual + ogb msg + last-layer-no-act
# ---------------------------------------------------------------------
def test_ogb_vn_residual_parity():
    graphs = _make_graphs(with_ef=True, categorical_x=True)
    for g in graphs:
        g["y"] = np.float32(g["y"])
    graphs, _ = generate_dataset(graphs, [cycle_graph(3), cycle_graph(4)],
                                 id_scope="local")
    graphs, _e, d_id, _ed, _dd = encode(graphs, "one_hot_unique")

    cfg = GSNConfig(
        model_name="GSN_edge_sparse_ogb", num_layers=2, d_out=8, d_h=8,
        out_features=1, msg_kind="ogb", id_scope="local", bn=True,
        bn_mlp=False, readout="mean", vn=True, residual=True,
        jk_mlp=False, final_projection=[True],
        id_embedding="embedding", d_out_id_embedding=8,
        input_node_encoder="embedding", d_out_node_encoder=8,
        edge_encoder="embedding", d_out_edge_encoder=8,
        input_vn_encoder="embedding", d_out_vn_encoder=8,
        in_features=1, d_in_node_encoder=[5], d_in_edge_encoder=[4],
        in_edge_features=1, d_in_id=d_id).finalize()
    model = build_model(cfg)
    data = next(iterate_batches(graphs, len(graphs), caps=(128, 256, 16),
                                y_shape=(), y_dtype=np.float32))
    variables = _randomize(model.init(jax.random.PRNGKey(2), data,
                                      train=False))
    ours = np.asarray(model.apply(variables, data,
                                  train=False))[:len(graphs)]

    v = jax.device_get(variables)
    p, bs = v["params"], v["batch_stats"]
    outs = []
    for g in graphs:
        x = _embed_sum(p["input_node_encoder"], g["x"])
        ids_e = _embed_sum(p["id_encoder_0"], g["identifiers"])  # [E, 8]
        recv, send = g["edge_index"][1], g["edge_index"][0]
        vn = _embed_sum(p["vn_encoder"], np.zeros((1, 1), np.int64))[0]

        x_interm = [x]
        L = 2
        for i in range(L):
            ef = _embed_sum(p[f"edge_encoder_{i}"], g["edge_features"])
            # vn broadcast (reference :236): mutates x_interm[i]
            h = x_interm[i] + vn
            x_interm[i] = h
            # layer 0: msg = relu(x_j + id + e)
            # (GSN_edge_sparse_ogb.py:119-125); layers > 0 degrade to
            # MPNN_edge_sparse_ogb when inject_ids is off (reference
            # models_graph_classification_ogb_original.py:160-168):
            # msg = relu(x_j + e)
            msgs = (np_relu(h[send] + ids_e + ef) if i == 0
                    else np_relu(h[send] + ef))
            agg = np.zeros_like(h)
            np.add.at(agg, recv, msgs)
            # local scope: self_msg = x (GSN_edge_sparse_ogb.py:75-78)
            xx = np_mlp(p[f"conv_{i}"]["update_fn"], h + agg)
            xx = _bn_eval(p, bs, f"bn_{i}", xx)
            if i < L - 1:   # last layer: dropout only, no activation
                xx = np_relu(xx)
            if True:   # residual (reference :247-248, after dropout)
                xx = xx + x_interm[-1]
            x_interm.append(xx)
            if i < L - 1:
                # vn update (reference :252-259), vn_pooling = sum
                vn_tmp = x_interm[i].sum(0) + vn
                vn_new = np_mlp(p[f"mlp_vn_{i}"], vn_tmp[None, :])[0]
                vn = vn_new + np_relu(vn_new)   # residual vn
        pred_nodes = 0.0
        for xi in x_interm:   # final_projection all True
            pred_nodes = pred_nodes + xi
        pooled = pred_nodes.mean(0)
        outs.append(pooled @ np.asarray(p["lin_proj"]["kernel"])
                    + np.asarray(p["lin_proj"]["bias"]))
    np.testing.assert_allclose(ours, np.stack(outs), rtol=5e-4, atol=5e-4)


# ---------------------------------------------------------------------
# 4. train-mode BN: masked batch statistics + running-stat updates
# ---------------------------------------------------------------------
def test_train_mode_bn_parity():
    graphs = _make_graphs(categorical_x=True)
    graphs, _ = generate_dataset(graphs, [cycle_graph(3), cycle_graph(4)],
                                 id_scope="global")
    graphs, _e, d_id, _ed, _dd = encode(graphs, "one_hot_unique")

    cfg = GSNConfig(
        model_name="GSN_sparse", num_layers=2, d_out=8, out_features=2,
        msg_kind="general", id_scope="global", bn=True, bn_mlp=False,
        readout="sum", jk_mlp=False, final_projection=[True],
        input_node_encoder="embedding", d_out_node_encoder=8,
        in_features=1, d_in_node_encoder=[5], d_in_id=d_id).finalize()
    model = build_model(cfg)
    # deliberately padded batch: stats must exclude padding rows
    data = next(iterate_batches(graphs, len(graphs), caps=(160, 320, 16)))
    variables = _randomize(model.init(jax.random.PRNGKey(3), data,
                                      train=False))
    ours, mutated = model.apply(
        variables, data, train=True, mutable=["batch_stats"],
        rngs={"dropout": jax.random.PRNGKey(9)})
    ours = np.asarray(ours)[:len(graphs)]

    v = jax.device_get(variables)
    p, bs0 = v["params"], v["batch_stats"]

    # batch-level numpy oracle over the padded arrays with masks
    x_cat = np.asarray(data.x)
    nm = np.asarray(data.node_mask).astype(bool)
    em = np.asarray(data.edge_mask).astype(bool)
    recv = np.asarray(data.edge_index[1])
    send = np.asarray(data.edge_index[0])
    batch_vec = np.asarray(data.batch)
    ids = _one_hot_ids(np.asarray(data.identifiers), d_id)

    x = _embed_sum(p["input_node_encoder"], x_cat)
    want_stats = {}
    x_interm = [x]
    for li in range(2):
        conv = p[f"conv_{li}"]["msg_fn"]
        if li == 0:
            W = np.concatenate(
                [np.asarray(conv[f"dense_0_p{j}"]["kernel"])
                 for j in range(4)], 0)
            feat = np.concatenate(
                [x[recv], x[send], ids[recv], ids[send]], 1)
        else:
            W = np.concatenate(
                [np.asarray(conv[f"dense_0_p{j}"]["kernel"])
                 for j in range(2)], 0)
            feat = np.concatenate([x[recv], x[send]], 1)
        h = np_relu(feat @ W + np.asarray(conv["dense_0_bias"]))
        msgs = h @ np.asarray(conv["dense_1"]["kernel"]) + np.asarray(
            conv["dense_1_bias"])
        msgs = msgs * em[:, None]
        agg = np.zeros((x.shape[0], msgs.shape[1]), np.float32)
        np.add.at(agg, recv, msgs)
        x = np_mlp(p[f"conv_{li}"]["update_fn"],
                   np.concatenate([x, agg], 1))
        # train-mode BN: biased batch stats over REAL nodes only
        n = nm.sum()
        mean = x[nm].mean(0)
        var = x[nm].var(0)
        x = ((x - mean) / np.sqrt(var + 1e-5)
             * np.asarray(p[f"bn_{li}"]["scale"])
             + np.asarray(p[f"bn_{li}"]["bias"]))
        x = np_relu(x)
        x_interm.append(x)
        # torch running-stat update: momentum 0.1, UNBIASED variance
        unbiased = var * n / (n - 1)
        want_stats[f"bn_{li}"] = (
            0.9 * np.asarray(bs0[f"bn_{li}"]["mean"]) + 0.1 * mean,
            0.9 * np.asarray(bs0[f"bn_{li}"]["var"]) + 0.1 * unbiased)

    pred = np.zeros((data.num_graph_slots, 2), np.float32)
    for i, xi in enumerate(x_interm):
        pooled = np.zeros((data.num_graph_slots, xi.shape[1]), np.float32)
        np.add.at(pooled, batch_vec[nm], xi[nm])
        proj = p[f"lin_proj_{i}"]
        pred = pred + pooled @ np.asarray(proj["kernel"]) + np.asarray(
            proj["bias"])
    np.testing.assert_allclose(ours, pred[:len(graphs)],
                               rtol=5e-4, atol=5e-4)

    new_bs = jax.device_get(mutated["batch_stats"])
    for name, (m_want, v_want) in want_stats.items():
        np.testing.assert_allclose(np.asarray(new_bs[name]["mean"]),
                                   m_want, rtol=5e-4, atol=5e-4)
        np.testing.assert_allclose(np.asarray(new_bs[name]["var"]),
                                   v_want, rtol=5e-4, atol=5e-4)


# ---------------------------------------------------------------------
# 5. bn_mlp=True through the FUSED slab joint-moments path, pinned
#    against an independent transcription of the reference's
#    BN-inside-mlp (models_misc.py:18-49) — NOT against this repo's own
#    unfused path (VERDICT r2 weak #3)
# ---------------------------------------------------------------------
def test_bn_mlp_fused_vs_reference_oracle():
    """Reference mlp(batch_norm=True) semantics in train mode:
    h = fc0(cat(x_i, x_j, id_i, id_j)); h = BN_train(h); h = relu(h);
    m = fc1(h); agg = scatter-sum; then the update mlp applies the same
    linear->BN->relu->linear pattern over nodes
    (models_misc.py:52-58, GSN_sparse.py:113-114,157-176).  The fused
    slab path computes the edge-BN via one joint [H, H^2] moments pass
    and must reproduce these numbers + running-stat updates to 5e-4."""
    from gsn_tpu.graphs.container import GraphBatch  # noqa: F401

    graphs = _make_graphs(categorical_x=True)
    graphs, _ = generate_dataset(graphs, [cycle_graph(3), cycle_graph(4)],
                                 id_scope="global")
    graphs, _e, d_id, _ed, _dd = encode(graphs, "one_hot_unique")

    cfg = GSNConfig(
        model_name="GSN_sparse", num_layers=2, d_out=8, out_features=2,
        msg_kind="general", id_scope="global", bn=True, bn_mlp=True,
        activation_mlp="relu",
        readout="sum", jk_mlp=False, final_projection=[True],
        input_node_encoder="embedding", d_out_node_encoder=8,
        in_features=1, d_in_node_encoder=[5], d_in_id=d_id).finalize()
    model = build_model(cfg)
    slab_layout = {"mode": "slab", "flow": "source_to_target",
                   "block_n": 128, "block_e": 256}
    data = next(iterate_batches(graphs, len(graphs), caps=(160, 320, 16),
                                mxu_layout=slab_layout))
    assert data.seg_mode == "slab"   # the fused BN path must engage

    variables = _randomize(model.init(jax.random.PRNGKey(1), data,
                                      train=False))
    ours, mutated = model.apply(
        variables, data, train=True, mutable=["batch_stats"],
        rngs={"dropout": jax.random.PRNGKey(9)})
    ours = np.asarray(ours)[:len(graphs)]

    v = jax.device_get(variables)
    p, bs0 = v["params"], v["batch_stats"]

    nm = np.asarray(data.node_mask).astype(bool)
    em = np.asarray(data.edge_mask).astype(bool)
    recv = np.asarray(data.edge_index[1])
    send = np.asarray(data.edge_index[0])
    batch_vec = np.asarray(data.batch)
    ids = _one_hot_ids(np.asarray(data.identifiers), d_id)
    x = _embed_sum(p["input_node_encoder"], np.asarray(data.x))

    n_edges = em.sum()
    n_nodes = nm.sum()
    want_stats = {}   # path tuple -> (new_mean, new_var)

    def bn_train(h, rows, params_bn, stats_bn, path, n):
        """Reference BatchNorm1d train step over the real rows; returns
        normalized h (all rows) and records the running-stat update."""
        mean = h[rows].mean(0)
        var = h[rows].var(0)           # biased, used for normalization
        unbiased = var * n / (n - 1)
        want_stats[path] = (
            0.9 * np.asarray(stats_bn["mean"]) + 0.1 * mean,
            0.9 * np.asarray(stats_bn["var"]) + 0.1 * unbiased)
        return ((h - mean) / np.sqrt(var + 1e-5)
                * np.asarray(params_bn["scale"])
                + np.asarray(params_bn["bias"]))

    x_interm = [x]
    for li in range(2):
        conv = p[f"conv_{li}"]
        msg = conv["msg_fn"]
        nparts = 4 if li == 0 else 2
        W0 = np.concatenate([np.asarray(msg[f"dense_0_p{j}"]["kernel"])
                             for j in range(nparts)], 0)
        feat = (np.concatenate([x[recv], x[send], ids[recv], ids[send]],
                               1) if li == 0
                else np.concatenate([x[recv], x[send]], 1))
        h = feat @ W0 + np.asarray(msg["dense_0_bias"])
        h = bn_train(h, em, msg["bn_0"],
                     bs0[f"conv_{li}"]["msg_fn"]["bn_0"],
                     (f"conv_{li}", "msg_fn", "bn_0"), n_edges)
        h = np_relu(h)
        msgs = (h @ np.asarray(msg["dense_1"]["kernel"])
                + np.asarray(msg["dense_1_bias"]))
        agg = np.zeros((x.shape[0], msgs.shape[1]), np.float32)
        np.add.at(agg, recv[em], msgs[em])

        upd = conv["update_fn"]
        u = (np.concatenate([x, agg], 1)
             @ np.asarray(upd["dense_0"]["kernel"])
             + np.asarray(upd["dense_0"]["bias"]))
        u = bn_train(u, nm, upd["bn_0"],
                     bs0[f"conv_{li}"]["update_fn"]["bn_0"],
                     (f"conv_{li}", "update_fn", "bn_0"), n_nodes)
        u = np_relu(u)
        x = (u @ np.asarray(upd["dense_1"]["kernel"])
             + np.asarray(upd["dense_1"]["bias"]))
        # model-level per-layer BN + activation
        x = bn_train(x, nm, p[f"bn_{li}"], bs0[f"bn_{li}"],
                     (f"bn_{li}",), n_nodes)
        x = np_relu(x)
        x_interm.append(x)

    pred = np.zeros((data.num_graph_slots, 2), np.float32)
    for i, xi in enumerate(x_interm):
        pooled = np.zeros((data.num_graph_slots, xi.shape[1]), np.float32)
        np.add.at(pooled, batch_vec[nm], xi[nm])
        proj = p[f"lin_proj_{i}"]
        pred = pred + pooled @ np.asarray(proj["kernel"]) + np.asarray(
            proj["bias"])
    np.testing.assert_allclose(ours, pred[:len(graphs)],
                               rtol=5e-4, atol=5e-4)

    new_bs = jax.device_get(mutated["batch_stats"])
    for path, (m_want, v_want) in want_stats.items():
        node = new_bs
        for k in path:
            node = node[k]
        np.testing.assert_allclose(np.asarray(node["mean"]), m_want,
                                   rtol=5e-4, atol=5e-4)
        np.testing.assert_allclose(np.asarray(node["var"]), v_want,
                                   rtol=5e-4, atol=5e-4)
