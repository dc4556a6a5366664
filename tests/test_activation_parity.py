"""Activation parity against an independent numpy implementation of the
reference's forward math.

BASELINE.json asks for per-layer activation-allclose parity with the
PyTorch reference.  The reference stack (torch_geometric + graph-tool)
is not installable here, so the oracle is a from-scratch numpy
transcription of the reference equations (GSN_sparse.py:93-176,
models_graph_classification.py:204-247) evaluated with the *same
weights* as our flax model.  Any semantic deviation in gather order,
message math, BN statistics, JK projections, or pooling shows up as a
mismatch.
"""

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


def np_relu(x):
    return np.maximum(x, 0.0)


def np_mlp(params, x, bn_stats=None, train=False, mask=None):
    """Reference models_misc.py mlp: (linear -> [bn] -> act)* -> linear.
    Our param layout: dense_0..dense_k, last one split as kernel +
    dense_k_bias."""
    keys = sorted(k for k in params if k.startswith("dense")
                  and not k.endswith("_bias"))
    n = len(keys)
    for i, k in enumerate(keys):
        W = np.asarray(params[k]["kernel"])
        x = x @ W
        if "bias" in params[k]:
            x = x + np.asarray(params[k]["bias"])
        elif f"{k}_bias" in params:
            x = x + np.asarray(params[f"{k}_bias"])
        if i < n - 1:
            x = np_relu(x)
    return x


def np_edge_message_mlp(params, x, ids, recv, send):
    """EdgeMessageMLP general message: first dense of
    cat(x_i, x_j[, id_i, id_j]) as per-part projections
    (dense_0_p0..p3), then hidden relu, then final dense.  ``ids`` is
    None for layers past the first when inject_ids is off (the reference
    degrades them to plain MPNN, models_graph_classification.py:147-155).
    """
    A = x @ np.asarray(params["dense_0_p0"]["kernel"])       # x_i side
    Bm = x @ np.asarray(params["dense_0_p1"]["kernel"])      # x_j side
    if ids is not None:
        A = A + ids @ np.asarray(params["dense_0_p2"]["kernel"])
        Bm = Bm + ids @ np.asarray(params["dense_0_p3"]["kernel"])
    h = A[recv] + Bm[send] + np.asarray(params["dense_0_bias"])
    h = np_relu(h)
    h = h @ np.asarray(params["dense_1"]["kernel"]) + np.asarray(
        params["dense_1_bias"])
    return h


def np_forward(variables, graphs_np, cfg):
    """Full GNNSubstructures forward (general msg, GSN-v, sum readout,
    eval-mode BN) in numpy on the unbatched graphs."""
    p = variables["params"]
    bs = variables["batch_stats"]
    outs = []
    for g in graphs_np:
        x = np.asarray(g["x"], np.float32)
        ids_cat = g["identifiers"]
        # one-hot encode ids per column with the encoded vocab sizes
        ids = np.concatenate(
            [np.eye(d, dtype=np.float32)[ids_cat[:, i]]
             for i, d in enumerate(cfg.d_in_id)], 1)
        recv = g["edge_index"][1]   # flow source_to_target: select=1
        send = g["edge_index"][0]

        pred = 0.0
        x_interm = [x]
        for li in range(cfg.num_layers):
            conv = p[f"conv_{li}"]
            layer_ids = ids if (li == 0 or cfg.inject_ids) else None
            msgs = np_edge_message_mlp(conv["msg_fn"], x, layer_ids,
                                       recv, send)
            agg = np.zeros((x.shape[0], msgs.shape[1]), np.float32)
            np.add.at(agg, recv, msgs)
            upd_in = np.concatenate([x, agg], 1)
            x = np_mlp(conv["update_fn"], upd_in)
            # top-level BN (eval: running stats)
            bn = bs[f"bn_{li}"]
            scale = np.asarray(p[f"bn_{li}"]["scale"])
            bias = np.asarray(p[f"bn_{li}"]["bias"])
            x = ((x - np.asarray(bn["mean"]))
                 / np.sqrt(np.asarray(bn["var"]) + 1e-5)) * scale + bias
            x = np_relu(x)
            x_interm.append(x)

        for i, xi in enumerate(x_interm):
            if cfg.final_projection[i]:
                pooled = xi.sum(0)
                proj = p[f"lin_proj_{i}"]
                pred = pred + pooled @ np.asarray(proj["kernel"]) \
                    + np.asarray(proj["bias"])
        outs.append(pred)
    return np.stack(outs)


def test_forward_matches_numpy_reference():
    graphs = make_synthetic_dataset(n_per_class=8)
    graphs, _ = generate_dataset(graphs, [cycle_graph(3), cycle_graph(4)],
                                 id_scope="global")
    graphs, _eid, d_id, _ed, _dd = encode(graphs, "one_hot_unique")

    cfg = GSNConfig(
        model_name="GSN_sparse", num_layers=2, d_out=16, out_features=2,
        msg_kind="general", id_scope="global", bn=True, bn_mlp=False,
        activation_mlp="relu", activation="relu", readout="sum",
        jk_mlp=False, final_projection=[True],
        in_features=1, d_in_id=d_id).finalize()
    model = build_model(cfg)

    data = next(iterate_batches(graphs, 16, caps=(256, 512, 16)))
    variables = model.init(jax.random.PRNGKey(3), data, train=False)
    ours = np.asarray(model.apply(variables, data, train=False))[:len(graphs)]

    want = np_forward(jax.device_get(variables), graphs, cfg)
    np.testing.assert_allclose(ours, want, rtol=5e-4, atol=5e-4)
