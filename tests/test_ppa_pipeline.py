"""ogbg-ppa CLI pipeline on a synthetic OGB raw layout: the add_zeros
node-feature path (no node-feat.csv.gz on disk, reference
utils_data_prep.py:181-185), float 7-dim edge features, integer class
labels, multi-class accuracy evaluation."""

import gzip
import os

import numpy as np
import pytest

from gsn_tpu.cli import build_parser, main


def make_ppa_fixture(root, n_graphs=24, n_classes=3, seed=0):
    rng = np.random.RandomState(seed)
    base = os.path.join(root, "ogb", "ogbg-ppa")
    raw = os.path.join(base, "ogbg_ppa", "raw")
    os.makedirs(raw)
    os.makedirs(os.path.join(base, "10fold_idx"))

    num_nodes, num_edges = [], []
    edges, efeat, labels = [], [], []
    for i in range(n_graphs):
        n = rng.randint(8, 14)
        und = [(j, j + 1) for j in range(n - 1)] + [(0, 4), (2, n - 1)]
        num_nodes.append(n)
        num_edges.append(len(und))
        for (u, v) in und:
            edges.append([u, v])
            efeat.append(np.round(rng.rand(7), 4).tolist())
        labels.append([i % n_classes])

    def write(name, rows):
        with gzip.open(os.path.join(raw, name), "wt") as f:
            for r in rows:
                f.write(",".join(map(str, np.atleast_1d(r))) + "\n")

    write("num-node-list.csv.gz", num_nodes)
    write("num-edge-list.csv.gz", num_edges)
    write("edge.csv.gz", edges)
    write("edge-feat.csv.gz", efeat)
    write("graph-label.csv.gz", labels)
    # NB: no node-feat.csv.gz — the loader must substitute zeros

    idx = np.arange(n_graphs)
    np.savetxt(os.path.join(base, "10fold_idx", "train_idx-0.txt"),
               idx[: n_graphs // 2], fmt="%d")
    np.savetxt(os.path.join(base, "10fold_idx", "val_idx-0.txt"),
               idx[n_graphs // 2: 3 * n_graphs // 4], fmt="%d")
    np.savetxt(os.path.join(base, "10fold_idx", "test_idx-0.txt"),
               idx[3 * n_graphs // 4:], fmt="%d")
    return base


def test_ppa_loader_add_zeros(tmp_path):
    from gsn_tpu.data.loaders import load_ogb_data
    make_ppa_fixture(str(tmp_path))
    graphs, num_classes = load_ogb_data(
        str(tmp_path / "ogb" / "ogbg-ppa"), "ogbg-ppa")
    assert num_classes == 3
    g = graphs[0]
    assert g["x"].dtype == np.int64 and (g["x"] == 0).all()
    assert g["edge_features"].dtype == np.float32
    assert g["edge_features"].shape[1] == 7
    assert isinstance(g["y"], np.int64)
    # both directions present
    assert g["edge_index"].shape[1] == 2 * (g["x"].shape[0] - 1 + 2)


@pytest.mark.slow
def test_ppa_cli_pipeline(tmp_path):
    make_ppa_fixture(str(tmp_path))
    argv = [
        "--seed", "0", "--onesplit", "True",
        "--dataset", "ogb", "--dataset_name", "ogbg-ppa",
        "--root_folder", str(tmp_path),
        "--cache_folder", str(tmp_path / "cache"),
        "--id_type", "cycle_graph", "--induced", "True", "--k", "4",
        "--id_scope", "local", "--id_encoding", "one_hot_unique",
        "--id_embedding", "embedding",
        "--input_node_encoder", "embedding",
        "--edge_encoder", "linear",
        "--model_name", "GSN_edge_sparse_ogb", "--msg_kind", "ogb",
        "--num_layers", "2", "--d_out", "16", "--d_h", "16",
        "--dropout_features", "0.3", "--final_projection", "False",
        "--jk_mlp", "False", "--readout", "mean", "--batch_size", "8",
        "--num_epochs", "3", "--eval_frequency", "2", "--lr", "1e-3",
        "--scheduler", "None", "--loss_fn", "CrossEntropyLoss",
        "--prediction_fn", "multi_class_accuracy", "--mode", "train",
    ]
    results = main(vars(build_parser().parse_args(argv)))
    hist = results[0]
    # accuracy evaluator (not ROC-AUC) on the multi-class ppa path
    assert 0.0 <= hist["test_accs"][-1] <= 1.0
    assert np.isfinite(hist["train_losses"]).all()
