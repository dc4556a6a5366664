"""Full molhiv CLI pipeline on a synthetic OGB raw layout: the reference
GSN-VN-AF command path (GSN_edge_sparse_ogb + virtual node + atom/bond
encoders + ogb msg kind + ROC-AUC eval) end to end."""

import gzip
import os

import numpy as np
import pytest

from gsn_tpu.cli import build_parser, main


def make_molhiv_fixture(root, n_graphs=32, seed=0):
    rng = np.random.RandomState(seed)
    base = os.path.join(root, "ogb", "ogbg-molhiv")
    raw = os.path.join(base, "ogbg_molhiv", "raw")
    os.makedirs(raw)
    os.makedirs(os.path.join(base, "10fold_idx"))

    num_nodes, num_edges = [], []
    edges, efeat, nfeat, labels = [], [], [], []
    for i in range(n_graphs):
        n = rng.randint(8, 16)
        und = [(j, j + 1) for j in range(n - 1)] + [(0, 3)]
        num_nodes.append(n)
        num_edges.append(len(und))
        for (u, v) in und:
            edges.append([u, v])
            efeat.append(rng.randint(0, [5, 6, 2]).tolist())
        for _ in range(n):
            nfeat.append(rng.randint(
                0, [119, 4, 12, 12, 10, 6, 6, 2, 2]).tolist())
        labels.append([float(i % 2)])

    def write(name, rows):
        with gzip.open(os.path.join(raw, name), "wt") as f:
            for r in rows:
                f.write(",".join(map(str, np.atleast_1d(r))) + "\n")

    write("num-node-list.csv.gz", num_nodes)
    write("num-edge-list.csv.gz", num_edges)
    write("edge.csv.gz", edges)
    write("edge-feat.csv.gz", efeat)
    write("node-feat.csv.gz", nfeat)
    write("graph-label.csv.gz", labels)

    idx = np.arange(n_graphs)
    np.savetxt(os.path.join(base, "10fold_idx", "train_idx-0.txt"),
               idx[: n_graphs // 2], fmt="%d")
    np.savetxt(os.path.join(base, "10fold_idx", "val_idx-0.txt"),
               idx[n_graphs // 2: 3 * n_graphs // 4], fmt="%d")
    np.savetxt(os.path.join(base, "10fold_idx", "test_idx-0.txt"),
               idx[3 * n_graphs // 4:], fmt="%d")
    return base


@pytest.mark.slow
def test_molhiv_cli_pipeline(tmp_path):
    make_molhiv_fixture(str(tmp_path))
    argv = [
        "--seed", "0", "--onesplit", "True",
        "--dataset", "ogb", "--dataset_name", "ogbg-molhiv",
        "--root_folder", str(tmp_path),
        "--cache_folder", str(tmp_path / "cache"),
        "--features_scope", "full", "--vn", "True",
        "--id_type", "cycle_graph", "--induced", "True", "--k", "4",
        "--id_scope", "local", "--id_encoding", "one_hot_unique",
        "--id_embedding", "embedding",
        "--input_node_encoder", "atom_encoder",
        "--edge_encoder", "bond_encoder",
        "--input_vn_encoder", "embedding",
        "--model_name", "GSN_edge_sparse_ogb", "--msg_kind", "ogb",
        "--num_layers", "2", "--d_out", "24", "--d_h", "24",
        "--dropout_features", "0.5", "--final_projection", "False",
        "--jk_mlp", "False", "--readout", "mean", "--batch_size", "8",
        "--num_epochs", "4", "--eval_frequency", "3", "--lr", "1e-3",
        "--scheduler", "None", "--loss_fn", "BCEWithLogitsLoss",
        "--prediction_fn", "None", "--mode", "train",
    ]
    results = main(vars(build_parser().parse_args(argv)))
    hist = results[0]
    # evaluator = rocauc for ogb datasets
    assert 0.0 <= hist["test_accs"][-1] <= 1.0
    assert np.isfinite(hist["train_losses"]).all()
