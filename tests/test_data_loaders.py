"""Loader tests: TU text format, ZINC pickles, OGB raw csvs, splits,
encoding, cache + k-downgrade."""

import gzip
import os
import pickle

import numpy as np
import pytest

from gsn_tpu.data.encoding import OneHotMax, OneHotUnique, encode
from gsn_tpu.data.loaders import load_ogb_data, load_tu_data, load_zinc_data
from gsn_tpu.data.pipeline import prepare_dataset
from gsn_tpu.data.splits import separate_data, stratified_kfold_indices


def test_load_tu_imdb():
    graphs, num_classes = load_tu_data(
        "/root/reference/datasets/social/IMDBBINARY", "IMDBBINARY")
    assert len(graphs) == 1000 and num_classes == 2
    g = graphs[0]
    assert g["edge_index"].shape[0] == 2
    # both directions present
    ei = set(map(tuple, g["edge_index"].T.tolist()))
    assert all((v, u) in ei for (u, v) in ei)


def test_load_zinc_synthetic_pickles(tmp_path):
    """Exercise the ZINC loader on synthetic molecule pickles in the
    benchmarking-gnns format (reference utils_data_prep.py:139-174)."""
    rng = np.random.RandomState(0)
    os.makedirs(tmp_path / "molecules")
    os.makedirs(tmp_path / "indices")

    import torch
    for split, n_mols in [("train", 6), ("val", 3), ("test", 3)]:
        mols = []
        for _ in range(n_mols):
            n = rng.randint(4, 9)
            adj = np.zeros((n, n), dtype=np.int64)
            for j in range(n - 1):
                t = rng.randint(1, 4)
                adj[j, j + 1] = adj[j + 1, j] = t
            mols.append({
                "atom_type": torch.tensor(rng.randint(0, 28, n)),
                "bond_type": torch.tensor(adj),
                "logP_SA_cycle_normalized": torch.tensor(
                    float(rng.randn())),
            })
        with open(tmp_path / "molecules" / f"{split}.pickle", "wb") as f:
            pickle.dump(mols, f)
        with open(tmp_path / "indices" / f"{split}.index", "w") as f:
            f.write(",".join(map(str, range(n_mols))))

    graphs, num_classes, n_atom, n_bond = load_zinc_data(str(tmp_path))
    assert len(graphs) == 12 and num_classes == 1
    assert n_atom == 28 and n_bond == 4
    g = graphs[0]
    assert g["edge_features"].shape[0] == g["edge_index"].shape[1]
    assert (g["edge_features"] >= 1).all()


def test_load_ogb_raw_csvs(tmp_path):
    """Exercise the OGB loader on a synthetic raw/ csv.gz layout."""
    raw = tmp_path / "ogbg_molhiv" / "raw"
    os.makedirs(raw)

    def write(name, rows):
        with gzip.open(raw / name, "wt") as f:
            for r in rows:
                f.write(",".join(map(str, np.atleast_1d(r))) + "\n")

    # two graphs: 3 nodes / 2 und. edges, 2 nodes / 1 und. edge
    write("num-node-list.csv.gz", [3, 2])
    write("num-edge-list.csv.gz", [2, 1])
    write("edge.csv.gz", [[0, 1], [1, 2], [0, 1]])
    write("edge-feat.csv.gz", [[0, 0, 0], [1, 1, 1], [2, 2, 0]])
    write("node-feat.csv.gz", [[5, 0, 1, 4, 0, 0, 1, 0, 0]] * 5)
    write("graph-label.csv.gz", [1.0, 0.0])

    graphs, num_tasks = load_ogb_data(str(tmp_path), "ogbg-molhiv")
    assert len(graphs) == 2 and num_tasks == 1
    assert graphs[0]["edge_index"].shape == (2, 4)  # both directions
    assert graphs[1]["edge_index"].shape == (2, 2)
    assert graphs[0]["x"].shape == (3, 9)
    assert float(graphs[0]["y"]) == 1.0


def test_one_hot_unique_and_max():
    a = np.array([[5, 0], [7, 0], [5, 2]])
    b = np.array([[9, 2]])
    enc = OneHotUnique([a, b])
    assert enc.d == [3, 2]
    ea, eb = enc.fit([a, b])
    np.testing.assert_array_equal(ea, [[0, 0], [1, 0], [0, 1]])
    np.testing.assert_array_equal(eb, [[2, 1]])
    enc2 = OneHotMax([a, b])
    assert enc2.d == [10, 3]


def test_stratified_kfold_balanced():
    labels = np.array([0] * 50 + [1] * 30)
    folds = stratified_kfold_indices(labels, n_splits=10, seed=0)
    assert len(folds) == 10
    for train, test in folds:
        assert len(test) == 8
        assert (labels[test] == 0).sum() == 5
        assert (labels[test] == 1).sum() == 3
        assert len(np.intersect1d(train, test)) == 0


def test_cache_and_downgrade(tmp_path):
    # build a tiny TU dataset on disk
    os.makedirs(tmp_path / "toy")
    lines = ["4"]
    for i in range(4):
        lines.append("3 0")  # 3 nodes, label 0
        lines.append("0 1 1")
        lines.append("0 2 0 2")
        lines.append("0 1 1")
    (tmp_path / "toy" / "toy.txt").write_text("\n".join(lines) + "\n")

    common = dict(path=str(tmp_path / "toy"), dataset="social", name="toy",
                  id_scope="global", id_type="cycle_graph",
                  cache_root=str(tmp_path / "cache"))
    g5, n5, s5 = prepare_dataset(k=5, **common)
    cache_dir = tmp_path / "cache" / "processed" / "global"
    assert (cache_dir / "cycle_graph_5.pkl").exists()

    # k=4 must downgrade from the k=5 cache (slice columns)
    g4, n4, s4 = prepare_dataset(k=4, **common)
    assert (cache_dir / "cycle_graph_4.pkl").exists()
    assert s4 == s5[:2]
    assert g4[0]["identifiers"].shape[1] == sum(s4)
    np.testing.assert_array_equal(
        g4[0]["identifiers"], g5[0]["identifiers"][:, :sum(s4)])


def test_load_ogb_ppa_raw(tmp_path):
    """ogbg-ppa: zero node features (add_zeros), float edge features,
    integer class labels."""
    raw = tmp_path / "ogbg_ppa" / "raw"
    os.makedirs(raw)

    def write(name, rows):
        with gzip.open(raw / name, "wt") as f:
            for r in rows:
                f.write(",".join(map(str, np.atleast_1d(r))) + "\n")

    write("num-node-list.csv.gz", [3, 2])
    write("num-edge-list.csv.gz", [2, 1])
    write("edge.csv.gz", [[0, 1], [1, 2], [0, 1]])
    write("edge-feat.csv.gz", [[0.5] * 7, [0.1] * 7, [0.9] * 7])
    write("graph-label.csv.gz", [4, 2])

    graphs, num_classes = load_ogb_data(str(tmp_path), "ogbg-ppa")
    assert num_classes == 5
    assert graphs[0]["x"].shape == (3, 1)
    assert (graphs[0]["x"] == 0).all()
    assert graphs[0]["edge_features"].dtype == np.float32
    assert graphs[0]["y"] == 4 and graphs[1]["y"] == 2
