"""Full ZINC CLI pipeline on synthetic molecule pickles: the exact
reference command path (chemical/ZINC, GSN_edge_sparse GSN-EF config,
cycle k<=8 vertex counts, Plateau-on-val, regression L1) end to end."""

import os
import pickle

import numpy as np
import pytest

from gsn_tpu.cli import build_parser, main


def make_zinc_fixture(root, n_train=24, n_val=8, n_test=8, seed=0):
    """benchmarking-gnns format molecules under
    <root>/chemical/ZINC/{molecules,indices,10fold_idx}."""
    import torch

    rng = np.random.RandomState(seed)
    base = os.path.join(root, "chemical", "ZINC")
    os.makedirs(os.path.join(base, "molecules"))
    os.makedirs(os.path.join(base, "indices"))
    os.makedirs(os.path.join(base, "10fold_idx"))

    counts = {"train": n_train, "val": n_val, "test": n_test}
    total = 0
    for split, n_mols in counts.items():
        mols = []
        for _ in range(n_mols):
            n = rng.randint(6, 14)
            adj = np.zeros((n, n), dtype=np.int64)
            for j in range(n - 1):
                t = rng.randint(1, 4)
                adj[j, j + 1] = adj[j + 1, j] = t
            # a few ring closures -> cycles for the ids to count
            if n > 5:
                adj[0, 4] = adj[4, 0] = 1
            # target correlated with triangle-ish structure + noise
            y = float(adj.sum()) / n + rng.randn() * 0.1
            mols.append({
                "atom_type": torch.tensor(rng.randint(0, 28, n)),
                "bond_type": torch.tensor(adj),
                "logP_SA_cycle_normalized": torch.tensor(y),
            })
        with open(os.path.join(base, "molecules", f"{split}.pickle"),
                  "wb") as f:
            pickle.dump(mols, f)
        with open(os.path.join(base, "indices", f"{split}.index"),
                  "w") as f:
            f.write(",".join(map(str, range(n_mols))))
        total += n_mols

    # onesplit (fold -1) index files over the concatenated order
    tr = np.arange(n_train)
    va = np.arange(n_train, n_train + n_val)
    te = np.arange(n_train + n_val, total)
    np.savetxt(os.path.join(base, "10fold_idx", "train_idx-0.txt"), tr,
               fmt="%d")
    np.savetxt(os.path.join(base, "10fold_idx", "val_idx-0.txt"), va,
               fmt="%d")
    np.savetxt(os.path.join(base, "10fold_idx", "test_idx-0.txt"), te,
               fmt="%d")
    return base


@pytest.mark.slow
def test_zinc_cli_pipeline(tmp_path):
    make_zinc_fixture(str(tmp_path))
    argv = [
        "--seed", "0", "--onesplit", "True",
        "--dataset", "chemical", "--dataset_name", "ZINC",
        "--root_folder", str(tmp_path),
        "--cache_folder", str(tmp_path / "cache"),
        "--id_type", "cycle_graph", "--induced", "False", "--k", "6",
        "--id_scope", "global", "--id_encoding", "one_hot_unique",
        "--id_embedding", "one_hot_encoder",
        "--input_node_encoder", "one_hot_encoder",
        "--edge_encoder", "one_hot_encoder",
        "--model_name", "GSN_edge_sparse", "--msg_kind", "general",
        "--num_layers", "2", "--d_out", "16", "--dropout_features", "0",
        "--final_projection", "False", "--jk_mlp", "True",
        "--readout", "sum", "--batch_size", "16", "--num_epochs", "6",
        "--eval_frequency", "5", "--lr", "1e-3",
        "--scheduler", "ReduceLROnPlateau", "--decay_rate", "0.5",
        "--patience", "2", "--min_lr", "1e-5",
        "--regression", "True", "--loss_fn", "L1Loss",
        "--prediction_fn", "L1Loss", "--mode", "train",
    ]
    results = main(vars(build_parser().parse_args(argv)))
    hist = results[0]
    # regression metric = summed L1 / |D|; must be finite and non-absurd
    assert np.isfinite(hist["test_accs"]).all()
    assert hist["val_losses"], "val split must be used"
    assert hist["test_accs"][-1] < 10.0
