"""Multi-seed ZINC evaluation (reference scripts/ZINC_10_runs_{100K,500K}.py).

Re-invokes the programmatic driver for seeds 0..9 with the published
GSN-e ZINC config and reports mean +/- std of the final test MAE.
``--budget 100K`` uses d_out=64 (~100K params), ``500K`` uses d_out=150.
Requires the ZINC molecules pickles (see reference README) under
``<root>/chemical/ZINC/molecules``.
"""

import argparse

import numpy as np

from gsn_tpu.cli import build_parser, main


def run(budget: str = "100K", root_folder: str = "./datasets",
        cache_folder: str | None = None, num_epochs: int = 1000,
        seeds=range(10)):
    d_out = 64 if budget == "100K" else 150
    scores = []
    for seed in seeds:
        argv = [
            "--seed", str(seed), "--onesplit", "True",
            "--dataset", "chemical", "--dataset_name", "ZINC",
            "--root_folder", root_folder,
            "--id_type", "cycle_graph", "--induced", "False", "--k", "8",
            "--id_scope", "global", "--id_encoding", "one_hot_unique",
            "--id_embedding", "one_hot_encoder",
            "--input_node_encoder", "one_hot_encoder",
            "--edge_encoder", "one_hot_encoder",
            "--model_name", "GSN_edge_sparse", "--msg_kind", "general",
            "--num_layers", "4", "--d_out", str(d_out),
            "--dropout_features", "0", "--final_projection", "False",
            "--jk_mlp", "True", "--readout", "sum",
            "--batch_size", "128", "--num_epochs", str(num_epochs),
            "--lr", "1e-3", "--scheduler", "ReduceLROnPlateau",
            "--decay_rate", "0.5", "--patience", "5", "--min_lr", "1e-5",
            "--regression", "True", "--loss_fn", "L1Loss",
            "--prediction_fn", "L1Loss", "--mode", "train",
            "--return_scores",
        ]
        if cache_folder:
            argv += ["--cache_folder", cache_folder]
        args = vars(build_parser().parse_args(argv))
        out = main(args)
        scores.append(out["last_test_mean"])
        print(f"seed {seed}: test MAE {scores[-1]:.4f}")
    print(f"ZINC {budget}: {np.mean(scores):.4f} +/- {np.std(scores):.4f}")
    return scores


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--budget", choices=["100K", "500K"], default="100K")
    p.add_argument("--root_folder", default="./datasets")
    p.add_argument("--cache_folder", default=None)
    p.add_argument("--num_epochs", type=int, default=1000)
    a = p.parse_args()
    run(a.budget, a.root_folder, a.cache_folder, a.num_epochs)
