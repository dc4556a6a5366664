"""DGN molhiv 10-seed protocol — counterpart of reference
``directional_gsn/molhiv_10_runs.sh`` (flags transcribed 1:1 from that
script; the JSON config it loads is mirrored by cli_directional's
defaults).

Runs `gsn_tpu.cli_directional` 10 times with seeds 1..10 and reports
mean ± std of the best-val test ROC-AUC — the published-results row
(reference README.md:162) to reproduce the moment ogbg-molhiv raw data
becomes fetchable (zero-egress today; the pipeline itself is verified on
exact-format synthetic fixtures, tests/test_molhiv_pipeline.py).

Usage:
    python scripts/dgn_molhiv_10_runs.py --data_root <dir> [--device cpu]
        [--use_mxu True] [--compute_dtype bfloat16]
"""

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from gsn_tpu.cli_directional import build_parser, main  # noqa: E402


def run(argv=None):
    outer = argparse.ArgumentParser()
    outer.add_argument("--data_root", default="./datasets/ogb")
    outer.add_argument("--device", default="default")
    outer.add_argument("--use_mxu", default="True")
    outer.add_argument("--compute_dtype", default=None)
    outer.add_argument("--epochs", type=int, default=200)
    outer.add_argument("--seeds", type=int, default=10)
    oargs = outer.parse_args(argv)

    # the reference shell script's flag set, verbatim
    flags = [
        "--weight_decay", "3e-6", "--L", "4", "--type_net", "simple",
        "--hidden_dim", "60", "--out_dim", "60", "--residual", "True",
        "--edge_feat", "False", "--readout", "mean",
        "--in_feat_dropout", "0.0", "--dropout", "0.3",
        "--graph_norm", "False", "--batch_norm", "True",
        "--aggregators", "mean max min dir0-av dir1-av dir2-av dir3-av",
        "--scalers", "identity", "--dataset", "ogbg-molhiv",
        "--epochs", str(oargs.epochs), "--init_lr", "0.01",
        "--lr_reduce_factor", "0.5", "--lr_schedule_patience", "20",
        "--min_lr", "0.0001", "--id_scope", "local", "--k", "6",
        "--id_type", "cycle_graph", "--directions", "subgraphs",
        "--data_root", oargs.data_root, "--device", oargs.device,
        "--use_mxu", oargs.use_mxu,
    ]
    if oargs.compute_dtype:
        flags += ["--compute_dtype", oargs.compute_dtype]

    rocs = []
    for seed in range(1, oargs.seeds + 1):
        args = vars(build_parser().parse_args(flags + ["--seed",
                                                       str(seed)]))
        best = main(args)           # (epoch, val_roc, test_roc)
        if best is None:
            raise SystemExit(
                f"seed {seed}: no epochs ran (epochs=0 or max_time hit "
                "before epoch 1) — cannot report a best-val ROC")
        rocs.append(best[2])
        print(f"[10runs] seed {seed}: test ROC {best[2]:.4f}",
              flush=True)
    print(json.dumps({
        "metric": "molhiv_test_rocauc",
        "mean": round(float(np.mean(rocs)), 4),
        "std": round(float(np.std(rocs)), 4),
        "runs": [round(float(r), 4) for r in rocs],
    }))


if __name__ == "__main__":
    run()
