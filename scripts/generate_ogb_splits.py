"""Export an OGB dataset's official scaffold split to the repo's
``10fold_idx`` text format (reference ``generate_ogb_splits.py``).

Reads the standard on-disk OGB layout
(``<root>/<dataset>/split/scaffold/{train,valid,test}.csv.gz``) without
the ogb package and writes ``train_idx-1.txt`` / ``val_idx-1.txt`` /
``test_idx-1.txt`` next to the dataset.
"""

import argparse
import gzip
import os

import numpy as np


def export(dataset_dir: str, out_dir: str | None = None,
           split_name: str = "scaffold") -> None:
    split_dir = os.path.join(dataset_dir, "split", split_name)
    out_dir = out_dir or os.path.join(dataset_dir, "10fold_idx")
    os.makedirs(out_dir, exist_ok=True)
    for src, dst in [("train", "train"), ("valid", "val"),
                     ("test", "test")]:
        with gzip.open(os.path.join(split_dir, f"{src}.csv.gz"), "rt") as f:
            idx = np.array([int(line.strip()) for line in f if line.strip()])
        np.savetxt(os.path.join(out_dir, f"{dst}_idx-1.txt"), idx, fmt="%d")
        print(f"{dst}: {len(idx)} indices")


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("dataset_dir",
                   help="e.g. ./datasets/ogb/ogbg_molhiv")
    p.add_argument("--out_dir", default=None)
    p.add_argument("--split", default="scaffold")
    a = p.parse_args()
    export(a.dataset_dir, a.out_dir, a.split)
