"""End-to-end SR(25,12,5,6) isomorphism test — the reference's flagship
correctness fixture (README: GSN-e with induced 6-cycle graphlets gets 0%
failure; a 1-WL MPNN gets 100%).  Reference command at README.md:82-90.
"""

import numpy as np
import pytest

from gsn_tpu.config import GSNConfig
from gsn_tpu.data.encoding import encode
from gsn_tpu.data.loaders import load_g6_graphs
from gsn_tpu.data.pipeline import generate_dataset
from gsn_tpu.graphs.patterns import resolve_pattern_vocabulary
from gsn_tpu.train.isomorphism import run_isomorphism_test

SR_PATH = "/root/reference/datasets/SR_graphs/sr251256"


@pytest.fixture(scope="module")
def sr_graphs_encoded():
    graphs, num_classes = load_g6_graphs(SR_PATH, "sr251256")
    vocab = resolve_pattern_vocabulary("cycle_graph", [6])
    graphs, sizes = generate_dataset(
        graphs, vocab, id_scope="local", induced=True)
    graphs, _enc, d_id, _encd, _dd = encode(graphs, "one_hot_unique")
    return graphs, num_classes, d_id


def _base_cfg(num_classes, d_id, model_name):
    # reference SR command: GSN_sparse, local scope, general msg, 2 layers,
    # d_out 64, bn False, sum readout, final_projection False, jk_mlp True
    return GSNConfig(
        model_name=model_name,
        num_layers=2,
        d_out=64,
        out_features=num_classes,
        msg_kind="general",
        id_scope="local",
        id_embedding="one_hot_encoder",
        bn=False,
        readout="sum",
        final_projection=[False],
        jk_mlp=True,
        in_features=1,
        d_in_id=d_id,
    )


def test_gsn_distinguishes_all_sr_pairs(sr_graphs_encoded):
    graphs, num_classes, d_id = sr_graphs_encoded
    cfg = _base_cfg(num_classes, d_id, "GSN_sparse")
    pairs, fails, frac = run_isomorphism_test(graphs, cfg, seed=0)
    assert pairs == 15 * 14 // 2
    assert fails == 0, f"GSN failed to distinguish {fails}/{pairs} pairs"


def test_mpnn_fails_all_sr_pairs(sr_graphs_encoded):
    graphs, num_classes, d_id = sr_graphs_encoded
    cfg = _base_cfg(num_classes, d_id, "MPNN_sparse")
    pairs, fails, frac = run_isomorphism_test(graphs, cfg, seed=0)
    assert fails == pairs, (
        f"1-WL MPNN distinguished {pairs - fails} SR pairs; expected none")
