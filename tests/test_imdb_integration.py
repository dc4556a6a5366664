"""IMDBBINARY integration: the reference's TU benchmark config
(README.md:99 — GSN gin, complete_graph motifs k<=5, edge-scope counts,
4 layers d_out 64, mean readout) trained briefly on the bundled fold-0
split must clearly beat chance.  Full 10-fold/300-epoch runs reproduce
77.8% +/- 3.3%; this trimmed version is a smoke-level accuracy gate."""

import numpy as np
import pytest

from gsn_tpu.config import GSNConfig
from gsn_tpu.data.encoding import encode
from gsn_tpu.data.pipeline import prepare_dataset
from gsn_tpu.data.splits import separate_data_given_split
from gsn_tpu.graphs.batching import iterate_batches
from gsn_tpu.train.loop import Trainer, TrainerConfig

IMDB = "/root/reference/datasets/social/IMDBBINARY"


@pytest.mark.slow
def test_imdb_fold0_accuracy(tmp_path):
    graphs, num_classes, sizes = prepare_dataset(
        IMDB, "social", "IMDBBINARY", id_scope="local",
        id_type="complete_graph", k=5, induced=False,
        num_processes=8, cache_root=str(tmp_path))
    graphs, _eid, d_id, _ed, _dd = encode(graphs, "one_hot_unique")
    in_features = graphs[0]["x"].shape[1]

    train, test, _val = separate_data_given_split(graphs, IMDB, 0)

    cfg = GSNConfig(
        model_name="GSN_sparse", num_layers=4, d_out=64,
        out_features=num_classes, msg_kind="gin", id_scope="local",
        id_embedding="one_hot_encoder", readout="mean",
        final_projection=[True], jk_mlp=False, dropout_features=0.0,
        in_features=in_features, d_in_id=d_id)
    tcfg = TrainerConfig(
        lr=1e-3, batch_size=32, num_epochs=12, num_iters=50,
        scheduler="StepLR", decay_steps=10, decay_rate=0.5,
        eval_frequency=11, caps_mode="tight", seed=0)

    trainer = Trainer(cfg, tcfg, train)
    example = next(iterate_batches(train, tcfg.batch_size))
    state = trainer.init_state(example, seed=0)
    state, hist = trainer.fit(state, train, test, log_fn=None)

    acc = hist["test_accs"][-1]
    assert acc >= 0.62, f"IMDB fold0 test accuracy {acc:.3f} too low"
