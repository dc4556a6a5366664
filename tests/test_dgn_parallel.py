"""DGN multi-device execution (VERDICT r4 #4): the directional model
under data-parallel shard_map (ParallelTrainer mode='dp') must match the
single-device DGN trainer — cross-replica BN stats + global loss make
the math identical to one big batch."""

import numpy as np
import pytest

from gsn_tpu.data.directional import assemble_directions
from gsn_tpu.graphs.batching import iterate_batches
from gsn_tpu.nn.dgn import DGNConfig, DGNNet, compute_avg_d
from gsn_tpu.parallel.mesh import make_mesh
from gsn_tpu.parallel.trainer import ParallelTrainer
from gsn_tpu.train.loop import Trainer, TrainerConfig

from test_dgn import _mol_like_graphs


@pytest.fixture(scope="module")
def prepared():
    graphs = _mol_like_graphs(num=36, seed=2)
    graphs = assemble_directions(graphs, directions=("subgraphs",),
                                 id_scope="local")
    return graphs


def _cfg(avg_d, axis=None):
    return DGNConfig(hidden_dim=24, out_dim=24, num_layers=2,
                     aggregators=("mean", "max", "min", "dir1-av",
                                  "dir1-dx"),
                     avg_d=avg_d, dropout=0.0, out_features=1,
                     bn_axis_name=axis)


def _tcfg():
    return TrainerConfig(lr=5e-3, batch_size=8, num_epochs=2,
                         scheduler="ReduceLROnPlateau", patience=3,
                         loss_fn="BCEWithLogitsLoss",
                         prediction_fn="None", evaluator="rocauc",
                         seed=0, shuffle=False)


def test_dgn_dp_matches_single_device(prepared):
    graphs = prepared
    train = graphs[:28]     # 8-graph batches + a 4-graph tail on 8 devs
    avg_d = compute_avg_d(train)

    single = Trainer(_cfg(avg_d), _tcfg(), train,
                     model=DGNNet(_cfg(avg_d)))
    mesh = make_mesh(8, axis_names=("dp",))
    par = ParallelTrainer(_cfg(avg_d, "dp"), _tcfg(), train,
                          mesh=mesh, mode="dp",
                          model=DGNNet(_cfg(avg_d, "dp")))
    ex = next(iterate_batches(train, 8, y_shape=(), y_dtype=np.float32))
    ss = single.init_state(ex, seed=0)
    sp = par.init_state(ex, seed=0)

    _, loss_s = single.train_epoch(ss, train)
    _, loss_p = par.train_epoch(sp, train)
    np.testing.assert_allclose(loss_p, loss_s, rtol=1e-4)

    l_s, roc_s = single.evaluate(ss, train)
    l_p, roc_p = par.evaluate(sp, train)
    np.testing.assert_allclose(l_p, l_s, rtol=1e-5)
    np.testing.assert_allclose(roc_p, roc_s, atol=1e-8)


@pytest.mark.slow
def test_dgn_cli_parallel_dp(tmp_path):
    """cli_directional --parallel dp end-to-end on the synthetic molhiv
    fixture: trajectory matches the serial driver (dropout 0)."""
    import os

    from gsn_tpu.cli_directional import build_parser, main
    from test_molhiv_pipeline import make_molhiv_fixture

    make_molhiv_fixture(str(tmp_path))
    base = os.path.join(str(tmp_path), "ogb", "ogbg-molhiv", "10fold_idx")
    for s in ("train", "val", "test"):
        os.replace(os.path.join(base, f"{s}_idx-0.txt"),
                   os.path.join(base, f"{s}_idx-1.txt"))

    flags = ["--data_root", os.path.join(str(tmp_path), "ogb"),
             "--cache_folder", os.path.join(str(tmp_path), "cache"),
             "--device", "cpu", "--batch_size", "8", "--epochs", "2",
             "--L", "2", "--hidden_dim", "16", "--out_dim", "16",
             "--dropout", "0.0", "--multiprocessing", "False",
             "--use_mxu", "False"]
    serial = main(vars(build_parser().parse_args(flags)))
    par = main(vars(build_parser().parse_args(
        flags + ["--parallel", "dp", "--parallel_devices", "4"])))
    assert serial is not None and par is not None
    np.testing.assert_allclose(par[1], serial[1], atol=1e-6)   # val ROC
    np.testing.assert_allclose(par[2], serial[2], atol=1e-6)   # test ROC
