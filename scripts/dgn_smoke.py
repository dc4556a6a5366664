"""DGN on-chip smoke + throughput (VERDICT r2 weak #6/next #7).

Two parts, both on the DEFAULT platform (the real TPU through the axon
tunnel; pass --device cpu for a host dry run):

1. **CLI smoke** — drives the REAL ``gsn_tpu.cli_directional`` driver
   end-to-end (raw OGB csv parse -> counting -> direction assembly ->
   DGN train epochs -> ROC-AUC eval -> Plateau-on(-val ROC)) on a
   synthetic molhiv-format fixture (zero-egress stand-in for the OGB
   download), with the reference flagship aggregator set
   ``mean max min dir0-av dir1-av dir2-av dir3-av`` over the subgraph
   -count vector field (reference directional_gsn/molhiv_10_runs.sh:4).

2. **Layer throughput** — edges/s of the full 7-aggregator DGN train
   step at molhiv scale (reference hot loop dgn_layer.py:42-53), timed
   with gsn_tpu.timing (value-fetch barrier + rtt subtraction).

Prints one JSON line {"dgn_smoke": ..., "dgn_edges_per_s": ...} last.
Serialize TPU jobs: do not run while another TPU process is active.
"""

import json
import os
import sys
import time

os.makedirs("/root/repo/.jax_cache", exist_ok=True)
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"))

import numpy as np  # noqa: E402


def cli_smoke(device):
    """Run the real DGN driver on the synthetic molhiv raw layout."""
    import shutil
    import tempfile

    from test_molhiv_pipeline import make_molhiv_fixture

    from gsn_tpu import cli_directional

    root = tempfile.mkdtemp(prefix="dgn_smoke_")
    try:
        base = make_molhiv_fixture(root, n_graphs=48, seed=0)
        # the driver reads fold-1 index files (reference main_HIV uses
        # the exported OGB scaffold split)
        for name in ("train_idx", "val_idx", "test_idx"):
            shutil.copy(os.path.join(base, "10fold_idx", f"{name}-0.txt"),
                        os.path.join(base, "10fold_idx", f"{name}-1.txt"))
        args = {a.dest: a.default for a in
                cli_directional.build_parser()._actions
                if a.dest != "help"}
        args.update({
            "data_root": os.path.join(root, "ogb"),
            "dataset": "ogbg-molhiv",
            "cache_folder": os.path.join(root, "cache"),
            "epochs": 3, "batch_size": 16, "L": 2, "hidden_dim": 24,
            "out_dim": 24, "device": device,
            "aggregators": "mean max min dir0-av dir1-av dir2-av dir3-av",
            "directions": "subgraphs", "id_type": "cycle_graph", "k": 6,
            "induced": True, "id_scope": "local",
        })
        best = cli_directional.main(args)   # (epoch, val_roc, test_roc)
        return {"ok": True,
                "test_roc": round(float(best[2]), 4) if best else None}
    finally:
        shutil.rmtree(root, ignore_errors=True)


def layer_throughput(device, num_graphs=512, iters=20):
    """Full DGN train step (7 aggregators x 2 scalers default? —
    reference molhiv config uses scalers=identity) at molhiv scale."""
    import jax

    from test_dgn import _mol_like_graphs

    from gsn_tpu.data.directional import assemble_directions
    from gsn_tpu.graphs.batching import iterate_batches
    from gsn_tpu.nn.dgn import DGNConfig, DGNNet, compute_avg_d
    from gsn_tpu.timing import device_sync, fetch_rtt
    from gsn_tpu.train.loop import Trainer, TrainerConfig

    graphs = _mol_like_graphs(num=num_graphs, seed=3)
    graphs = assemble_directions(graphs, directions=("subgraphs",),
                                 id_scope="local")
    avg_d = compute_avg_d(graphs)
    cfg = DGNConfig(
        hidden_dim=70, out_dim=70, num_layers=4,
        aggregators=("mean", "max", "min", "dir0-av", "dir1-av",
                     "dir2-av", "dir3-av"),
        scalers=("identity",), avg_d=avg_d, dropout=0.0, out_features=1)
    model = DGNNet(cfg)
    tcfg = TrainerConfig(lr=1e-3, batch_size=num_graphs,
                         scheduler="None", loss_fn="BCEWithLogitsLoss",
                         prediction_fn="None", shuffle=False)
    trainer = Trainer(cfg, tcfg, graphs, model=model)
    data = next(iterate_batches(
        graphs, num_graphs, y_shape=(), y_dtype=np.float32,
        mxu_layout={"mode": "slab", "flow": "source_to_target",
                    "block_n": 128, "block_e": 256}))
    assert data.seg_mode == "slab", "slab metadata must build"
    real_edges = int(np.asarray(data.edge_mask).sum())
    data = jax.device_put(data)
    state = trainer.init_state(data, seed=0)
    key = jax.random.PRNGKey(0)
    state, loss = trainer._jit_train_step(state, data, 1e-3, key)
    device_sync(loss)
    rtt = fetch_rtt(loss)
    t0 = time.perf_counter()
    for _ in range(iters):
        state, loss = trainer._jit_train_step(state, data, 1e-3, key)
    device_sync(loss)
    dt = time.perf_counter() - t0 - rtt
    return real_edges * iters / dt


def main():
    device = "cpu" if "--device=cpu" in sys.argv or \
        ("--device" in sys.argv and "cpu" in sys.argv) else None
    if device == "cpu":
        import jax
        jax.config.update("jax_platforms", "cpu")
    import jax
    print(f"[dgn_smoke] platform: {jax.devices()[0].platform}",
          flush=True)

    smoke = cli_smoke(device)
    print(f"[dgn_smoke] cli_directional end-to-end: {smoke}", flush=True)
    eps = layer_throughput(device)
    print(f"[dgn_smoke] 7-aggregator DGN train step: "
          f"{eps:.3e} edges/s", flush=True)
    print(json.dumps({"dgn_smoke": smoke, "dgn_edges_per_s": round(
        eps, 1)}))


if __name__ == "__main__":
    main()
