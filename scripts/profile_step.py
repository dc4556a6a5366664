"""Capture an xplane profile + wall-clock breakdown of the bench train
step on the real TPU.

Writes traces under profiles/<name>/ and prints a JSON summary with
compile times and per-step wall-clock for: full train step, eval
(forward-only) step.  Analyze offline with scripts/analyze_profile.py.
"""

import json
import os
import sys
import time

os.makedirs("/root/repo/.jax_cache", exist_ok=True)
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

sys.path.insert(0, "/root/repo")

import jax  # noqa: E402
import numpy as np  # noqa: E402

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

from bench import (BATCH_GRAPHS, make_molhiv_like,  # noqa: E402
                   make_zinc_like)
from gsn_tpu.config import GSNConfig  # noqa: E402
from gsn_tpu.graphs.batching import (iterate_batches,  # noqa: E402
                                     tight_epoch_caps)
from gsn_tpu.train.loop import Trainer, TrainerConfig  # noqa: E402

ITERS = 20


def timed(fn, *a):
    from gsn_tpu.timing import device_sync
    t0 = time.perf_counter()
    out = fn(*a)
    device_sync(out)
    return out, time.perf_counter() - t0


def main():
    bf16 = "--bf16" in sys.argv
    molhiv = "--molhiv" in sys.argv
    dgn = "--dgn" in sys.argv
    summary = {"backend": jax.default_backend(), "bf16": bf16,
               "workload": ("dgn" if dgn else
                            "molhiv" if molhiv else "zinc")}
    model = None
    if dgn:
        from bench import make_dgn_like
        from gsn_tpu.nn.dgn import DGNConfig, DGNNet, compute_avg_d
        graphs = make_dgn_like(BATCH_GRAPHS)
        cfg = DGNConfig(
            hidden_dim=70, out_dim=70, num_layers=4,
            aggregators=("mean", "max", "min", "dir0-av", "dir1-av",
                         "dir2-av", "dir3-av"),
            scalers=("identity",), avg_d=compute_avg_d(graphs),
            dropout=0.3, out_features=1,
            compute_dtype="bfloat16" if bf16 else None,
            dropout_rng="rbg" if bf16 else "threefry")
        model = DGNNet(cfg)
        tcfg = TrainerConfig(lr=1e-3, batch_size=BATCH_GRAPHS,
                             scheduler="None",
                             loss_fn="BCEWithLogitsLoss",
                             prediction_fn="None", shuffle=False)
    elif molhiv:
        graphs, d_id = make_molhiv_like(BATCH_GRAPHS)
        cfg = GSNConfig(
            model_name="GSN_edge_sparse_ogb", num_layers=5, d_out=300,
            d_h=600, out_features=1, msg_kind="ogb", id_scope="local",
            vn=True, dropout_features=0.5, readout="mean",
            final_projection=[False], jk_mlp=False,
            id_embedding="embedding", d_out_id_embedding=300,
            input_node_encoder="atom_encoder", edge_encoder="bond_encoder",
            input_vn_encoder="embedding",
            compute_dtype="bfloat16" if bf16 else None,
            in_features=9, in_edge_features=3, d_in_id=d_id)
        tcfg = TrainerConfig(lr=1e-3, batch_size=BATCH_GRAPHS,
                             scheduler="None",
                             loss_fn="BCEWithLogitsLoss",
                             prediction_fn="None", shuffle=False)
    else:
        graphs, d_id = make_zinc_like(BATCH_GRAPHS)
        cfg = GSNConfig(
            model_name="GSN_edge_sparse", num_layers=4, d_out=128,
            out_features=1, msg_kind="general", id_scope="global",
            bn_mlp=False, id_embedding="one_hot_encoder",
            input_node_encoder="embedding", edge_encoder="embedding",
            readout="sum", compute_dtype="bfloat16" if bf16 else None,
            in_features=1, d_in_node_encoder=[28], d_in_edge_encoder=[4],
            d_in_id=d_id)
        tcfg = TrainerConfig(lr=1e-3, batch_size=BATCH_GRAPHS,
                             scheduler="None", loss_fn="L1Loss",
                             prediction_fn="L1Loss", shuffle=False)
    trainer = Trainer(cfg, tcfg, graphs, model=model)
    caps = tight_epoch_caps(np.arange(len(graphs)), graphs, BATCH_GRAPHS)
    data = next(iterate_batches(
        graphs, BATCH_GRAPHS, caps=caps, y_shape=(), y_dtype=np.float32,
        mxu_layout={"mode": "slab", "flow": "source_to_target",
                    "block_n": 128, "block_e": 256}))
    summary["real_edges"] = int(np.asarray(data.edge_mask).sum())
    # ship the batch once; otherwise every step re-uploads host numpy
    # through the tunnel and wall-clock measures transfer, not compute
    data = jax.device_put(data)

    state = trainer.init_state(data, seed=0)
    key = jax.random.PRNGKey(0)

    # --- compile + time the full train step ---------------------------
    (state, _), dt_c = timed(trainer._jit_train_step, state, data, 1e-3,
                             key)
    summary["train_compile_s"] = round(dt_c, 2)
    from gsn_tpu.timing import device_sync, fetch_rtt
    for _ in range(3):
        state, loss = trainer._jit_train_step(state, data, 1e-3, key)
    rtt = fetch_rtt(loss)
    t0 = time.perf_counter()
    for _ in range(ITERS):
        state, loss = trainer._jit_train_step(state, data, 1e-3, key)
    device_sync(loss)
    summary["train_ms_per_step"] = round(
        (time.perf_counter() - t0 - rtt) / ITERS * 1e3, 2)

    # --- eval (forward-only) step --------------------------------------
    out, dt_c = timed(trainer._jit_eval_step, state, data)
    summary["eval_compile_s"] = round(dt_c, 2)
    rtt = fetch_rtt(out)
    t0 = time.perf_counter()
    for _ in range(ITERS):
        out = trainer._jit_eval_step(state, data)
    device_sync(out)
    summary["eval_ms_per_step"] = round(
        (time.perf_counter() - t0 - rtt) / ITERS * 1e3, 2)

    # --- trace a few steps of each ------------------------------------
    trace_dir = "/root/repo/profiles/step"
    if dgn:
        trace_dir += "_dgn"
    elif molhiv:
        trace_dir += "_molhiv"
    if bf16:
        trace_dir += "_bf16"
    os.makedirs(trace_dir, exist_ok=True)
    with jax.profiler.trace(trace_dir):
        for _ in range(5):
            state, loss = trainer._jit_train_step(state, data, 1e-3, key)
        device_sync(loss)
        for _ in range(5):
            out = trainer._jit_eval_step(state, data)
        device_sync(out)
    summary["trace_dir"] = trace_dir

    print(json.dumps(summary))


if __name__ == "__main__":
    main()
