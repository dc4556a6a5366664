"""On-device numerics check: slab-kernel batching vs plain XLA batching
must agree on the real TPU (CPU tests run the kernels in interpret mode
and XLA-CPU keeps f32 everywhere, so TPU-only precision hazards — e.g.
bf16 default matmul precision — are only visible here).

Prints max |Δ| of eval outputs and of one train-step loss, plus step
timings.  Exits nonzero if outputs diverge beyond f32 tolerance.
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

from bench import BATCH_GRAPHS, make_zinc_like  # noqa: E402
from gsn_tpu.config import GSNConfig  # noqa: E402
from gsn_tpu.graphs.batching import (iterate_batches,  # noqa: E402
                                     tight_epoch_caps)
from gsn_tpu.train.loop import Trainer, TrainerConfig  # noqa: E402


def run(bn_mlp: bool):
    graphs, d_id = make_zinc_like(BATCH_GRAPHS)
    cfg = GSNConfig(
        model_name="GSN_edge_sparse", num_layers=4, d_out=128,
        out_features=1, msg_kind="general", id_scope="global",
        bn_mlp=bn_mlp,
        id_embedding="one_hot_encoder", input_node_encoder="embedding",
        edge_encoder="embedding", readout="sum",
        in_features=1, d_in_node_encoder=[28], d_in_edge_encoder=[4],
        d_in_id=d_id)
    tcfg = TrainerConfig(lr=1e-3, batch_size=BATCH_GRAPHS,
                         scheduler="None", loss_fn="L1Loss",
                         prediction_fn="L1Loss", shuffle=False)
    trainer = Trainer(cfg, tcfg, graphs)
    caps = tight_epoch_caps(np.arange(len(graphs)), graphs, BATCH_GRAPHS)
    data_slab = next(iterate_batches(
        graphs, BATCH_GRAPHS, caps=caps, y_shape=(), y_dtype=np.float32,
        mxu_layout={"mode": "slab", "flow": "source_to_target",
                    "block_n": 128, "block_e": 256}))
    data_plain = next(iterate_batches(
        graphs, BATCH_GRAPHS, caps=caps, y_shape=(), y_dtype=np.float32))
    assert data_slab.pool_recv_local is not None, "pool metadata missing"

    state = trainer.init_state(data_plain, seed=0)

    (y_slab, _, _), l_slab, *_ = trainer._jit_eval_step(state, data_slab)
    (y_plain, _, _), l_plain, *_ = trainer._jit_eval_step(state,
                                                          data_plain)
    gm = np.asarray(data_plain.graph_mask)
    dy = float(np.max(np.abs(np.asarray(y_slab)[gm]
                             - np.asarray(y_plain)[gm])))
    scale = float(np.max(np.abs(np.asarray(y_plain)[gm])) + 1e-9)

    key = jax.random.PRNGKey(0)
    s1, loss_slab = trainer._jit_train_step(state, data_slab, 1e-3, key)
    s2, loss_plain = trainer._jit_train_step(state, data_plain, 1e-3, key)
    dl = abs(float(loss_slab) - float(loss_plain))

    # one raw-gradient comparison (post-Adam params are meaningless on
    # zero-grad leaves; compare the losses after a few coupled steps
    # instead, each path evolving its own state)
    for _ in range(5):
        s1, loss_slab = trainer._jit_train_step(s1, data_slab, 1e-3, key)
        s2, loss_plain = trainer._jit_train_step(s2, data_plain, 1e-3, key)
    dl5 = abs(float(loss_slab) - float(loss_plain))

    import time as _t
    t0 = _t.perf_counter()
    for _ in range(10):
        s1, loss_slab = trainer._jit_train_step(s1, data_slab, 1e-3, key)
    jax.block_until_ready(loss_slab)
    ms = (_t.perf_counter() - t0) / 10 * 1e3

    out = {"bn_mlp": bn_mlp, "eval_max_abs_diff": dy,
           "eval_out_scale": scale, "loss_diff_step1": dl,
           "loss_diff_step6": dl5, "train_ms_per_step": round(ms, 2),
           "backend": jax.default_backend()}
    print(json.dumps(out))
    rel = dy / scale
    if rel > 2e-4:
        print(f"FAIL: relative eval divergence {rel:.2e} (bn_mlp={bn_mlp})")
        return False
    print(f"PASS (bn_mlp={bn_mlp})")
    return True


def main():
    ok = run(bn_mlp=False)
    ok = run(bn_mlp=True) and ok
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
