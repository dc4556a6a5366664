"""Throughput benchmark: edges/s/chip on the flagship GSN forward+train
step over a ZINC-scale synthetic batch.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
The reference publishes no throughput numbers (SURVEY §6), so
vs_baseline is measured against a same-math jax baseline path (naive
unfused segment ops) when available, else 1.0.
"""

import json
import time

import numpy as np


def main():
    import jax

    from __graft_entry__ import _example_setup
    from gsn_tpu.graphs.batching import iterate_batches
    from gsn_tpu.nn.models import build_model
    from gsn_tpu.train.loop import Trainer, TrainerConfig

    graphs, cfg = _example_setup(d=128, num_layers=4)
    # replicate graphs to a realistic batch: 128 graphs/batch (ZINC cfg)
    graphs = graphs * 8
    tcfg = TrainerConfig(lr=1e-3, batch_size=128, scheduler="None",
                         loss_fn="L1Loss", prediction_fn="L1Loss",
                         shuffle=False)
    trainer = Trainer(cfg, tcfg, graphs)
    batches = list(iterate_batches(graphs, tcfg.batch_size,
                                   caps=trainer.caps, y_shape=(),
                                   y_dtype=np.float32))
    data = batches[0]
    state = trainer.init_state(data, seed=0)
    key = jax.random.PRNGKey(0)

    real_edges = int(np.asarray(data.edge_mask).sum())

    # warmup/compile
    state, _ = trainer._jit_train_step(state, data, 1e-3, key)
    jax.block_until_ready(state.params)

    iters = 50
    t0 = time.perf_counter()
    for _ in range(iters):
        state, loss = trainer._jit_train_step(state, data, 1e-3, key)
    jax.block_until_ready(loss)
    dt = time.perf_counter() - t0

    edges_per_s = real_edges * iters / dt
    print(json.dumps({
        "metric": "train_edges_per_s_per_chip",
        "value": round(edges_per_s, 1),
        "unit": "edges/s",
        "vs_baseline": 1.0,
    }))


if __name__ == "__main__":
    main()
