"""Worker process for tests/test_multiprocess.py.

Run as: python mp_worker.py <pid> <nproc> <port> <outdir> <mode>

Joins a local jax.distributed cluster (gloo CPU collectives, 2 virtual
devices per process), runs 3 DP or EP train steps on a deterministic
synthetic dataset, and dumps {losses, checksum} to <outdir>/rank<pid>.json
for the parent test to compare against the single-process oracle.
"""

import json
import os
import sys

if __name__ == "__main__":
    # before the (lazy) backend init of this worker process — and ONLY
    # when run as a worker: the parent test imports this module too, and
    # overwriting its XLA_FLAGS would shrink the parent's 8-device mesh
    _n = os.environ.get("MP_WORKER_LOCAL_DEVICES", "2")
    os.environ["XLA_FLAGS"] = (
        f"--xla_force_host_platform_device_count={_n}")

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_STEPS = 3
LR = 0.01


def build_dataset():
    """Deterministic small GSN dataset (same on every process)."""
    from gsn_tpu.data.encoding import encode
    from gsn_tpu.data.pipeline import generate_dataset
    from gsn_tpu.graphs.patterns import cycle_graph
    from test_train import make_synthetic_dataset

    graphs = make_synthetic_dataset(n_per_class=16, seed=0)
    vocab = [cycle_graph(3), cycle_graph(4)]
    graphs, _ = generate_dataset(graphs, vocab, id_scope="global")
    graphs, _eid, d_id, _ed, _dd = encode(graphs, "one_hot_unique")
    return graphs, d_id


def build_cfg(d_id):
    from gsn_tpu.config import GSNConfig
    return GSNConfig(model_name="GSN_sparse", num_layers=2, d_out=16,
                     out_features=2, msg_kind="general",
                     id_scope="global", bn=True, in_features=1,
                     d_in_id=d_id)


def checksum(tree):
    import jax
    import numpy as np
    total = 0.0
    for leaf in jax.tree_util.tree_leaves(tree):
        total += float(np.sum(np.abs(np.asarray(leaf, np.float64))))
    return total


def run_dp(mesh, graphs, d_id, fetch):
    import jax
    import numpy as np
    from gsn_tpu.parallel import distributed as dist
    from gsn_tpu.parallel.dp import DataParallelTrainer, make_global_batch

    D = mesh.shape["dp"]
    batch = dist.make_process_dp_batch(
        graphs[:32], mesh, node_cap=128, edge_cap=256, graph_cap=8,
        axis="dp")
    # host-side local example for (deterministic, replicated) init: one
    # addressable shard, which already carries the leading device axis
    local_example = jax.tree_util.tree_map(
        lambda x: np.asarray(x.addressable_shards[0].data), batch)
    trainer = DataParallelTrainer(build_cfg(d_id), mesh, lr=LR,
                                  loss_fn="CrossEntropyLoss")
    state = trainer.init_state(local_example)
    gsum = checksum(fetch(trainer.grads(state, batch)))
    losses = []
    for step in range(N_STEPS):
        state, loss = trainer.train_step(state, batch, LR,
                                         jax.random.PRNGKey(step))
        losses.append(float(np.asarray(fetch(loss))))
    return losses, checksum(fetch(state.params)), gsum


def run_ep(mesh_ep, graphs, d_id, fetch):
    import jax
    import numpy as np
    from gsn_tpu.graphs.batching import iterate_batches
    from gsn_tpu.parallel import distributed as dist
    from gsn_tpu.parallel.ep import EdgePartitionedTrainer, make_ep_batch

    D = mesh_ep.shape["ep"]
    data = next(iterate_batches(graphs[:32], 32, caps=(512, 1024, 32)))
    # every process computes the identical host-side partition, then
    # keeps only its own rows
    ep_stacked = make_ep_batch(data, D, flow="source_to_target")
    batch = dist.shard_stacked_batch(ep_stacked, mesh_ep, axis="ep")
    trainer = EdgePartitionedTrainer(build_cfg(d_id), mesh_ep, lr=LR,
                                     loss_fn="CrossEntropyLoss")
    local_example = jax.tree_util.tree_map(
        lambda x: np.asarray(x.addressable_shards[0].data), batch)
    state = trainer.init_state(local_example)
    gsum = checksum(fetch(trainer.grads(state, batch)))
    losses = []
    for step in range(N_STEPS):
        state, loss = trainer.train_step(state, batch, LR,
                                         jax.random.PRNGKey(step))
        losses.append(float(np.asarray(fetch(loss))))
    return losses, checksum(fetch(state.params)), gsum


def main():
    pid, nproc, port = int(sys.argv[1]), int(sys.argv[2]), int(sys.argv[3])
    outdir, mode = sys.argv[4], sys.argv[5]
    from gsn_tpu.parallel import distributed as dist
    dist.initialize(f"127.0.0.1:{port}", nproc, pid, platform="cpu")
    import jax
    assert jax.process_count() == nproc
    expect_local = int(os.environ.get("MP_WORKER_LOCAL_DEVICES", "2"))
    assert len(jax.local_devices()) == expect_local

    graphs, d_id = build_dataset()
    if mode == "dp":
        mesh = dist.global_mesh("dp")
        losses, ck, gsum = run_dp(mesh, graphs, d_id,
                                  dist.fetch_replicated)
    else:
        mesh = dist.global_mesh("ep")
        losses, ck, gsum = run_ep(mesh, graphs, d_id,
                                  dist.fetch_replicated)

    with open(os.path.join(outdir, f"rank{pid}.json"), "w") as f:
        json.dump({"losses": losses, "checksum": ck, "grad_checksum": gsum,
                   "n_devices": len(jax.devices())}, f)
    from jax.experimental import multihost_utils
    multihost_utils.sync_global_devices("done")


if __name__ == "__main__":
    main()
