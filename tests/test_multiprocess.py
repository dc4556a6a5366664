"""TRUE multi-process SPMD (VERDICT r3 #2): spawn 2 OS processes, each
with 2 virtual CPU devices, joined through `jax.distributed` + gloo
collectives, and prove the DP and EP train steps produce the same
numbers as the single-process virtual mesh of the same global size.

The virtual-device mesh validates SPMD semantics; only a real
multi-process run exercises the coordinator handshake, per-process batch
feeding (`make_process_dp_batch` / `shard_stacked_batch` — each process
materializes ONLY its rows), cross-process collectives, and
host-boundary hazards (metadata built per-host, replicated host inputs).
"""

import json
import os
import socket
import subprocess
import sys

import jax
import numpy as np
import pytest

TESTS = os.path.dirname(os.path.abspath(__file__))
ROOT = os.path.dirname(TESTS)
WORKER = os.path.join(TESTS, "mp_worker.py")
N_PROC = 2          # x2 local devices = 4-device global mesh
GLOBAL_DEVICES = 4


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _spawn(mode, tmp_path, n_proc=N_PROC, local_devices=2):
    env = dict(os.environ)
    env["XLA_FLAGS"] = (
        f"--xla_force_host_platform_device_count={local_devices}")
    env["MP_WORKER_LOCAL_DEVICES"] = str(local_devices)
    env.pop("JAX_PLATFORMS", None)   # worker forces cpu itself
    port = _free_port()
    procs = [subprocess.Popen(
        [sys.executable, WORKER, str(i), str(n_proc), str(port),
         str(tmp_path), mode],
        env=env, cwd=ROOT, stdout=subprocess.PIPE,
        stderr=subprocess.STDOUT) for i in range(n_proc)]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=420)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out.decode(errors="replace"))
    rcs = [p.returncode for p in procs]
    assert rcs == [0] * n_proc, (
        f"worker exit codes {rcs}\n" + "\n----\n".join(outs))
    ranks = []
    for i in range(n_proc):
        with open(os.path.join(str(tmp_path), f"rank{i}.json")) as f:
            ranks.append(json.load(f))
    return ranks


def _oracle_dp():
    """Same global computation on the single-process virtual mesh (the
    path test_parallel.py already pins against single-device)."""
    sys.path.insert(0, TESTS)
    import mp_worker
    from gsn_tpu.parallel.dp import DataParallelTrainer, make_global_batch
    from gsn_tpu.parallel.mesh import make_mesh

    graphs, d_id = mp_worker.build_dataset()
    mesh = make_mesh(GLOBAL_DEVICES)
    gb = make_global_batch(graphs[:32], GLOBAL_DEVICES, node_cap=128,
                           edge_cap=256, graph_cap=8)
    tr = DataParallelTrainer(mp_worker.build_cfg(d_id), mesh,
                             lr=mp_worker.LR,
                             loss_fn="CrossEntropyLoss")
    state = tr.init_state(gb, seed=0)
    gsum = mp_worker.checksum(tr.grads(state, gb))
    losses = []
    for step in range(mp_worker.N_STEPS):
        state, loss = tr.train_step(state, gb, mp_worker.LR,
                                    jax.random.PRNGKey(step))
        losses.append(float(loss))
    return losses, mp_worker.checksum(state.params), gsum


def _oracle_ep():
    sys.path.insert(0, TESTS)
    import mp_worker
    from gsn_tpu.graphs.batching import iterate_batches
    from gsn_tpu.parallel.ep import EdgePartitionedTrainer, make_ep_batch
    from gsn_tpu.parallel.mesh import make_mesh

    graphs, d_id = mp_worker.build_dataset()
    mesh = make_mesh(GLOBAL_DEVICES, axis_names=("ep",))
    data = next(iterate_batches(graphs[:32], 32, caps=(512, 1024, 32)))
    ep = make_ep_batch(data, GLOBAL_DEVICES, flow="source_to_target")
    tr = EdgePartitionedTrainer(mp_worker.build_cfg(d_id), mesh,
                                lr=mp_worker.LR,
                                loss_fn="CrossEntropyLoss")
    state = tr.init_state(ep, seed=0)
    gsum = mp_worker.checksum(tr.grads(state, ep))
    losses = []
    for step in range(mp_worker.N_STEPS):
        state, loss = tr.train_step(state, ep, mp_worker.LR,
                                    jax.random.PRNGKey(step))
        losses.append(float(loss))
    return losses, mp_worker.checksum(state.params), gsum


def _check(ranks, oracle):
    assert all(r["n_devices"] == GLOBAL_DEVICES for r in ranks)
    # every rank observed the identical replicated training trajectory
    np.testing.assert_allclose(ranks[0]["losses"], ranks[1]["losses"],
                               rtol=1e-6)
    np.testing.assert_allclose(ranks[0]["checksum"], ranks[1]["checksum"],
                               rtol=1e-6)
    # and it matches the single-process 4-device mesh: exact quantities
    # (losses, initial gradients) tightly; 3-steps-of-Adam params loosely
    # (sign(grad-noise)*lr on analytically-zero-grad leaves, see
    # CLAUDE.md)
    losses, ck, gsum = oracle()
    np.testing.assert_allclose(ranks[0]["losses"], losses, rtol=1e-4)
    np.testing.assert_allclose(ranks[0]["grad_checksum"], gsum, rtol=1e-4)
    np.testing.assert_allclose(ranks[0]["checksum"], ck, rtol=3e-3)


@pytest.mark.slow
def test_multiprocess_dp_matches_single_process(tmp_path):
    _check(_spawn("dp", tmp_path), _oracle_dp)


@pytest.mark.slow
def test_multiprocess_ep_matches_single_process(tmp_path):
    _check(_spawn("ep", tmp_path), _oracle_ep)


@pytest.mark.slow
def test_multiprocess_dp_four_processes(tmp_path):
    """Same global 4-device mesh, but one device per process across
    FOUR processes — every mesh row crosses a process boundary."""
    _check(_spawn("dp", tmp_path, n_proc=4, local_devices=1),
           _oracle_dp)
