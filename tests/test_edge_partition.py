"""Edge-partitioned propagate must match the single-device computation
exactly on the 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np

from gsn_tpu.ops.segment import masked_segment_sum
from gsn_tpu.parallel.edge_partition import (edge_partitioned_propagate,
                                             partition_edges_by_receiver,
                                             scaling_efficiency_bench)
from gsn_tpu.parallel.mesh import make_mesh


def test_partition_covers_all_edges():
    rng = np.random.RandomState(0)
    N, E, D = 64, 300, 8
    ei = np.stack([rng.randint(0, N, E), rng.randint(0, N, E)])
    parts = partition_edges_by_receiver(ei, N, D)
    assert parts["edge_mask"].sum() == E
    block = parts["node_block"]
    for d in range(D):
        m = parts["edge_mask"][d]
        assert (parts["recv_local"][d][m] < block).all()


def test_distributed_propagate_matches_single():
    rng = np.random.RandomState(1)
    N, E, D, d = 64, 400, 8, 16
    ei = np.stack([rng.randint(0, N, E), rng.randint(0, N, E)])
    x = rng.randn(N, d).astype(np.float32)

    mesh = make_mesh(D, ("ep",))
    parts = partition_edges_by_receiver(ei, N, D)
    prop = edge_partitioned_propagate(
        mesh, lambda xi, xj: jnp.tanh(xi) + 2.0 * xj)
    got = np.asarray(prop(
        jnp.asarray(x), jnp.asarray(parts["recv_local"]),
        jnp.asarray(parts["send_global"]),
        jnp.asarray(parts["edge_mask"])))

    want = np.asarray(masked_segment_sum(
        jnp.tanh(jnp.asarray(x)[ei[0]]) + 2.0 * jnp.asarray(x)[ei[1]],
        jnp.asarray(ei[0]), N))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_scaling_bench_runs():
    mesh = make_mesh(8, ("ep",))
    out = scaling_efficiency_bench(mesh, num_nodes=1024, avg_degree=4,
                                   d=32, iters=3)
    assert out["devices"] == 8
    assert out["dist_edges_per_s"] > 0


def test_ring_propagate_matches_single():
    from gsn_tpu.parallel.edge_partition import (
        partition_edges_ring, ring_edge_partitioned_propagate)

    rng = np.random.RandomState(2)
    N, E, D, d = 64, 400, 8, 16
    ei = np.stack([rng.randint(0, N, E), rng.randint(0, N, E)])
    x = rng.randn(N, d).astype(np.float32)

    mesh = make_mesh(D, ("ep",))
    parts = partition_edges_ring(ei, N, D)
    prop = ring_edge_partitioned_propagate(
        mesh, lambda xi, xj: jnp.tanh(xi) + 2.0 * xj)
    got = np.asarray(prop(
        jnp.asarray(x), parts["recv_local"], parts["send_local"],
        parts["edge_mask"]))

    want = np.asarray(masked_segment_sum(
        jnp.tanh(jnp.asarray(x)[ei[0]]) + 2.0 * jnp.asarray(x)[ei[1]],
        jnp.asarray(ei[0]), N))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)
