"""C++ VF2 engine must agree exactly with the Python oracle."""

import numpy as np
import pytest

from gsn_tpu.counting import (automorphism_orbits,
                              induced_edge_automorphism_orbits)
from gsn_tpu.counting.counts import _native_engine
from gsn_tpu.counting.vf2 import (build_adjacency,
                                  enumerate_subgraph_isomorphisms)
from gsn_tpu.graphs.patterns import (complete_graph, cycle_graph, path_graph,
                                     star_graph)

engine = _native_engine()
pytestmark = pytest.mark.skipif(engine is None,
                                reason="native engine unavailable")


def _py_vertex_counts(edge_index, pattern, induced, num_nodes):
    host_adj = build_adjacency(num_nodes, edge_index.T.tolist())
    counts = np.zeros((num_nodes, pattern.num_orbits))
    for m in enumerate_subgraph_isomorphisms(
            pattern.adj, pattern.num_vertices, host_adj, num_nodes, induced):
        for i, node in enumerate(m):
            counts[node, pattern.orbit_membership[i]] += 1
    return counts / pattern.aut_count


def _py_edge_counts(edge_index, pattern, induced, num_nodes):
    edges = edge_index.T.tolist()
    edge_dict = {(int(u), int(v)): i for i, (u, v) in enumerate(edges)}
    host_adj = build_adjacency(num_nodes, edges)
    counts = np.zeros((len(edges), pattern.num_edge_orbits))
    for m in enumerate_subgraph_isomorphisms(
            pattern.adj, pattern.num_vertices, host_adj, num_nodes, induced):
        for i, (u, v) in enumerate(pattern.directed_edges):
            counts[edge_dict[(m[u], m[v])],
                   pattern.edge_orbit_membership[i]] += 1
    return counts / pattern.aut_count


def random_host(rng, n, p=0.25):
    mask = rng.rand(n, n) < p
    mask = np.triu(mask, 1)
    us, vs = np.nonzero(mask | mask.T)
    order = np.lexsort((vs, us))
    return np.stack([us[order], vs[order]]).astype(np.int64)


PATTERNS = [cycle_graph(3), cycle_graph(5), cycle_graph(6), path_graph(4),
            complete_graph(4), star_graph(3)]


@pytest.mark.parametrize("induced", [False, True])
def test_vertex_counts_match_oracle(induced):
    rng = np.random.RandomState(0)
    for trial in range(5):
        n = rng.randint(8, 20)
        ei = random_host(rng, n)
        for pat_edges in PATTERNS:
            pat = automorphism_orbits(pat_edges)
            ours = engine.vertex_counts(ei, pat, induced, n)
            ref = _py_vertex_counts(ei, pat, induced, n)
            np.testing.assert_array_equal(ours, ref)


@pytest.mark.parametrize("induced", [False, True])
def test_edge_counts_match_oracle(induced):
    rng = np.random.RandomState(1)
    for trial in range(5):
        n = rng.randint(8, 18)
        ei = random_host(rng, n)
        if ei.shape[1] == 0:
            continue
        for pat_edges in PATTERNS:
            pat = induced_edge_automorphism_orbits(pat_edges)
            ours = engine.edge_counts(ei, pat, induced, n)
            ref = _py_edge_counts(ei, pat, induced, n)
            np.testing.assert_array_equal(ours, ref)


def test_native_automorphism_counts():
    petersen = [(0, 1), (1, 2), (2, 3), (3, 4), (4, 0),
                (5, 7), (7, 9), (9, 6), (6, 8), (8, 5),
                (0, 5), (1, 6), (2, 7), (3, 8), (4, 9)]
    assert engine.count_automorphisms(petersen, 10) == 120
    assert engine.count_automorphisms(complete_graph(5), 5) == 120
    assert engine.count_automorphisms(cycle_graph(6), 6) == 12


def test_native_speedup_on_sr():
    """The native engine must beat the Python oracle by a wide margin on
    the SR counting workload (this is why it exists)."""
    import time

    from gsn_tpu.data.loaders import load_g6_graphs
    graphs, _ = load_g6_graphs(
        "/root/reference/datasets/SR_graphs/sr251256", "sr251256")
    ei = graphs[0]["edge_index"]
    pat = induced_edge_automorphism_orbits(cycle_graph(6))

    t0 = time.perf_counter()
    ours = engine.edge_counts(ei, pat, True, 25)
    t_native = time.perf_counter() - t0

    t0 = time.perf_counter()
    ref = _py_edge_counts(ei, pat, True, 25)
    t_py = time.perf_counter() - t0

    np.testing.assert_array_equal(ours, ref)
    assert t_native < t_py / 5, (t_native, t_py)
