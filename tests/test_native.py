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


def _py_counts_via_enumerate(info, ei, n, induced):
    from gsn_tpu.counting.counts import _enumerate
    counts = np.zeros((n, info.num_orbits))
    for m in _enumerate(info, ei, n, induced):
        for i, node in enumerate(m):
            counts[node, info.orbit_membership[i]] += 1
    return counts / info.aut_count


def random_directed_host(rng, n, p=0.3):
    mask = rng.rand(n, n) < p
    np.fill_diagonal(mask, False)
    us, vs = np.nonzero(mask)
    return np.stack([us, vs]).astype(np.int64)


DIRECTED_PATTERNS = [
    [(0, 1), (1, 2), (2, 0)],                      # directed 3-cycle
    [(0, 1), (0, 2), (0, 3)],                      # out-star
    [(0, 1), (1, 2), (2, 3)],                      # directed path
    [(0, 1), (1, 0), (1, 2)],                      # 2-cycle + tail
]


@pytest.mark.parametrize("induced", [False, True])
def test_directed_vertex_counts_match_oracle(induced):
    rng = np.random.RandomState(2)
    for trial in range(4):
        n = rng.randint(8, 16)
        ei = random_directed_host(rng, n)
        for pat_edges in DIRECTED_PATTERNS:
            pat = automorphism_orbits(pat_edges, directed=True)
            ours = engine.vertex_counts(ei, pat, induced, n)
            ref = _py_counts_via_enumerate(pat, ei, n, induced)
            np.testing.assert_array_equal(ours, ref)


def test_directed_edge_counts_match_oracle():
    from gsn_tpu.counting.counts import _enumerate
    rng = np.random.RandomState(3)
    for trial in range(4):
        n = rng.randint(8, 14)
        ei = random_directed_host(rng, n)
        if ei.shape[1] == 0:
            continue
        for pat_edges in DIRECTED_PATTERNS:
            pat = induced_edge_automorphism_orbits(
                pat_edges, directed=True, directed_orbits=True)
            edges = ei.T.tolist()
            edge_dict = {(int(u), int(v)): i
                         for i, (u, v) in enumerate(edges)}
            ref = np.zeros((len(edges), pat.num_edge_orbits))
            for m in _enumerate(pat, ei, n, False):
                for i, (u, v) in enumerate(pat.directed_edges):
                    ref[edge_dict[(m[u], m[v])],
                        pat.edge_orbit_membership[i]] += 1
            ref /= pat.aut_count
            ours = engine.edge_counts(ei, pat, False, n)
            np.testing.assert_array_equal(ours, ref)


@pytest.mark.parametrize("induced", [False, True])
def test_batch_counts_match_single(induced):
    rng = np.random.RandomState(4)
    gs = [random_host(rng, int(rng.randint(6, 18))) for _ in range(20)]
    ns = [int(ei.max()) + 1 if ei.size else 4 for ei in gs]
    pat_v = automorphism_orbits(cycle_graph(4))
    batch = engine.vertex_counts_batch(gs, ns, pat_v, induced,
                                       num_threads=2)
    for ei, n, b in zip(gs, ns, batch):
        np.testing.assert_array_equal(
            b, engine.vertex_counts(ei, pat_v, induced, n))
    pat_e = induced_edge_automorphism_orbits(path_graph(3))
    batch = engine.edge_counts_batch(gs, ns, pat_e, induced,
                                     num_threads=2)
    for ei, n, b in zip(gs, ns, batch):
        np.testing.assert_array_equal(
            b, engine.edge_counts(ei, pat_e, induced, n))


def test_batch_pipeline_matches_per_graph():
    """generate_dataset's native-batch fast path must be bit-identical to
    the pure-Python per-graph path."""
    import gsn_tpu.native.engine as E
    from gsn_tpu.data.pipeline import generate_dataset
    rng = np.random.RandomState(5)
    graphs = []
    for _ in range(12):
        ei = random_host(rng, int(rng.randint(5, 15)), 0.35)
        n = int(ei.max()) + 1 if ei.size else 5
        graphs.append({"x": np.ones((n, 1), np.int64), "edge_index": ei,
                       "y": 0})
    vocab = [cycle_graph(3), path_graph(4)]
    for scope in ("global", "local"):
        got, s1 = generate_dataset([dict(g) for g in graphs], vocab,
                                   id_scope=scope, induced=True,
                                   num_processes=2)
        E._disabled = True
        try:
            want, s2 = generate_dataset([dict(g) for g in graphs], vocab,
                                        id_scope=scope, induced=True)
        finally:
            E._disabled = False
        assert s1 == s2
        for a, b in zip(got, want):
            np.testing.assert_array_equal(a["identifiers"],
                                          b["identifiers"])
            np.testing.assert_array_equal(a["degrees"], b["degrees"])


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
