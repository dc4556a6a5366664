import numpy as np
import pytest

from gsn_tpu.counting import (automorphism_orbits, count_automorphisms,
                              build_adjacency,
                              enumerate_subgraph_isomorphisms,
                              induced_edge_automorphism_orbits,
                              subgraph_isomorphism_edge_counts,
                              subgraph_isomorphism_vertex_counts)
from gsn_tpu.graphs.patterns import (complete_graph, cycle_graph, path_graph,
                                     star_graph)


def bidirect(edges):
    """[2, 2E] edge_index with both directions, sorted lexicographically."""
    both = sorted([(u, v) for u, v in edges] + [(v, u) for u, v in edges])
    return np.array(both, dtype=np.int64).T


class TestAutomorphisms:
    def test_aut_counts(self):
        cases = [
            (cycle_graph(3), 6),      # S3
            (cycle_graph(6), 12),     # dihedral D6
            (path_graph(4), 2),
            (complete_graph(4), 24),
            (star_graph(3), 6),       # 3 leaves permute
        ]
        for edges, expected in cases:
            info = automorphism_orbits(edges)
            assert info.aut_count == expected, edges

    def test_vertex_orbits(self):
        # path on 4: ends {0,3}, middles {1,2} -> 2 orbits
        info = automorphism_orbits(path_graph(4))
        assert info.num_orbits == 2
        assert info.orbit_membership[0] == info.orbit_membership[3]
        assert info.orbit_membership[1] == info.orbit_membership[2]
        # cycle: single orbit
        assert automorphism_orbits(cycle_graph(5)).num_orbits == 1
        # star: center + leaves
        info = automorphism_orbits(star_graph(4))
        assert info.num_orbits == 2

    def test_edge_orbits(self):
        # path on 4: outer edges vs middle edge -> 2 edge orbits
        info = induced_edge_automorphism_orbits(path_graph(4))
        assert info.num_edge_orbits == 2
        # cycle: 1 edge orbit
        assert induced_edge_automorphism_orbits(
            cycle_graph(6)).num_edge_orbits == 1
        # directed orbits on path(4): ends<->middles asymmetric
        info_d = induced_edge_automorphism_orbits(
            path_graph(4), directed_orbits=True)
        assert info_d.num_edge_orbits == 3  # (end,mid),(mid,end),(mid,mid)


class TestEnumeration:
    def test_triangle_in_k4(self):
        # 4 triangles * 6 automorphic placements = 24 monomorphisms
        pat = automorphism_orbits(cycle_graph(3))
        host_edges = complete_graph(4)
        host_adj = build_adjacency(4, host_edges)
        count = sum(1 for _ in enumerate_subgraph_isomorphisms(
            pat.adj, 3, host_adj, 4, False))
        assert count == 24
        # induced count identical for triangles (no non-edges)
        count_i = sum(1 for _ in enumerate_subgraph_isomorphisms(
            pat.adj, 3, host_adj, 4, True))
        assert count_i == 24

    def test_induced_vs_noninduced_p3_in_k3(self):
        # path_2 (3 vertices) in a triangle: 6 monomorphisms, 0 induced
        pat = automorphism_orbits(path_graph(3))
        host_adj = build_adjacency(3, cycle_graph(3))
        mono = sum(1 for _ in enumerate_subgraph_isomorphisms(
            pat.adj, 3, host_adj, 3, False))
        ind = sum(1 for _ in enumerate_subgraph_isomorphisms(
            pat.adj, 3, host_adj, 3, True))
        assert mono == 6 and ind == 0

    def test_count_automorphisms_petersen(self):
        petersen = [(0, 1), (1, 2), (2, 3), (3, 4), (4, 0),
                    (5, 7), (7, 9), (9, 6), (6, 8), (8, 5),
                    (0, 5), (1, 6), (2, 7), (3, 8), (4, 9)]
        adj = build_adjacency(10, petersen)
        assert count_automorphisms(adj, 10) == 120


class TestVertexCounts:
    def test_triangle_counts_k4(self):
        # every vertex of K4 is in 3 triangles
        pat = automorphism_orbits(cycle_graph(3))
        counts = subgraph_isomorphism_vertex_counts(
            bidirect(complete_graph(4)), pat, induced=True, num_nodes=4)
        assert counts.shape == (4, 1)
        np.testing.assert_allclose(counts, 3.0)

    def test_star_orbit_counts(self):
        # star with 3 leaves counted in a star with 4 leaves (monomorphism):
        # center orbit count at hub = C(4,3) choose leaves = 4
        pat = automorphism_orbits(star_graph(3))
        host = bidirect(star_graph(4))
        counts = subgraph_isomorphism_vertex_counts(
            host, pat, induced=False, num_nodes=5)
        center_orbit = pat.orbit_membership[0]
        leaf_orbit = pat.orbit_membership[1]
        assert counts[0, center_orbit] == 4.0
        assert counts[0, leaf_orbit] == 0.0
        # each host leaf is a pattern leaf in C(3,2)=3 of the copies
        for v in range(1, 5):
            assert counts[v, leaf_orbit] == 3.0

    def test_isolated_vertex_num_nodes(self):
        # num_nodes larger than max edge index (isolated vertex edge case,
        # reference utils_graph_processing.py:118-121)
        pat = automorphism_orbits(cycle_graph(3))
        counts = subgraph_isomorphism_vertex_counts(
            bidirect(cycle_graph(3)), pat, induced=True, num_nodes=5)
        assert counts.shape == (5, 1)
        np.testing.assert_allclose(counts[:3], 1.0)
        np.testing.assert_allclose(counts[3:], 0.0)


class TestEdgeCounts:
    def test_triangle_edge_counts_k4(self):
        # every edge of K4 lies in 2 triangles
        pat = induced_edge_automorphism_orbits(cycle_graph(3))
        ei = bidirect(complete_graph(4))
        counts = subgraph_isomorphism_edge_counts(ei, pat, induced=True)
        assert counts.shape == (12, 1)
        np.testing.assert_allclose(counts, 2.0)

    def test_path_edge_orbits_in_path(self):
        # count path_graph(3) (wedge) inside path_graph(4):
        # wedge has 1 edge orbit; host edge (0,1) is in 1 wedge,
        # middle edge (1,2) is in 2 wedges
        pat = induced_edge_automorphism_orbits(path_graph(3))
        ei = bidirect(path_graph(4))
        counts = subgraph_isomorphism_edge_counts(ei, pat, induced=False)
        edge_rows = {tuple(e): i for i, e in enumerate(ei.T.tolist())}
        assert counts[edge_rows[(0, 1)], 0] == 1.0
        assert counts[edge_rows[(1, 2)], 0] == 2.0
        # symmetry across directions
        assert counts[edge_rows[(1, 0)], 0] == 1.0
        assert counts[edge_rows[(2, 1)], 0] == 2.0


class TestSRGraphs:
    @pytest.mark.slow
    def test_sr_4cycle_counts_constant(self):
        # In a strongly regular graph all vertices have identical
        # 3- and 4-cycle counts (they are determined by (v,k,λ,μ)) —
        # this is why GSN needs k>=6 cycles to break SR(25,12,5,6).
        from gsn_tpu.graphs.patterns import read_graph6_file
        graphs = read_graph6_file(
            "/root/reference/datasets/SR_graphs/sr251256/sr251256.g6")
        n, edges = graphs[0]
        pat = automorphism_orbits(cycle_graph(3))
        ei = bidirect(edges)
        counts = subgraph_isomorphism_vertex_counts(
            ei, pat, induced=True, num_nodes=n)
        # λ=5: each edge in 5 triangles; vertex in k*λ/2 = 30 triangles
        np.testing.assert_allclose(counts, 30.0)


class TestLineGraphOrbits:
    def test_line_graph_variant(self):
        from gsn_tpu.counting import line_graph_edge_automorphism_orbits
        from gsn_tpu.graphs.patterns import path_graph, cycle_graph, star_graph
        # P4: outer edges vs middle edge -> 2 orbits (agrees with induced)
        assert line_graph_edge_automorphism_orbits(
            path_graph(4)).num_edge_orbits == 2
        # cycles: single orbit
        assert line_graph_edge_automorphism_orbits(
            cycle_graph(6)).num_edge_orbits == 1
        # star: line graph is complete -> 1 orbit
        assert line_graph_edge_automorphism_orbits(
            star_graph(4)).num_edge_orbits == 1


class TestDirected:
    def test_directed_triangle_counts(self):
        from gsn_tpu.counting import (automorphism_orbits,
                                      subgraph_isomorphism_vertex_counts)
        tri = [(0, 1), (1, 2), (2, 0)]      # directed 3-cycle
        pat = automorphism_orbits(tri, directed=True)
        assert pat.aut_count == 3            # rotations only
        assert pat.num_orbits == 1
        # host: directed 6-cycle — no directed triangles
        c6 = np.array([(i, (i + 1) % 6) for i in range(6)]).T
        counts = subgraph_isomorphism_vertex_counts(
            c6, pat, induced=False, num_nodes=6)
        np.testing.assert_allclose(counts, 0.0)
        # host: two directed triangles sharing nothing
        host = np.array([(0, 1), (1, 2), (2, 0),
                         (3, 4), (4, 5), (5, 3)]).T
        counts = subgraph_isomorphism_vertex_counts(
            host, pat, induced=False, num_nodes=6)
        np.testing.assert_allclose(counts, 1.0)

    def test_directed_edge_counts(self):
        from gsn_tpu.counting import (induced_edge_automorphism_orbits,
                                      subgraph_isomorphism_edge_counts)
        # directed wedge 0->1->2: two edge orbits (first/second leg)
        wedge = [(0, 1), (1, 2)]
        pat = induced_edge_automorphism_orbits(wedge, directed=True)
        assert pat.aut_count == 1
        assert pat.num_edge_orbits == 2
        # host: directed path 0->1->2->3
        host = np.array([(0, 1), (1, 2), (2, 3)]).T
        counts = subgraph_isomorphism_edge_counts(
            host, pat, induced=False, num_nodes=4)
        # edge (0,1): first leg of 1 wedge; (1,2): first of one + second
        # of another; (2,3): second leg of 1
        np.testing.assert_allclose(counts, [[1, 0], [1, 1], [0, 1]])

    def test_directed_induced(self):
        from gsn_tpu.counting.vf2 import (
            build_directed_adjacency,
            enumerate_directed_subgraph_isomorphisms)
        # induced 0->1 (no reverse edge) in a bidirected pair: 0 matches
        po, pi = build_directed_adjacency(2, [(0, 1)])
        ho, hi = build_directed_adjacency(2, [(0, 1), (1, 0)])
        mono = sum(1 for _ in enumerate_directed_subgraph_isomorphisms(
            po, pi, 2, ho, hi, 2, False))
        ind = sum(1 for _ in enumerate_directed_subgraph_isomorphisms(
            po, pi, 2, ho, hi, 2, True))
        assert mono == 2 and ind == 0
