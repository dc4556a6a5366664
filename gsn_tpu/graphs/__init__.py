from .container import GraphBatch, batch_graphs, pad_cap
from .patterns import (get_custom_edge_list, parse_graph6, read_graph6_file,
                       resolve_pattern_vocabulary, write_graph6)

__all__ = [
    "GraphBatch",
    "batch_graphs",
    "pad_cap",
    "get_custom_edge_list",
    "parse_graph6",
    "read_graph6_file",
    "resolve_pattern_vocabulary",
    "write_graph6",
]
