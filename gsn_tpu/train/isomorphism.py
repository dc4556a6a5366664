"""Graph-isomorphism disambiguation test (the reference's built-in
correctness fixture, ``train_test_funcs.py:262-277`` + ``main.py:160-199``).

A randomly-initialized GSN embeds every graph; two non-isomorphic graphs
are "distinguished" when their embeddings differ by more than ``eps`` in
L2.  GSN with induced 6-cycle identifiers must distinguish all pairs of
SR(25,12,5,6); a 1-WL MPNN must fail all pairs.
"""

from __future__ import annotations

from typing import Dict, List, Tuple

import jax
import numpy as np

from gsn_tpu.config import GSNConfig
from gsn_tpu.graphs.container import batch_graphs, pad_cap
from gsn_tpu.nn.models import build_model


def embed_graphs(graphs: List[Dict], cfg: GSNConfig, seed: int = 0,
                 batch_size: int = 16) -> np.ndarray:
    """Embed each graph with a freshly initialized model (no training)."""
    cfg = cfg.finalize()
    model = build_model(cfg)

    # one shared padded shape for all batches -> a single XLA compilation
    node_cap = pad_cap(max(sum(g["x"].shape[0] for g in graphs[i:i + batch_size])
                           for i in range(0, len(graphs), batch_size)))
    edge_cap = pad_cap(max(sum(g["edge_index"].shape[1]
                               for g in graphs[i:i + batch_size])
                           for i in range(0, len(graphs), batch_size)))
    graph_cap = pad_cap(batch_size, 8)

    first = batch_graphs(graphs[:batch_size], node_cap, edge_cap, graph_cap)
    variables = model.init(jax.random.PRNGKey(seed), first, train=False)

    @jax.jit
    def forward(data):
        return model.apply(variables, data, train=False)

    outs = []
    for i in range(0, len(graphs), batch_size):
        chunk = graphs[i:i + batch_size]
        data = batch_graphs(chunk, node_cap, edge_cap, graph_cap)
        y = np.asarray(forward(data))
        outs.append(y[: len(chunk)])
    return np.concatenate(outs, axis=0)


def pairwise_failures(embeddings: np.ndarray, eps: float = 1e-2,
                      p: int = 2) -> Tuple[np.ndarray, int]:
    """All-pairs distance + count of pairs closer than eps (reference
    torch.pdist at train_test_funcs.py:271-272)."""
    diff = embeddings[:, None, :] - embeddings[None, :, :]
    dists = np.linalg.norm(diff, ord=p, axis=-1)
    iu = np.triu_indices(len(embeddings), k=1)
    flat = dists[iu]
    return flat, int((flat < eps).sum())


def run_isomorphism_test(graphs: List[Dict], cfg: GSNConfig, seed: int = 0,
                         batch_size: int = 16, eps: float = 1e-2):
    """Returns (num_pairs, num_not_distinguished, failure_fraction)."""
    emb = embed_graphs(graphs, cfg, seed, batch_size)
    flat, fails = pairwise_failures(emb, eps)
    return len(flat), fails, fails / len(flat)
