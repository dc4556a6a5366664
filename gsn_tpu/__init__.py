"""gsn_tpu — a TPU-native Graph Substructure Network framework.

Ground-up JAX/XLA/Pallas implementation of the capabilities of
gbouritsas/GSN (arXiv:2006.09252): structural-identifier message passing
(GSN-v / GSN-e), substructure orbit counting, batched padded graph
containers, and pjit/shard_map data- and edge-parallel execution.
"""

__version__ = "0.1.0"
