from .dp import DataParallelTrainer, make_global_batch, shard_batches
from .ep import EdgePartitionedTrainer, make_ep_batch
from .mesh import dp_sharded, make_mesh, replicated
from .trainer import ParallelTrainer

__all__ = [
    "DataParallelTrainer", "make_global_batch", "shard_batches",
    "EdgePartitionedTrainer", "make_ep_batch",
    "ParallelTrainer",
    "dp_sharded", "make_mesh", "replicated",
]
