from .dp import DataParallelTrainer, make_global_batch, shard_batches
from .mesh import dp_sharded, make_mesh, replicated

__all__ = [
    "DataParallelTrainer", "make_global_batch", "shard_batches",
    "dp_sharded", "make_mesh", "replicated",
]
