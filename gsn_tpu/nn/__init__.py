from .embedding import (ATOM_FEATURE_DIMS, BOND_FEATURE_DIMS, CentralEncoder,
                        DiscreteEmbedding, MultiEmbedding, one_hot_concat)
from .filters import GSNLayer
from .mlp import MLP, choose_activation
from .models import GNN_OGB, GNNSubstructures, MLPSubstructures, build_model

__all__ = [
    "ATOM_FEATURE_DIMS", "BOND_FEATURE_DIMS", "CentralEncoder",
    "DiscreteEmbedding", "MultiEmbedding", "one_hot_concat", "GSNLayer",
    "MLP", "choose_activation", "GNN_OGB", "GNNSubstructures",
    "MLPSubstructures", "build_model",
]
