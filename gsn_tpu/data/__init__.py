from .encoding import OneHotMax, OneHotUnique, encode
from .loaders import (load_g6_graphs, load_ogb_data, load_tu_data,
                      load_zinc_data)
from .pipeline import (build_pattern_infos, compute_degrees,
                       generate_dataset, prepare_dataset)
from .splits import (separate_data, separate_data_given_split,
                     stratified_kfold_indices)

__all__ = [
    "OneHotMax", "OneHotUnique", "encode",
    "load_g6_graphs", "load_ogb_data", "load_tu_data", "load_zinc_data",
    "build_pattern_infos", "compute_degrees", "generate_dataset",
    "prepare_dataset", "separate_data", "separate_data_given_split",
    "stratified_kfold_indices",
]
