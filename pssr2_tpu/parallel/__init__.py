"""Device-mesh parallelism: mesh construction, batch/state sharding and the
double-buffered host->HBM feed.
"""

from .mesh import data_mesh, data_model_mesh, shard_batch, replicate
from .tp import SWINIR_TP_RULES, shard_module, tp_shardings

__all__ = [
    "data_mesh",
    "data_model_mesh",
    "shard_batch",
    "replicate",
    "SWINIR_TP_RULES",
    "shard_module",
    "tp_shardings",
]
