"""Device-mesh parallelism: mesh construction, batch/state sharding and the
double-buffered host->HBM feed.
"""

from .mesh import data_mesh, shard_batch, replicate

__all__ = ["data_mesh", "shard_batch", "replicate"]
