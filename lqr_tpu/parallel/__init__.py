from .batch import BatchCarver, extend_map_batched, materialize_batched
from .sharding import (make_mesh, find_seam_sharded, sharded_seam_step)

__all__ = [
    "BatchCarver", "extend_map_batched", "materialize_batched",
    "make_mesh", "find_seam_sharded", "sharded_seam_step",
]
