from .mesh import make_mesh, default_mesh, initialize_distributed
from .sharding import pad_cells, shard_inputs, shard_mask, unpad_cells

__all__ = ["make_mesh", "default_mesh", "initialize_distributed",
           "pad_cells", "shard_inputs", "shard_mask", "unpad_cells"]
