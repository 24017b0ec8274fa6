from .mesh import make_mesh, sharded_placement_step, shard_flat_inputs

__all__ = ["make_mesh", "sharded_placement_step", "shard_flat_inputs"]
