from .mesh import SHARD_AXIS, make_mesh
from .sharded import ShardedDeviceStore

__all__ = ["SHARD_AXIS", "make_mesh", "ShardedDeviceStore"]
