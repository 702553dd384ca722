from .mesh import make_mesh  # noqa: F401
from .sharded_index import ShardedDeviceIndex  # noqa: F401
