from .mesh import make_mesh, shard_batch_spec  # noqa: F401
from .histogram import sharded_weighted_cdf  # noqa: F401
