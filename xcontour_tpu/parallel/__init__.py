from .mesh import make_mesh, make_hybrid_mesh, shard_batch_spec  # noqa: F401
from .histogram import sharded_weighted_cdf  # noqa: F401
from .sort import sharded_exact_conditional_integral  # noqa: F401
from .lwa import sharded_local_wave_activity  # noqa: F401
from .length import sharded_contour_lengths  # noqa: F401
from .local_length import sharded_local_lengths  # noqa: F401
