from .histogram import weighted_cdf  # noqa: F401
from .interp import interp1d  # noqa: F401
from .gradient import gradient_index  # noqa: F401
from .stencil import squared_gradient, gradient  # noqa: F401
