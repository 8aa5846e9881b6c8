from . import constants  # noqa: F401
from . import ncio  # noqa: F401
