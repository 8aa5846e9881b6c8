from .extract import find_contour, contour_length, contour_area  # noqa: F401
from . import breaking  # noqa: F401
