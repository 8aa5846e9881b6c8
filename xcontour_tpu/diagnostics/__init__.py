from .lwa import local_wave_activity, local_wave_activity2, lwa_masks_at  # noqa: F401
from .length import contour_lengths, contour_crossing  # noqa: F401
