from . import hexgrid, s2  # noqa: F401
from .geo import haversine_m  # noqa: F401
