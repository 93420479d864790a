from . import hash_map  # noqa: F401
from .hash_map import Map, MapConfig  # noqa: F401
