from . import ekf, process  # noqa: F401
from .ekf import MeasOut, UpdateResult, predict, update_iterated  # noqa: F401
