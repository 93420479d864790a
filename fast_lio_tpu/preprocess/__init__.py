from . import drivers  # noqa: F401
from .drivers import RawScan, decode  # noqa: F401
