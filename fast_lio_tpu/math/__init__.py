from . import s2, so3  # noqa: F401
