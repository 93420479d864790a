from . import measurement, plane_fit, voxel_grid  # noqa: F401
