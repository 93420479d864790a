"""fast_lio_tpu — a TPU-native LiDAR-inertial odometry framework.

A from-scratch JAX/XLA/Pallas re-design with the capabilities of
hku-mars/FAST_LIO (FAST-LIO2): iterated error-state Kalman filtering on
manifolds, direct raw-point scan-to-map registration, incremental voxel-hash
mapping, per-sensor preprocessing, and multi-device map sharding.
"""

__version__ = "0.1.0"

from . import state  # noqa: F401
from .math import s2, so3  # noqa: F401
