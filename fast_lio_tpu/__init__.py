"""fast_lio_tpu — a TPU-native LiDAR-inertial odometry framework.

A from-scratch JAX/XLA/Pallas re-design with the capabilities of
hku-mars/FAST_LIO (FAST-LIO2): iterated error-state Kalman filtering on
manifolds, direct raw-point scan-to-map registration, incremental voxel-hash
mapping, per-sensor preprocessing, and multi-device map sharding.
"""

__version__ = "0.1.0"

# NOTE on TPU numerics: TPU matmuls default to bf16 inputs, which destroys
# meter-scale coordinates with millimeter-scale residuals.  Rather than
# forcing jax_default_matmul_precision=highest globally (which ballooned XLA
# compile time ~25x on the tunnel backend), the hot point transforms use
# quaternion arithmetic (elementwise VPU ops, full f32 by construction) and
# only the tiny filter/plane solves run under a scoped
# jax.default_matmul_precision("highest") context (see filter.ekf, ops.*).

from . import state  # noqa: F401
from .math import s2, so3  # noqa: F401
