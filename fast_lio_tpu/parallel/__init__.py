from . import sharding  # noqa: F401


def init_distributed(coordinator_address=None, num_processes=None,
                     process_id=None):
    """Multi-host bring-up: initialize jax.distributed and return the global
    1-D map mesh spanning every device in the job.

    Single-host callers can skip this and pass ``Mesh(jax.devices(), ('map',))``
    to Pipeline directly; multi-host jobs call this once per process (the
    reference has no distributed mode at all — SURVEY.md §2.8).  Collectives
    ride ICI within a slice and DCN across hosts automatically.
    """
    import jax
    import numpy as np
    from jax.sharding import Mesh

    if coordinator_address is not None:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    return Mesh(np.asarray(jax.devices()), (sharding.AXIS,))
