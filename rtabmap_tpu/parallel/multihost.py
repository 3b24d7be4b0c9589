"""Multi-host bring-up: jax.distributed + pod-slice meshes.

Capability note (SURVEY §5.8): the reference has NO distributed backend —
multi-machine deployments happen outside its tree (ROS). This is the
TPU-native replacement: one controller process per host,
``jax.distributed.initialize`` for cross-host device visibility, and the
same ``parallel/sharded.py`` kernels running over a global mesh whose
collectives ride ICI within a slice and DCN across slices.

Typical pod-slice usage (same script on every host)::

    from rtabmap_tpu.parallel import multihost as MH
    MH.initialize()                     # env-driven (TPU pods auto-detect)
    mesh = MH.global_mesh()             # 1-D mesh over all chips
    # sharded_knn2 / sharded_tfidf / sharded_ba_step
    # now shard over every chip in the slice.

The vocabulary and Memory node slabs shard over the global axis, so
the loop-closure search capacity and the WM memory ceiling scale with
hosts — the reference's WM/LTM paging pressure (Rtabmap/TimeThr
transfers) simply moves out as chips are added.
"""
from __future__ import annotations

from typing import Optional, Sequence

import numpy as np


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None) -> bool:
    """Bring up jax.distributed. On TPU pods all three arguments are
    auto-detected from the environment; pass them explicitly for CPU/GPU
    fleets. Returns False when already initialized (idempotent)."""
    import jax

    try:
        if coordinator_address is None:
            jax.distributed.initialize()
        else:
            jax.distributed.initialize(coordinator_address=coordinator_address,
                                       num_processes=num_processes,
                                       process_id=process_id)
        return True
    except RuntimeError as e:  # already initialized
        if "already" in str(e).lower():
            return False
        raise


def global_mesh(axis: str = "shard"):
    """1-D mesh over every addressable chip in the job (all hosts)."""
    import jax
    from jax.sharding import Mesh

    return Mesh(np.array(jax.devices()), (axis,))


def slice_mesh(axes: Sequence[str] = ("dp", "shard")):
    """2-D (hosts x local-chips) mesh: put host-local axes (model/vocab
    shards, ICI-bound collectives) on the minor axis and cross-host data
    parallelism (DCN-bound) on the major axis — collectives ride the
    faster fabric where the traffic is."""
    import jax
    from jax.sharding import Mesh

    n_proc = jax.process_count()
    per_host = jax.local_device_count()
    devs = np.array(jax.devices()).reshape(n_proc, per_host)
    return Mesh(devs, tuple(axes))


def process_info():
    import jax

    return {"process_index": jax.process_index(),
            "process_count": jax.process_count(),
            "local_devices": jax.local_device_count(),
            "global_devices": len(jax.devices())}
