"""Device-mesh construction for the sharded scan.

The framework's parallelism axes (SURVEY.md section 2.2):
  * ``data``  - genome tiles sharded along the sequence axis (the
    context-parallel analogue: overlapped tiling makes tiles independent,
    section 5.7);
  * ``clusters`` - cluster-mode profiles sharded "one expert per reference
    cluster" (the EP analogue).

Profiles are replicated; per-shard fixed-capacity hit buffers are combined
with all_gather over ICI (multi-host: jax.distributed + the same mesh over
DCN x ICI, profiles replicated to every host).
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh


def make_mesh(n_devices: int | None = None, n_clusters: int = 1) -> Mesh:
    """A ("clusters", "data") mesh over the first ``n_devices`` devices.

    The clusters axis gets min(n_clusters, largest divisor) ways; the rest
    goes to data parallelism.
    """
    devs = jax.devices()
    if n_devices is None:
        n_devices = len(devs)
    devs = devs[:n_devices]
    c = 1
    for cand in range(min(n_clusters, n_devices), 0, -1):
        if n_devices % cand == 0:
            c = cand
            break
    d = n_devices // c
    return Mesh(np.asarray(devs).reshape(c, d), axis_names=("clusters", "data"))
