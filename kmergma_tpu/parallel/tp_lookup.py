"""Profile-axis tensor parallelism: the 4^k spectrum table sharded over
devices.

SURVEY.md section 2.2 marks TP optional - at the reference's k=6 the 4^k
table is 16 KB and replication is free.  For large k (k >= 10 means >= 1M
bins, >= 4 MB int32 per profile and per one-hot lookup tile) this module
shards the PROFILE axis instead: each device holds a contiguous bin range
of S, computes the masked partial lookup g_part[i] = S_local[K[i] - lo]
for its range, and one ``psum`` over the ``data`` axis reassembles
g = S[K].  The scan's only profile-indexed quantities (g and ||S||^2) both
reduce over bins, so this primitive is the complete TP story for the
distance pass.

Note the int32-headroom guard usually binds before table size does (huge
reference sets overflow scaled integers first and route to the exact int64
host engine, ops/scan_host.py); this primitive covers the middle ground -
big k, moderate R.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


@partial(jax.jit, static_argnames=("mesh",))
def tp_profile_lookup(kcodes, s_profile, *, mesh: Mesh):
    """g[i] = S[K[i]] with S sharded over the mesh's ``data`` axis.

    ``kcodes`` is replicated (int32[n]); ``s_profile`` int32[4^k] is sharded
    on axis 0.  Returns the replicated int32[n] lookup.
    """
    n_dev = mesh.shape["data"]
    nbins = s_profile.shape[0]
    local = nbins // n_dev

    def per_shard(kc, s_local):
        lo = jax.lax.axis_index("data").astype(jnp.int32) * jnp.int32(local)
        idx = kc - lo
        in_range = (idx >= 0) & (idx < local)
        part = jnp.where(in_range, jnp.take(s_local, jnp.clip(idx, 0, local - 1)), 0)
        return jax.lax.psum(part, "data")

    return jax.shard_map(
        per_shard,
        mesh=mesh,
        in_specs=(P(), P("data")),
        out_specs=P(),
        check_vma=False,  # psum output is value-replicated
    )(kcodes, s_profile)


def shard_profile(s_profile: np.ndarray, mesh: Mesh):
    """Place an int32 profile sharded over the mesh's ``data`` axis
    (pads the bin count up to a multiple of the axis size)."""
    n_dev = mesh.shape["data"]
    nbins = s_profile.shape[0]
    pad = -(-nbins // n_dev) * n_dev - nbins
    s = np.concatenate([s_profile.astype(np.int32), np.zeros(pad, np.int32)])
    return jax.device_put(s, NamedSharding(mesh, P("data")))
