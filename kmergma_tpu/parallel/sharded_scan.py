"""Data-parallel sharded scan: SPMD over a device mesh via shard_map.

The TPU-native replacement for the reference's (disabled) per-record thread
fan-out (ref /root/reference/src/MultiThread/GenomeMiner.jl:101-145) and the
distribution layer the reference lacks (SURVEY.md sections 2.2, 5.8):

  * the genome is cut into overlapped tiles (halo = ws - 1 bp) so every tile
    computes its windows independently (each tile's first-window spectrum is
    recomputed in-tile, exactly like the reference does per record);
  * tiles are sharded over the mesh's ``data`` axis; the reference profile
    is replicated;
  * each shard emits fixed-capacity candidate buffers (indices + scaled
    distances + per-tile below-threshold edge flags) which are combined
    with ``all_gather`` over ICI;
  * the host replays the sequential minima state machine over the merged
    sparse stream - bit-exact with the single-device path by construction.

Cluster mode shards profiles over the ``clusters`` axis ("one expert per
reference cluster") on top of the tile axis.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops.scan import scan_window_distances


def _tile_kernel(codes_tile, s_profile, thr_int, k: int, ws: int, r: int, cap: int):
    """Candidates of one tile: (d_first, count, idx, vals, below_edges)."""
    d = scan_window_distances(codes_tile, s_profile, k, ws, r)
    below = d < thr_int
    prevb = jnp.concatenate([jnp.zeros(1, dtype=bool), below[:-1]])
    mask = below | prevb
    # top_k compaction (ascending indices), as in ops.scan._scan_chunk_compact
    t = d.shape[0]
    score = jnp.where(mask, t - jnp.arange(t, dtype=jnp.int32), 0)
    top, _ = jax.lax.top_k(score, min(cap, t))
    if cap > t:
        top = jnp.pad(top, (0, cap - t))
    idx = jnp.where(top > 0, t - top, 0)
    vals = d[idx]
    count = mask.sum()
    # first-window flag feeds the next tile's rising-edge detection on host
    return d[0], count, idx.astype(jnp.int32), vals, below[0], below[-1]


@partial(jax.jit, static_argnames=("k", "ws", "r", "cap", "mesh"))
def _sharded_scan(codes_tiles, s_profile, thr_int, *, k, ws, r, cap, mesh):
    """codes_tiles: (n_tiles, tile_len + ws - 1) int8, sharded on axis 0."""

    def per_shard(local_tiles, s_prof, thr):
        f = jax.vmap(lambda t: _tile_kernel(t, s_prof, thr[0], k, ws, r, cap))
        outs = f(local_tiles)
        return tuple(jax.lax.all_gather(o, "data", axis=0, tiled=True) for o in outs)

    shard_fn = jax.shard_map(
        per_shard,
        mesh=mesh,
        in_specs=(P("data", None), P(), P()),
        out_specs=(P(), P(), P(), P(), P(), P()),
        check_vma=False,  # outputs are value-replicated after all_gather
    )
    return shard_fn(codes_tiles, s_profile, thr_int)


@partial(jax.jit, static_argnames=("k", "ws", "r", "cap", "mesh"))
def sharded_cluster_scan_step(codes_tiles, s_profiles, thr_ints, *, k, ws, r, cap, mesh):
    """Full multi-axis SPMD scan step: profiles sharded over ``clusters``
    ("one expert per reference cluster"), genome tiles sharded over ``data``,
    per-shard candidate buffers combined with all_gather over both axes.

    This is the framework's flagship multi-chip step (used by
    __graft_entry__.dryrun_multichip and the pod-scale scan path).
    """

    def per_shard(local_tiles, local_profiles, local_thrs):
        def one_profile(s_prof, thr):
            f = jax.vmap(lambda t: _tile_kernel(t, s_prof, thr, k, ws, r, cap))
            return f(local_tiles)

        outs = jax.vmap(one_profile)(local_profiles, local_thrs)
        outs = tuple(jax.lax.all_gather(o, "data", axis=1, tiled=True) for o in outs)
        outs = tuple(jax.lax.all_gather(o, "clusters", axis=0, tiled=True) for o in outs)
        return outs

    shard_fn = jax.shard_map(
        per_shard,
        mesh=mesh,
        in_specs=(P("data", None), P("clusters", None), P("clusters")),
        out_specs=(P(), P(), P(), P(), P(), P()),
        check_vma=False,  # outputs are value-replicated after all_gather
    )
    return shard_fn(codes_tiles, s_profiles, thr_ints)


def make_tiles(codes: np.ndarray, tile_windows: int, ws: int, n_tiles_round: int) -> tuple[np.ndarray, int]:
    """Cut one record into overlapped tiles of ``tile_windows`` windows each
    (halo ws-1), padded up to ``n_tiles_round`` tiles for even sharding.

    Returns (tiles array (n_tiles_round, tile_windows + ws - 1), n_real_windows).
    """
    n = codes.shape[0]
    nw = n - ws + 1
    n_tiles = -(-nw // tile_windows)
    n_pad_tiles = -(-n_tiles // n_tiles_round) * n_tiles_round
    tile_len = tile_windows + ws - 1
    tiles = np.zeros((n_pad_tiles, tile_len), dtype=np.int8)
    for t in range(n_tiles):
        lo = t * tile_windows
        chunk = codes[lo : min(lo + tile_len, n)]
        tiles[t, : chunk.shape[0]] = chunk
    return tiles, nw


class ShardedScanEngine:
    """Drop-in ScanEngine alternative that runs the scan SPMD over a mesh.

    Produces the identical (dist0, stream) contract consumed by the host
    state-machine replay (models/state_machine.replay_single).
    """

    def __init__(
        self,
        s_profile: np.ndarray,
        k: int,
        ws: int,
        r: int,
        mesh: Mesh | None = None,
        tile_windows: int = 1 << 16,
        cap: int = 1 << 12,
    ):
        from .mesh import make_mesh

        self.mesh = mesh if mesh is not None else make_mesh()
        self.k, self.ws, self.r = k, ws, r
        self.tile_windows = tile_windows
        self.cap = cap
        self.scale = 2.0 * k * r * r
        self.s_dev = jnp.asarray(s_profile.astype(np.int32))
        self.n_data = self.mesh.shape["data"] * self.mesh.shape["clusters"]

    def _thr_int(self, thr: float) -> np.ndarray:
        return np.asarray([min(np.floor(thr * self.scale) + 2, 2**31 - 1)], dtype=np.int32)

    def record_stream(self, codes: np.ndarray, thr: float, collect_dists: bool = False):
        if collect_dists:  # debug path stays single-device
            from ..ops.scan import ScanEngine

            eng = ScanEngine(np.asarray(self.s_dev), self.k, self.ws, self.r)
            return eng.record_stream(codes, thr, collect_dists=True)

        n_shards = self.mesh.shape["data"]
        tiles, nw = make_tiles(codes, self.tile_windows, self.ws, n_shards)
        tiles_dev = jax.device_put(tiles, NamedSharding(self.mesh, P("data", None)))

        d0s, counts, idxs, vals, below0, below_last = _sharded_scan(
            tiles_dev,
            self.s_dev,
            jnp.asarray(self._thr_int(thr)),
            k=self.k,
            ws=self.ws,
            r=self.r,
            cap=self.cap,
            mesh=self.mesh,
        )
        d0s = np.asarray(d0s)
        counts = np.asarray(counts)
        idxs = np.asarray(idxs)
        vals = np.asarray(vals)
        below_last = np.asarray(below_last)
        below0 = np.asarray(below0)

        n_tiles = -(-nw // self.tile_windows)
        stream: list[tuple[int, float]] = []
        for t in range(n_tiles):
            t_start = t * self.tile_windows
            t_count = min(self.tile_windows, nw - t_start)
            c = int(counts[t])
            if c > self.cap:
                # overflow fallback: rescan this tile densely
                from ..ops.scan import _scan_chunk_full

                d = np.asarray(
                    _scan_chunk_full(
                        jnp.asarray(tiles[t]), self.s_dev, self.k, self.ws, self.r
                    )
                )[:t_count]
                below = d < self._thr_int(thr)[0]
                mask = below.copy()
                mask[1:] |= below[:-1]
                mask[0] |= bool(below_last[t - 1]) if t > 0 else False
                for j in np.nonzero(mask)[0]:
                    gj = t_start + int(j)
                    if gj >= 1:
                        stream.append((gj, float(d[j]) / self.scale))
                continue
            sel = idxs[t, :c]
            sv = vals[t, :c]
            # boundary fix-up: if the previous tile's last window was below
            # threshold and this tile's first window is not a candidate,
            # window t_start is a rising edge the tile could not see.
            if t > 0 and bool(below_last[t - 1]) and (c == 0 or sel[0] != 0):
                stream.append((t_start, float(d0s[t]) / self.scale))
            for j, v in zip(sel, sv):
                j = int(j)
                if j >= t_count:
                    continue  # padded region of the last tile
                gj = t_start + j
                if gj >= 1:
                    stream.append((gj, float(v) / self.scale))

        dist0 = float(d0s[0]) / self.scale
        return dist0, stream, None
