"""3D voxel occupancy (OctoMap parity) + elevation map (GridMap parity).

Capability parity: the reference's ``OctoMap`` global map
(/root/reference/corelib/src/global_map/OctoMap.cpp — color octree with
per-voxel log-odds, ray clearing, node add/remove on graph updates) and the
elevation ``GridMap`` (corelib/src/global_map/GridMap.cpp — per-cell
height surface from assembled clouds).

TPU re-design: the pointer octree becomes a BLOCK-SPARSE dense voxel slab —
a fixed-capacity array of 8x8x8 log-odds bricks with a host-side brick
table, which is the GPU/TPU-native sparse-volume layout (VDB-style) rather
than a pointer tree: updates are one masked scatter-add over the slab, and
queries are one gather — no traversal, no allocation inside jit. Ray
clearing samples a fixed number of points per ray (static shapes) instead
of amanatides-woo stepping; duplicate (voxel, type) samples are collapsed
host-side where the brick table lives, with occupied-endpoint priority
(OctoMap's lazy_eval update semantics).
"""
from __future__ import annotations

from functools import partial
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from rtabmap_tpu.geometry import transform as T

BLOCK = 8
BLOCK_VOX = BLOCK * BLOCK * BLOCK


@partial(jax.jit, static_argnames=("n_free",))
def _ray_samples(pose, pts, valid, voxel: float, n_free: int, max_range: float):
    """World voxel coords of occupied endpoints + free-space ray samples.

    Returns (occ (K,3) int32, free (K*n_free,3) int32, occ_ok, free_ok).
    """
    world = T.apply(pose[None], pts[None])[0]
    origin = T.translation(pose)
    rng = jnp.linalg.norm(world - origin[None], axis=-1)
    ok = valid & (rng > 1e-6) & (rng < max_range)
    occ = jnp.floor(world / voxel).astype(jnp.int32)
    # free samples strictly inside the ray (endpoint excluded)
    f = (jnp.arange(n_free, dtype=jnp.float32) + 0.5) / (n_free + 1)
    free_pts = origin[None, None, :] + f[:, None, None] * (world - origin[None])[None]
    free = jnp.floor(free_pts / voxel).astype(jnp.int32).reshape(-1, 3)
    free_ok = jnp.broadcast_to(ok[None], (n_free, ok.shape[0])).reshape(-1)
    return occ, free, ok, free_ok


@jax.jit
def _scatter_logodds(bricks, lin_idx, delta, mask, clamp: float):
    flat = bricks.reshape(-1)
    idx = jnp.where(mask, lin_idx, flat.shape[0])
    flat = flat.at[idx].add(jnp.where(mask, delta, 0.0), mode="drop")
    return jnp.clip(flat, -clamp, clamp).reshape(bricks.shape)


class VoxelOccupancyMap:
    """Block-sparse 3D log-odds occupancy over an unbounded volume."""

    OCC_INC = 0.85
    FREE_DEC = 0.7  # sigmoid(-0.7)=0.33 -> free after a single clearing pass
    CLAMP = 4.0

    def __init__(self, voxel: float = 0.1, capacity_blocks: int = 4096,
                 n_free_samples: int = 12, max_range: float = 8.0):
        self.voxel = voxel
        self.cap = capacity_blocks
        self.n_free = n_free_samples
        self.max_range = max_range
        self.bricks = jnp.zeros((capacity_blocks, BLOCK_VOX), jnp.float32)
        self.colors = np.zeros((capacity_blocks, BLOCK_VOX, 3), np.uint8)
        self.table: Dict[Tuple[int, int, int], int] = {}
        self.cache: Dict[int, Tuple[np.ndarray, np.ndarray, Optional[np.ndarray]]] = {}
        self.poses: Dict[int, np.ndarray] = {}
        self.full = False

    # ------------------------------------------------------------ internals

    def _slots_for(self, block_keys: np.ndarray) -> np.ndarray:
        """Map (M,3) block coords -> slab slots, allocating as needed."""
        out = np.empty(block_keys.shape[0], np.int64)
        for i, k in enumerate(map(tuple, block_keys)):
            slot = self.table.get(k)
            if slot is None:
                if len(self.table) >= self.cap:
                    self.full = True
                    slot = -1
                else:
                    slot = len(self.table)
                    self.table[k] = slot
            out[i] = slot
        return out

    def _integrate(self, pose, pts, valid, colors=None):
        occ, free, occ_ok, free_ok = _ray_samples(
            jnp.asarray(pose), jnp.asarray(pts), jnp.asarray(valid),
            self.voxel, self.n_free, self.max_range)
        occ = np.asarray(occ)[np.asarray(occ_ok)]
        free = np.asarray(free)[np.asarray(free_ok)]
        if colors is not None:
            col = np.asarray(colors)[np.asarray(occ_ok)]
        # collapse duplicates; occupied endpoints take priority over free
        occ_u, occ_first = np.unique(occ, axis=0, return_index=True)
        free_u = np.unique(free, axis=0)
        if occ_u.size:
            occ_set = set(map(tuple, occ_u))
            keep = np.fromiter((tuple(v) not in occ_set for v in free_u), bool,
                               len(free_u)) if free_u.size else np.zeros(0, bool)
            free_u = free_u[keep]
        coords = np.concatenate([occ_u, free_u]) if free_u.size else occ_u
        delta = np.concatenate([
            np.full(len(occ_u), self.OCC_INC, np.float32),
            np.full(len(free_u), -self.FREE_DEC, np.float32),
        ])
        if coords.size == 0:
            return
        bk = np.floor_divide(coords, BLOCK)
        uniq_bk, inv = np.unique(bk, axis=0, return_inverse=True)
        slots = self._slots_for(uniq_bk)[inv]
        local = coords - bk * BLOCK
        lidx = (local[:, 0] * BLOCK + local[:, 1]) * BLOCK + local[:, 2]
        lin = slots * BLOCK_VOX + lidx
        mask = slots >= 0
        self.bricks = _scatter_logodds(
            self.bricks, jnp.asarray(lin), jnp.asarray(delta),
            jnp.asarray(mask), self.CLAMP)
        if colors is not None and len(occ_u):
            osl = slots[:len(occ_u)]
            oli = lin[:len(occ_u)] - osl * BLOCK_VOX
            m = osl >= 0
            self.colors[osl[m], oli[m]] = col[occ_first][m]

    # ------------------------------------------------------------------ API

    def update(self, node_id: int, pose, pts, valid, colors=None):
        """Integrate one node's cloud (camera/base-frame points + node pose).
        Re-updating an existing node re-assembles the whole map (pose moved)."""
        reassemble = node_id in self.cache
        self.cache[node_id] = (np.asarray(pts), np.asarray(valid),
                               None if colors is None else np.asarray(colors))
        self.poses[node_id] = np.asarray(pose)
        if reassemble:
            self.assemble(self.poses)
        else:
            self._integrate(pose, pts, valid, colors)

    def assemble(self, poses: Dict[int, np.ndarray]):
        """Rebuild from cached node clouds at new (optimized) poses."""
        self.bricks = jnp.zeros_like(self.bricks)
        self.colors[:] = 0
        self.table.clear()
        self.full = False
        for nid, pose in poses.items():
            if nid in self.cache:
                self.poses[nid] = np.asarray(pose)
                pts, valid, colors = self.cache[nid]
                self._integrate(pose, pts, valid, colors)

    def query(self, world_pts) -> np.ndarray:
        """Occupancy probability at world points (unknown -> 0.5)."""
        coords = np.floor(np.asarray(world_pts) / self.voxel).astype(np.int64)
        bk = np.floor_divide(coords, BLOCK)
        local = coords - bk * BLOCK
        lidx = (local[:, 0] * BLOCK + local[:, 1]) * BLOCK + local[:, 2]
        slots = np.array([self.table.get(tuple(k), -1) for k in bk])
        flat = np.asarray(self.bricks).reshape(-1)
        lo = np.where(slots >= 0, flat[np.clip(slots, 0, None) * BLOCK_VOX + lidx], 0.0)
        return 1.0 / (1.0 + np.exp(-lo))

    def occupied_voxels(self, thr: float = 0.65):
        """-> (centers (M,3) world meters, probs (M,), colors (M,3) u8)."""
        lo = np.asarray(self.bricks)
        prob = 1.0 / (1.0 + np.exp(-lo))
        keys = np.zeros((self.cap, 3), np.int64)
        for k, s in self.table.items():
            keys[s] = k
        out_c, out_p, out_col = [], [], []
        occ = prob >= thr
        for s in range(len(self.table)):
            idx = np.nonzero(occ[s])[0]
            if idx.size == 0:
                continue
            lz = idx % BLOCK
            ly = (idx // BLOCK) % BLOCK
            lx = idx // (BLOCK * BLOCK)
            vox = keys[s] * BLOCK + np.stack([lx, ly, lz], axis=1)
            out_c.append((vox + 0.5) * self.voxel)
            out_p.append(prob[s][idx])
            out_col.append(self.colors[s][idx])
        if not out_c:
            return (np.zeros((0, 3)), np.zeros((0,)), np.zeros((0, 3), np.uint8))
        return np.concatenate(out_c), np.concatenate(out_p), np.concatenate(out_col)


# ----------------------------------------------------------------- elevation


@jax.jit
def _elev_scatter(hmax, hsum, hcnt, cells, heights, mask):
    n = hmax.shape[0]
    idx = jnp.where(mask, cells, n * n)
    hmax = hmax.reshape(-1)
    pad_max = jnp.concatenate([hmax, jnp.full((1,), -jnp.inf)])
    pad_max = pad_max.at[idx].max(jnp.where(mask, heights, -jnp.inf))
    hsum = hsum.reshape(-1).at[jnp.where(mask, cells, n * n)].add(
        jnp.where(mask, heights, 0.0), mode="drop")
    hcnt = hcnt.reshape(-1).at[jnp.where(mask, cells, n * n)].add(
        jnp.where(mask, 1.0, 0.0), mode="drop")
    return pad_max[:-1].reshape(n, n), hsum.reshape(n, n), hcnt.reshape(n, n)


class ElevationMap:
    """2D height-surface map (max + mean height per cell) assembled from node
    clouds (reference: global_map/GridMap.cpp elevation layer)."""

    def __init__(self, cell_size: float = 0.1, size_m: float = 40.0,
                 up_axis: int = 2):
        self.cell = cell_size
        self.n = int(size_m / cell_size)
        self.origin = -size_m / 2.0
        self.up = up_axis
        self.plane = tuple(a for a in (0, 1, 2) if a != up_axis)
        self._reset()
        self.cache: Dict[int, Tuple[np.ndarray, np.ndarray]] = {}
        self.poses: Dict[int, np.ndarray] = {}

    def _reset(self):
        self.hmax = jnp.full((self.n, self.n), -jnp.inf)
        self.hsum = jnp.zeros((self.n, self.n))
        self.hcnt = jnp.zeros((self.n, self.n))

    def _apply(self, pose, pts, valid):
        world = T.apply(jnp.asarray(pose)[None], jnp.asarray(pts)[None])[0]
        uv = world[:, jnp.asarray(self.plane)]
        h = world[:, self.up]
        cx = jnp.floor((uv[:, 0] - self.origin) / self.cell).astype(jnp.int32)
        cy = jnp.floor((uv[:, 1] - self.origin) / self.cell).astype(jnp.int32)
        ok = jnp.asarray(valid) & (cx >= 0) & (cx < self.n) & (cy >= 0) & (cy < self.n)
        cells = cy * self.n + cx
        self.hmax, self.hsum, self.hcnt = _elev_scatter(
            self.hmax, self.hsum, self.hcnt, cells, h, ok)

    def update(self, node_id: int, pose, pts, valid):
        reassemble = node_id in self.cache
        self.cache[node_id] = (np.asarray(pts), np.asarray(valid))
        self.poses[node_id] = np.asarray(pose)
        if reassemble:
            self.assemble(self.poses)
        else:
            self._apply(pose, pts, valid)

    def assemble(self, poses: Dict[int, np.ndarray]):
        self._reset()
        for nid, pose in poses.items():
            if nid in self.cache:
                self.poses[nid] = np.asarray(pose)
                self._apply(pose, *self.cache[nid])

    def arrays(self):
        """-> (max_height, mean_height, known mask), unknown cells = nan."""
        cnt = np.asarray(self.hcnt)
        known = cnt > 0
        hmax = np.asarray(self.hmax)
        mean = np.where(known, np.asarray(self.hsum) / np.maximum(cnt, 1), np.nan)
        hmax = np.where(known, hmax, np.nan)
        return hmax, mean, known
