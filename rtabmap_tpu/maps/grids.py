"""Occupancy mapping: per-node local grids + incremental global assembly.

Capability parity: the reference's ``LocalGridMaker``
(/root/reference/corelib/src/LocalGridMaker.cpp + util3d_mapping.cpp —
ground/obstacle segmentation from depth clouds, ray-traced empty space)
and the ``GlobalMap`` family (corelib/src/global_map/ — 2D
``OccupancyGrid`` with incremental update/assemble + cache, ``CloudMap``).

TPU-first: local-grid extraction is one jitted kernel (cloud -> ground/
obstacle masks by normal angle + height; ray tracing = fixed-step
sampling along all rays at once, a (N_rays, N_steps) scatter). Global
assembly runs on a fixed-capacity log-odds canvas with per-node scatter
updates and supports re-assembly from cached local grids when poses move
(the reference's update-on-graph-change semantics).
"""
from __future__ import annotations

from functools import partial
from typing import Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from rtabmap_tpu.geometry import camera as C
from rtabmap_tpu.geometry import transform as T


class LocalGrid(NamedTuple):
    """Per-node cells in the node's local frame (fixed capacity, masked)."""

    ground: jnp.ndarray      # (Ng,2) xy cells (meters)
    ground_valid: jnp.ndarray
    obstacles: jnp.ndarray   # (No,2)
    obstacles_valid: jnp.ndarray
    empty: jnp.ndarray       # (Ne,2) ray-traced free cells
    empty_valid: jnp.ndarray


@partial(jax.jit, static_argnames=("cell_size", "max_points", "ray_steps"))
def local_grid_from_cloud(pts, valid, normals, cell_size: float = 0.05,
                          max_ground_angle: float = 0.785,  # 45 deg
                          max_ground_height: float = 0.15,
                          max_range: float = 8.0,
                          max_points: int = 2048,
                          ray_steps: int = 64) -> LocalGrid:
    """Segment a base-frame cloud (z up) into ground/obstacle cells and
    ray-trace empty cells toward each measured point.

    (reference: LocalGridMaker::createLocalMap — normal-angle ground
    segmentation + util3d_mapping ray tracing.)
    """
    n = pts.shape[0]
    up = jnp.array([0.0, 0.0, 1.0])
    cosang = jnp.abs(jnp.sum(normals * up[None], axis=-1))
    is_ground = valid & (cosang > jnp.cos(max_ground_angle)) & (
        jnp.abs(pts[:, 2]) < max_ground_height)
    in_range = valid & (jnp.linalg.norm(pts[:, :2], axis=-1) < max_range)
    is_obstacle = in_range & ~is_ground

    # subsample to fixed capacity by priority (valid first)
    def take(mask, cap):
        prio = mask.astype(jnp.float32) - jnp.arange(n) * 1e-9
        _, idx = jax.lax.top_k(prio, cap)
        return pts[idx, :2], mask[idx]

    cap = max_points
    g_xy, g_ok = take(is_ground & in_range, cap)
    o_xy, o_ok = take(is_obstacle, cap)

    # ray tracing: sample along rays from origin to each obstacle/ground
    # point; all cells strictly before the hit are empty
    tgt, tgt_ok = take(in_range, cap)
    steps = jnp.linspace(0.05, 0.95, ray_steps)
    ray_pts = tgt[:, None, :] * steps[None, :, None]       # (cap, S, 2)
    e_xy = ray_pts.reshape(-1, 2)
    e_ok = jnp.repeat(tgt_ok, ray_steps)
    # snap to cell centers + dedupe via hash keep-first
    cells = jnp.floor(e_xy / cell_size)
    h = (cells[:, 0].astype(jnp.int32) * 73856093
         ^ cells[:, 1].astype(jnp.int32) * 19349663) & ((1 << 16) - 1)
    order = jnp.arange(e_xy.shape[0], dtype=jnp.int32)
    owner = jnp.full((1 << 16,), e_xy.shape[0], jnp.int32).at[h].min(
        jnp.where(e_ok, order, e_xy.shape[0]), mode="drop")
    e_ok = e_ok & (owner[h] == order)
    prio = e_ok.astype(jnp.float32) - order * 1e-9
    _, keep = jax.lax.top_k(prio, cap)
    return LocalGrid(
        ground=(jnp.floor(g_xy / cell_size) + 0.5) * cell_size,
        ground_valid=g_ok,
        obstacles=(jnp.floor(o_xy / cell_size) + 0.5) * cell_size,
        obstacles_valid=o_ok,
        empty=(jnp.floor(e_xy[keep] / cell_size) + 0.5) * cell_size,
        empty_valid=e_ok[keep],
    )


def local_grid_from_depth(depth, cam: C.CameraModel, base_T_cam=None,
                          cell_size: float = 0.05, decimation: int = 4,
                          **kw) -> LocalGrid:
    """Depth image -> local grid (camera optical frame rotated to base:
    x fwd, y left, z up)."""
    from rtabmap_tpu.ops import cloud as CL

    pts, ok = CL.cloud_from_depth(depth, cam, decimation=decimation)
    nrm, _ = CL.normals_from_depth(depth[::decimation, ::decimation],
                                   cam.scaled(1.0 / decimation))
    if base_T_cam is None:
        # optical (x right, y down, z fwd) -> base (x fwd, y left, z up)
        base_T_cam = jnp.asarray(
            [[0.0, 0.0, 1.0, 0.0], [-1.0, 0.0, 0.0, 0.0], [0.0, -1.0, 0.0, 0.0]],
            jnp.float32)
    pts_b = T.apply(base_T_cam[None], pts[None])[0]
    nrm_b = jnp.einsum("ij,nj->ni", T.rotation(base_T_cam), nrm)
    return local_grid_from_cloud(pts_b, ok, nrm_b, cell_size=cell_size, **kw)


# ------------------------------------------------------------- global assembly


class OccupancyGrid:
    """Incremental global 2D log-odds grid assembled from per-node local
    grids at their (optimized) poses; re-assembles from cache when poses
    change (reference: global_map/OccupancyGrid + GlobalMap::update/
    assemble, GlobalMap.h:57-75)."""

    OCC_INC = 0.85
    FREE_DEC = 0.7  # sigmoid(-0.7)=0.33 < free threshold after one hit
    CLAMP = 4.0

    def __init__(self, cell_size: float = 0.05, size_m: float = 40.0,
                 up_axis: int = 2):
        """``up_axis``: which WORLD axis is vertical (default z). The grid
        lives in the plane of the two remaining axes; ``pose`` passed to
        update/assemble must be the node's BASE pose (x fwd, z up locally)."""
        self.cell = cell_size
        self.n = int(size_m / cell_size)
        self.origin = -size_m / 2.0
        self.plane = tuple(a for a in (0, 1, 2) if a != up_axis)
        self.logodds = jnp.zeros((self.n, self.n), jnp.float32)
        self.cache: Dict[int, LocalGrid] = {}
        self.poses: Dict[int, np.ndarray] = {}

    def _to_cells(self, pose, xy, valid):
        P = jnp.asarray(pose)
        pts3 = jnp.concatenate([xy, jnp.zeros((xy.shape[0], 1))], axis=-1)
        world3 = T.apply(P[None], pts3[None])[0]
        world = world3[:, jnp.asarray(self.plane)]
        cx = jnp.floor((world[:, 0] - self.origin) / self.cell).astype(jnp.int32)
        cy = jnp.floor((world[:, 1] - self.origin) / self.cell).astype(jnp.int32)
        ok = valid & (cx >= 0) & (cx < self.n) & (cy >= 0) & (cy < self.n)
        return cx, cy, ok

    def _apply_node(self, logodds, pose, grid: LocalGrid, sign: float = 1.0):
        for xy, v, delta in (
            (grid.obstacles, grid.obstacles_valid, self.OCC_INC),
            (grid.ground, grid.ground_valid, -self.FREE_DEC),
            (grid.empty, grid.empty_valid, -self.FREE_DEC),
        ):
            cx, cy, ok = self._to_cells(pose, xy, v)
            idx = jnp.where(ok, cy * self.n + cx, self.n * self.n)
            upd = jnp.zeros((self.n * self.n + 1,)).at[idx].add(
                jnp.where(ok, sign * delta, 0.0))
            logodds = logodds + upd[:-1].reshape(self.n, self.n)
        return jnp.clip(logodds, -self.CLAMP, self.CLAMP)

    def update(self, node_id: int, pose, grid: LocalGrid):
        """Add or move one node's cells."""
        if node_id in self.cache:
            # remove old contribution first (pose changed)
            self.logodds = self._apply_node(
                self.logodds, self.poses[node_id], self.cache[node_id], sign=-1.0)
        self.cache[node_id] = grid
        self.poses[node_id] = np.asarray(pose)
        self.logodds = self._apply_node(self.logodds, pose, grid)

    def assemble(self, poses: Dict[int, np.ndarray]):
        """Full re-assembly at new poses (graph was re-optimized)."""
        self.logodds = jnp.zeros((self.n, self.n), jnp.float32)
        for nid, pose in poses.items():
            if nid in self.cache:
                self.poses[nid] = np.asarray(pose)
                self.logodds = self._apply_node(self.logodds, pose, self.cache[nid])

    def probability(self):
        return jax.nn.sigmoid(self.logodds)

    def to_occupancy(self, occ_thr: float = 0.65, free_thr: float = 0.35):
        """int8 map: -1 unknown, 0 free, 100 occupied (ROS convention,
        matching the reference's exported 2D map)."""
        p = np.asarray(self.probability())
        known = np.abs(np.asarray(self.logodds)) > 1e-3
        out = np.full(p.shape, -1, np.int8)
        out[known & (p >= occ_thr)] = 100
        out[known & (p <= free_thr)] = 0
        return out


class CloudMap:
    """Assembled world point cloud from per-node clouds
    (reference: global_map/CloudMap)."""

    def __init__(self, voxel: float = 0.05):
        self.voxel = voxel
        self.cache: Dict[int, Tuple[np.ndarray, np.ndarray]] = {}
        self.poses: Dict[int, np.ndarray] = {}

    def update(self, node_id: int, pose, pts, valid):
        self.cache[node_id] = (np.asarray(pts), np.asarray(valid))
        self.poses[node_id] = np.asarray(pose)

    def assemble(self, poses: Optional[Dict[int, np.ndarray]] = None) -> np.ndarray:
        poses = poses or self.poses
        out = []
        for nid, (pts, valid) in self.cache.items():
            if nid not in poses:
                continue
            world = np.asarray(T.apply(jnp.asarray(poses[nid])[None],
                                       jnp.asarray(pts)[None])[0])
            out.append(world[valid])
        if not out:
            return np.zeros((0, 3), np.float32)
        cloud = np.concatenate(out)
        if self.voxel > 0:
            q = np.floor(cloud / self.voxel).astype(np.int64)
            _, keep = np.unique(q, axis=0, return_index=True)
            cloud = cloud[np.sort(keep)]
        return cloud


def cleanup_local_grids(poses: Dict[int, np.ndarray],
                        grids: Dict[int, LocalGrid],
                        cell_size: float = 0.05, size_m: float = 40.0,
                        radius: int = 1,
                        filter_ground: bool = False):
    """Filter each node's local-grid obstacle cells against the assembled
    optimized map: obstacles whose map cells (and their ``radius``
    neighborhood) are FREE in the final map are dynamic objects — drop
    them (reference: Rtabmap::cleanupLocalGrids, Rtabmap.cpp:6467 +
    tools/CleanupLocalGrids).

    Returns (cleaned grids dict, total cells removed).
    """
    occ = OccupancyGrid(cell_size=cell_size, size_m=size_m)
    for nid, g in grids.items():
        if nid in poses:
            occ.update(nid, poses[nid], g)
    # "dynamic-filterable" = the consensus says more-likely-free even though
    # some node voted obstacle there (looser than the export free threshold:
    # a transient object leaves one obstacle vote against many empty votes)
    grid_map = occ.to_occupancy(free_thr=0.45)
    free = grid_map == 0
    # an obstacle falls to the dynamic filter only when its whole
    # neighborhood is free: erode the free mask by ``radius``
    for _ in range(radius):
        er = free.copy()
        er[1:] &= free[:-1]
        er[:-1] &= free[1:]
        er[:, 1:] &= free[:, :-1]
        er[:, :-1] &= free[:, 1:]
        free = er
    return _cleanup_against(free, occ, poses, grids, filter_ground)


def _cleanup_against(free: np.ndarray, occ: "OccupancyGrid",
                     poses, grids, filter_ground: bool):
    removed = 0
    out: Dict[int, LocalGrid] = {}
    n = occ.n
    for nid, g in grids.items():
        if nid not in poses:
            out[nid] = g
            continue
        pose = poses[nid]

        def keep_mask(xy, valid):
            cx, cy, ok = occ._to_cells(pose, jnp.asarray(xy), jnp.asarray(valid))
            cx, cy, ok = np.asarray(cx), np.asarray(cy), np.asarray(ok)
            in_free = np.zeros(len(cx), bool)
            m = ok
            in_free[m] = free[cy[m], cx[m]]
            return np.asarray(valid) & ~in_free

        ob_keep = keep_mask(g.obstacles, g.obstacles_valid)
        removed += int(np.asarray(g.obstacles_valid).sum() - ob_keep.sum())
        gr_valid = np.asarray(g.ground_valid)
        if filter_ground:
            gr_keep = keep_mask(g.ground, g.ground_valid)
            removed += int(gr_valid.sum() - gr_keep.sum())
            gr_valid = gr_keep
        out[nid] = g._replace(obstacles_valid=ob_keep, ground_valid=gr_valid)
    return out, removed
