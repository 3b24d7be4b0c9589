"""TSDF volume fusion + surface-net mesh extraction.

Capability parity: the reference's offline surface reconstruction from a
registered map — ``util3d::poisson`` / organized meshing + texturing
(/root/reference/corelib/src/util3d_surface.cpp:4303, PCL Poisson) used by
the export pipeline. TPU re-design: Poisson's octree Laplacian solve is a
poor fit for the MXU; the accelerator-native equivalent is KinectFusion
TSDF fusion — each depth frame updates the whole voxel grid in ONE fused
projective kernel (no octree, no neighbor lists), and a watertight mesh
falls out of the zero crossing. Surface extraction uses naive surface
nets (one vertex per sign-change cell, quads across sign-change edges) —
the branch-free cousin of marching cubes.

Vertex coloring projects each extracted vertex into its most frontal
keyframe (the per-vertex analogue of util3d_surface texture mapping, with
maps.mesh.gain_compensation available for exposure equalization).
"""
from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from rtabmap_tpu.geometry import camera as C
from rtabmap_tpu.geometry import transform as T


class TSDFVolume:
    """Dense truncated signed-distance volume over an axis-aligned box."""

    def __init__(self, origin, size_m, voxel: float = 0.02,
                 truncation: Optional[float] = None, max_weight: float = 64.0):
        self.origin = np.asarray(origin, np.float32)
        self.voxel = float(voxel)
        self.dims = tuple(int(np.ceil(s / voxel)) for s in np.asarray(size_m))
        self.trunc = float(truncation if truncation is not None else 4.0 * voxel)
        self.max_weight = float(max_weight)
        self.tsdf = jnp.ones(self.dims, jnp.float32)
        self.weight = jnp.zeros(self.dims, jnp.float32)

    def integrate(self, depth, pose, cam: C.CameraModel):
        """Fuse one depth frame taken at camera-in-world ``pose`` (3,4)."""
        self.tsdf, self.weight = _integrate(
            self.tsdf, self.weight, jnp.asarray(depth), jnp.asarray(pose),
            cam, jnp.asarray(self.origin), self.voxel, self.trunc,
            self.max_weight)

    def extract_mesh(self):
        """-> (vertices (V,3) world, faces (F,3) int) via surface nets."""
        return surface_nets(np.asarray(self.tsdf), np.asarray(self.weight),
                            self.origin, self.voxel)


@partial(jax.jit, static_argnames=("voxel", "trunc", "max_weight"))
def _integrate(tsdf, weight, depth, pose, cam: C.CameraModel, origin,
               voxel: float, trunc: float, max_weight: float):
    nx, ny, nz = tsdf.shape
    ii = jnp.arange(nx, dtype=jnp.float32)
    jj = jnp.arange(ny, dtype=jnp.float32)
    kk = jnp.arange(nz, dtype=jnp.float32)
    gx, gy, gz = jnp.meshgrid(ii, jj, kk, indexing="ij")
    pts_w = (jnp.stack([gx, gy, gz], axis=-1) + 0.5) * voxel + origin
    # world -> camera
    Tcw = T.inverse(pose)
    pc = jnp.einsum("ij,...j->...i", T.rotation(Tcw), pts_w) + T.translation(Tcw)
    z = pc[..., 2]
    u = pc[..., 0] / jnp.maximum(z, 1e-6) * cam.fx + cam.cx
    v = pc[..., 1] / jnp.maximum(z, 1e-6) * cam.fy + cam.cy
    H, W = depth.shape
    ui = jnp.clip(jnp.round(u).astype(jnp.int32), 0, W - 1)
    vi = jnp.clip(jnp.round(v).astype(jnp.int32), 0, H - 1)
    d = depth[vi, ui]
    in_img = (z > 1e-3) & (u >= 0) & (u < W) & (v >= 0) & (v < H) & (d > 1e-3)
    sdf = d - z
    upd = in_img & (sdf > -trunc)
    tsdf_new = jnp.clip(sdf / trunc, -1.0, 1.0)
    w_new = jnp.where(upd, 1.0, 0.0)
    wsum = weight + w_new
    fused = jnp.where(wsum > 0, (tsdf * weight + tsdf_new * w_new) / jnp.maximum(wsum, 1e-9),
                      tsdf)
    return fused, jnp.minimum(wsum, max_weight)


def surface_nets(tsdf: np.ndarray, weight: np.ndarray, origin, voxel: float,
                 min_weight: float = 1.0) -> Tuple[np.ndarray, np.ndarray]:
    """Naive surface nets over the zero crossing (host-side compaction).

    Returns (vertices (V,3) float32 world coords, faces (F,3) int32,
    triangulated quads)."""
    known = weight >= min_weight
    d = np.where(known, tsdf, np.nan)
    nx, ny, nz = d.shape
    # cell = voxel cube spanning 8 lattice samples
    c = d[:-1, :-1, :-1]
    corners = np.stack([
        d[:-1, :-1, :-1], d[1:, :-1, :-1], d[:-1, 1:, :-1], d[1:, 1:, :-1],
        d[:-1, :-1, 1:], d[1:, :-1, 1:], d[:-1, 1:, 1:], d[1:, 1:, 1:],
    ])  # (8, nx-1, ny-1, nz-1)
    all_known = ~np.isnan(corners).any(axis=0)
    pos = (corners > 0).sum(axis=0)
    active = all_known & (pos > 0) & (pos < 8)
    if not active.any():
        return np.zeros((0, 3), np.float32), np.zeros((0, 3), np.int32)
    # vertex per active cell: centroid of sign-change edge crossings ~ cell
    # center nudged by the field gradient; plain cell center is the naive
    # variant and is fine at SLAM voxel sizes
    idx = np.argwhere(active)  # (V, 3)
    vert_id = np.full(active.shape, -1, np.int64)
    vert_id[tuple(idx.T)] = np.arange(len(idx))
    verts = (idx + 1.0) * voxel + np.asarray(origin)  # lattice cell center

    faces = []
    # for each axis, a quad connects the 4 cells around each sign-change edge
    sign = d > 0
    for axis, (da, db) in enumerate([((0, 1, 1), (0, 1, 0)),
                                     ((1, 0, 1), (0, 0, 1)),
                                     ((1, 1, 0), (1, 0, 0))]):
        # edge along `axis` between lattice points p and p+axis; the 4
        # adjacent cells are p - offsets in the other two axes
        sl_a = [slice(1, -1)] * 3
        sl_b = [slice(1, -1)] * 3
        sl_b[axis] = slice(2, None)
        sa = sign[tuple(sl_a)]
        sb = sign[tuple(sl_b)]
        ka = ~np.isnan(d[tuple(sl_a)])
        kb = ~np.isnan(d[tuple(sl_b)])
        cross = (sa != sb) & ka & kb
        for p in np.argwhere(cross):
            base = p + 1  # sliced -> lattice coords; cell[axis] = q[axis]
            o1 = [0, 0, 0]
            o2 = [0, 0, 0]
            a2, a3 = [a for a in (0, 1, 2) if a != axis]
            quad = []
            okq = True
            for (u_, v_) in ((0, 0), (1, 0), (1, 1), (0, 1)):
                cell = base.copy()
                cell[a2] -= u_
                cell[a3] -= v_
                if (cell < 0).any() or (cell >= np.array(active.shape)).any() \
                        or vert_id[tuple(cell)] < 0:
                    okq = False
                    break
                quad.append(vert_id[tuple(cell)])
            if not okq:
                continue
            # orient by the sign of the field along the edge
            if sa[tuple(p)]:
                quad = quad[::-1]
            faces.append([quad[0], quad[1], quad[2]])
            faces.append([quad[0], quad[2], quad[3]])
    faces_np = (np.asarray(faces, np.int32) if faces
                else np.zeros((0, 3), np.int32))
    return verts.astype(np.float32), faces_np


def color_vertices(vertices, poses, grays, cam: C.CameraModel):
    """Per-vertex intensity from the most frontal observing keyframe
    (reference analogue: util3d_surface texture mapping's per-face camera
    selection, collapsed to vertices)."""
    V = len(vertices)
    best = np.full(V, -1.0)
    col = np.zeros(V, np.float32)
    vts = jnp.asarray(vertices)
    for pose, gray in zip(poses, grays):
        Tcw = T.inverse(jnp.asarray(pose))
        pc = np.asarray(T.apply(Tcw[None], vts[None])[0])
        z = pc[:, 2]
        u = pc[:, 0] / np.maximum(z, 1e-6) * float(cam.fx) + float(cam.cx)
        v = pc[:, 1] / np.maximum(z, 1e-6) * float(cam.fy) + float(cam.cy)
        H, W = np.asarray(gray).shape
        ok = (z > 1e-3) & (u >= 0) & (u < W - 1) & (v >= 0) & (v < H - 1)
        score = np.where(ok, 1.0 / np.maximum(z, 1e-3), -1.0)
        take = score > best
        ui = np.clip(u.astype(np.int32), 0, W - 1)
        vi = np.clip(v.astype(np.int32), 0, H - 1)
        g = np.asarray(gray)[vi, ui]
        col = np.where(take, g, col)
        best = np.maximum(best, score)
    return col, best >= 0
