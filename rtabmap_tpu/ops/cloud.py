"""Point-cloud utilities: depth->cloud, voxel filtering, normals, ranges.

Capability parity: the reference's ``util3d`` toolbox
(/root/reference/corelib/src/util3d.cpp cloudFromDepth*,
util3d_filtering.cpp voxel/range/normal filtering — 2,555 LoC of PCL
calls). TPU-first: clouds are fixed-capacity (N,3) slabs with validity
masks; voxel filtering is hash-scatter (no octree); normals come from
k-NN covariance eigenvectors via one matmul distance + batched 3x3 eigh.
"""
from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from rtabmap_tpu.geometry import camera as C
from rtabmap_tpu.ops import linalg as L3


def cloud_from_depth(depth, cam: C.CameraModel, decimation: int = 1,
                     min_depth: float = 0.0, max_depth: float = 0.0):
    """Dense organized cloud (H*W, 3) camera frame + validity mask.

    (reference: util3d::cloudFromDepth, util3d.h:84.)
    """
    d = depth[::decimation, ::decimation]
    H, W = d.shape
    vv, uu = jnp.meshgrid(jnp.arange(H, dtype=jnp.float32), jnp.arange(W, dtype=jnp.float32), indexing="ij")
    scale = float(decimation)
    uv = jnp.stack([uu * scale, vv * scale], axis=-1).reshape(-1, 2)
    z = d.reshape(-1)
    pts = C.backproject(uv, z, cam)
    ok = z > (min_depth if min_depth > 0 else 1e-6)
    if max_depth > 0:
        ok = ok & (z < max_depth)
    return pts, ok


def transform_cloud(T_ab, pts):
    from rtabmap_tpu.geometry import transform as T

    return T.apply(T_ab[None], pts[None])[0]


@partial(jax.jit, static_argnames=("hash_size",))
def voxel_filter(pts, valid, voxel: float, hash_size: int = 1 << 16):
    """Approximate voxel downsample: keep the first point landing in each
    voxel hash cell (reference: util3d::voxelize). Returns updated validity
    (points are not moved/merged — slab semantics)."""
    q = jnp.floor(pts / voxel).astype(jnp.int32)
    h = (q[:, 0] * 73856093 ^ q[:, 1] * 19349663 ^ q[:, 2] * 83492791) & (hash_size - 1)
    n = pts.shape[0]
    order = jnp.arange(n, dtype=jnp.int32)
    slot_owner = jnp.full((hash_size,), n, jnp.int32).at[h].min(
        jnp.where(valid, order, n), mode="drop")
    keep = slot_owner[h] == order
    return valid & keep


@partial(jax.jit, static_argnames=("k",))
def estimate_normals(pts, valid, k: int = 8, viewpoint: Optional[jnp.ndarray] = None):
    """k-NN PCA normals for a (N,3) slab (reference: util3d normals via
    PCL NormalEstimation). Exact brute-force k-NN (matmul distances) —
    N up to ~4k per call; for organized grids use normals_from_depth."""
    n = pts.shape[0]
    d2 = jnp.sum((pts[:, None] - pts[None]) ** 2, axis=-1)
    d2 = jnp.where(valid[None, :] & valid[:, None], d2, jnp.inf)
    _, idx = jax.lax.top_k(-d2, k)
    nbrs = pts[idx]                       # (N,k,3)
    mu = jnp.mean(nbrs, axis=1, keepdims=True)
    X = nbrs - mu
    cov = jnp.einsum("nki,nkj->nij", X, X) / k
    # analytic smallest eigenpair — jnp.linalg.eigh lowers to an EighTpu
    # custom call that costs ms per launch (see ops/linalg.py)
    lam_min, normal = L3.eigvec_min_sym3(cov)
    if viewpoint is None:
        viewpoint = jnp.zeros((3,))
    to_vp = viewpoint[None] - pts
    flip = jnp.sum(normal * to_vp, axis=-1) < 0
    normal = jnp.where(flip[:, None], -normal, normal)
    curvature = lam_min / jnp.maximum(jnp.trace(cov, axis1=-2, axis2=-1), 1e-12)
    return jnp.where(valid[:, None], normal, 0.0), curvature


def normals_from_depth(depth, cam: C.CameraModel):
    """Organized normals via cross product of image-gradient tangents
    (fast path for dense depth; reference organized normal estimation)."""
    pts, ok = cloud_from_depth(depth, cam)
    H, W = depth.shape
    P = pts.reshape(H, W, 3)
    dx = jnp.roll(P, -1, axis=1) - jnp.roll(P, 1, axis=1)
    dy = jnp.roll(P, -1, axis=0) - jnp.roll(P, 1, axis=0)
    n = jnp.cross(dy, dx)
    n = n / jnp.maximum(jnp.linalg.norm(n, axis=-1, keepdims=True), 1e-9)
    # orient toward camera (origin)
    flip = jnp.sum(n * P, axis=-1) > 0
    n = jnp.where(flip[..., None], -n, n)
    return n.reshape(-1, 3), ok


def range_filter(pts, valid, min_range: float = 0.0, max_range: float = 0.0):
    r = jnp.linalg.norm(pts, axis=-1)
    ok = valid
    if min_range > 0:
        ok = ok & (r >= min_range)
    if max_range > 0:
        ok = ok & (r <= max_range)
    return ok


def crop_box(pts, valid, lo, hi):
    ok = jnp.all((pts >= jnp.asarray(lo)) & (pts <= jnp.asarray(hi)), axis=-1)
    return valid & ok


def random_subsample(pts, valid, target: int, key):
    """Keep at most ``target`` valid points (mask update)."""
    n = pts.shape[0]
    score = jax.random.uniform(key, (n,)) + (~valid) * 10.0
    thresh = jnp.sort(score)[jnp.minimum(target, n) - 1]
    return valid & (score <= thresh)
