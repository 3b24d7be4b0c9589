"""Pinhole / stereo camera models as pure batched functions.

Capability parity: ``CameraModel`` / ``StereoCameraModel`` in the reference
(/root/reference/corelib/src/CameraModel.cpp, StereoCameraModel.cpp) —
intrinsics, radial-tangential distortion, rectification, project /
backproject, yaml-ish IO — re-designed as a small pytree + functional ops so
projection runs batched on the VPU inside jitted registration/BA kernels.
"""
from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np


class CameraModel(NamedTuple):
    """Intrinsics pytree. ``local_transform`` maps camera frame -> base frame
    (reference default: optical rotation x-right,y-down,z-forward ->
    x-forward,y-left,z-up)."""

    fx: jnp.ndarray
    fy: jnp.ndarray
    cx: jnp.ndarray
    cy: jnp.ndarray
    width: int = 0
    height: int = 0
    # distortion k1,k2,p1,p2,k3 (plumb bob)
    dist: Optional[jnp.ndarray] = None
    # 3x4 pose of camera in robot base frame
    local_transform: Optional[jnp.ndarray] = None

    @staticmethod
    def make(fx, fy, cx, cy, width=0, height=0, dist=None, local_transform=None):
        # HOST scalars/arrays, not device arrays: a 0-d device array captured
        # as a jit closure constant is re-fed per call (~ms each through the
        # TPU tunnel); numpy scalars fold into the compiled program for free.
        f32 = lambda v: np.asarray(v, np.float32)
        return CameraModel(
            f32(fx), f32(fy), f32(cx), f32(cy), int(width), int(height),
            None if dist is None else f32(dist),
            None if local_transform is None else f32(local_transform),
        )

    def K(self):
        z = jnp.zeros_like(self.fx)
        o = jnp.ones_like(self.fx)
        return jnp.stack(
            [
                jnp.stack([self.fx, z, self.cx], -1),
                jnp.stack([z, self.fy, self.cy], -1),
                jnp.stack([z, z, o], -1),
            ],
            axis=-2,
        )

    def scaled(self, s: float) -> "CameraModel":
        return self._replace(
            fx=self.fx * s, fy=self.fy * s, cx=self.cx * s, cy=self.cy * s,
            width=int(self.width * s), height=int(self.height * s),
        )


class StereoCameraModel(NamedTuple):
    left: CameraModel
    right: CameraModel
    baseline: jnp.ndarray  # meters

    @staticmethod
    def make(fx, fy, cx, cy, baseline, width=0, height=0, local_transform=None):
        cam = CameraModel.make(fx, fy, cx, cy, width, height, local_transform=local_transform)
        return StereoCameraModel(cam, cam, np.asarray(baseline, np.float32))


# --------------------------------------------------------------------------- ops


def project(pts_cam, cam: CameraModel):
    """Camera-frame 3D points (...,N,3) -> pixels (...,N,2) + depth (...,N)."""
    z = pts_cam[..., 2]
    zs = jnp.where(jnp.abs(z) > 1e-9, z, 1e-9)
    u = pts_cam[..., 0] / zs * cam.fx + cam.cx
    v = pts_cam[..., 1] / zs * cam.fy + cam.cy
    return jnp.stack([u, v], axis=-1), z


def backproject(uv, depth, cam: CameraModel):
    """Pixels (...,N,2) + depth (...,N) -> camera-frame 3D (...,N,3)."""
    x = (uv[..., 0] - cam.cx) / cam.fx * depth
    y = (uv[..., 1] - cam.cy) / cam.fy * depth
    return jnp.stack([x, y, depth], axis=-1)


def distort(uv_norm, dist):
    """Apply plumb-bob distortion to normalized coords (...,N,2)."""
    k1, k2, p1, p2, k3 = (dist[..., i] for i in range(5))
    x, y = uv_norm[..., 0], uv_norm[..., 1]
    r2 = x * x + y * y
    radial = 1.0 + r2 * (k1 + r2 * (k2 + r2 * k3))
    xt = x * radial + 2 * p1 * x * y + p2 * (r2 + 2 * x * x)
    yt = y * radial + p1 * (r2 + 2 * y * y) + 2 * p2 * x * y
    return jnp.stack([xt, yt], axis=-1)


def undistort_points(uv, cam: CameraModel, iters: int = 5):
    """Iterative inverse distortion on pixel coords (fixed iteration count —
    jit friendly). No-op if the model has no distortion."""
    if cam.dist is None:
        return uv
    xn = (uv[..., 0] - cam.cx) / cam.fx
    yn = (uv[..., 1] - cam.cy) / cam.fy
    target = jnp.stack([xn, yn], axis=-1)

    def body(_, cur):
        d = distort(cur, cam.dist) - cur
        return target - d

    und = jax.lax.fori_loop(0, iters, body, target)
    u = und[..., 0] * cam.fx + cam.cx
    v = und[..., 1] * cam.fy + cam.cy
    return jnp.stack([u, v], axis=-1)


def rectify_map(cam: CameraModel):
    """Host-side: dense undistortion sampling map (H,W,2) for image rectify."""
    H, W = cam.height, cam.width
    vv, uu = np.meshgrid(np.arange(H, dtype=np.float32), np.arange(W, dtype=np.float32), indexing="ij")
    xn = (uu - float(cam.cx)) / float(cam.fx)
    yn = (vv - float(cam.cy)) / float(cam.fy)
    grid = jnp.asarray(np.stack([xn, yn], axis=-1))
    dist_uv = distort(grid.reshape(-1, 2), cam.dist).reshape(H, W, 2)
    u = dist_uv[..., 0] * cam.fx + cam.cx
    v = dist_uv[..., 1] * cam.fy + cam.cy
    return jnp.stack([u, v], axis=-1)


def disparity_to_depth(disparity, stereo: StereoCameraModel):
    valid = disparity > 0
    return jnp.where(valid, stereo.left.fx * stereo.baseline / jnp.where(valid, disparity, 1.0), 0.0)


def depth_to_disparity(depth, stereo: StereoCameraModel):
    valid = depth > 0
    return jnp.where(valid, stereo.left.fx * stereo.baseline / jnp.where(valid, depth, 1.0), 0.0)


def in_image(uv, width, height, border: float = 0.0):
    return (
        (uv[..., 0] >= border)
        & (uv[..., 0] < width - border)
        & (uv[..., 1] >= border)
        & (uv[..., 1] < height - border)
    )
