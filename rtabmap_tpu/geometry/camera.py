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
    # left->right extrinsics (reference StereoCameraModel R_/T_); None for
    # an ideal pre-rectified pair
    R: Optional[jnp.ndarray] = None   # (3,3)
    T: Optional[jnp.ndarray] = None   # (3,)

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


# ------------------------------------------------- full stereo rectification


def _rodrigues(rvec):
    th = np.linalg.norm(rvec)
    if th < 1e-12:
        return np.eye(3)
    k = rvec / th
    K = np.array([[0, -k[2], k[1]], [k[2], 0, -k[0]], [-k[1], k[0], 0]])
    return np.eye(3) + np.sin(th) * K + (1 - np.cos(th)) * (K @ K)


def _log_so3(R):
    c = np.clip((np.trace(R) - 1.0) / 2.0, -1.0, 1.0)
    th = np.arccos(c)
    if th < 1e-12:
        return np.zeros(3)
    w = np.array([R[2, 1] - R[1, 2], R[0, 2] - R[2, 0], R[1, 0] - R[0, 1]])
    return th / (2.0 * np.sin(th)) * w


def stereo_rectify(left: CameraModel, right: CameraModel, R, T):
    """Bouguet stereo rectification (reference:
    StereoCameraModel::stereoRectifyFisheye / cv::stereoRectify used in
    StereoCameraModel.cpp:618 ``initRectificationMap``): split the
    relative rotation between the heads, align the x-axis with the
    baseline, return (R1, R2, P1, P2) — per-camera rectification
    rotations (3,3) and rectified projection matrices (3,4)."""
    R = np.asarray(R, np.float64)
    T = np.asarray(T, np.float64).reshape(3)
    # X_r = R X_l + T: rotating left by R^{1/2} and right by R^{-1/2}
    # leaves a pure translation t = R^{-1/2} T between the new frames
    om = _log_so3(R)
    r_l = _rodrigues(0.5 * om)
    r_r = _rodrigues(-0.5 * om)
    t = r_r @ T
    # x axis along the baseline, SIGNED so it points along positive image
    # x (cv::stereoRectify's uu sign) — keeps disparity positive
    horizontal = abs(t[0]) >= abs(t[1])
    s = 1.0 if t[0 if horizontal else 1] >= 0 else -1.0
    e1 = s * t / max(np.linalg.norm(t), 1e-12)
    if horizontal:
        e2 = np.array([-e1[1], e1[0], 0.0])
    else:
        e2 = np.array([e1[1], -e1[0], 0.0])
    e2 /= max(np.linalg.norm(e2), 1e-12)
    e3 = np.cross(e1, e2)
    R_rect = np.stack([e1, e2, e3])
    if np.linalg.det(R_rect) < 0:
        R_rect[2] *= -1
    R1 = R_rect @ r_l
    R2 = R_rect @ r_r
    # shared rectified intrinsics (cv::stereoRectify alpha=0 convention
    # simplified: f = mean fy, principal point = mean of the two heads)
    f = 0.5 * (float(left.fy) + float(right.fy))
    cx = 0.5 * (float(left.cx) + float(right.cx))
    cy = 0.5 * (float(left.cy) + float(right.cy))
    P1 = np.array([[f, 0, cx, 0], [0, f, cy, 0], [0, 0, 1, 0]])
    P2 = P1.copy()
    tx = float((R_rect @ t)[0]) if abs(t[0]) >= abs(t[1]) else 0.0
    ty = float((R_rect @ t)[1]) if abs(t[0]) < abs(t[1]) else 0.0
    P2[0, 3] = f * tx
    P2[1, 3] = f * ty
    return (R1.astype(np.float32), R2.astype(np.float32),
            P1.astype(np.float32), P2.astype(np.float32))


def rectify_map_full(cam: CameraModel, R1, P1):
    """Dense rectification sampling map (H,W,2) INCLUDING the rotation
    R1 and new projection P1 (cv::initUndistortRectifyMap equivalent;
    the reference builds these maps in initRectificationMap). For each
    rectified pixel: normalized ray through P1 -> rotate by R1^T ->
    distort -> project with the ORIGINAL intrinsics = source pixel."""
    H, W = cam.height, cam.width
    vv, uu = np.meshgrid(np.arange(H, dtype=np.float32),
                         np.arange(W, dtype=np.float32), indexing="ij")
    P1 = np.asarray(P1, np.float64)
    R1 = np.asarray(R1, np.float64)
    xn = (uu - P1[0, 2]) / P1[0, 0]
    yn = (vv - P1[1, 2]) / P1[1, 1]
    rays = np.stack([xn, yn, np.ones_like(xn)], axis=-1) @ R1  # (R1^T ray)^T
    xn = (rays[..., 0] / rays[..., 2]).astype(np.float32)
    yn = (rays[..., 1] / rays[..., 2]).astype(np.float32)
    grid = jnp.asarray(np.stack([xn, yn], axis=-1)).reshape(-1, 2)
    if cam.dist is not None:
        grid = distort(grid, cam.dist)
    u = grid[:, 0].reshape(H, W) * cam.fx + cam.cx
    v = grid[:, 1].reshape(H, W) * cam.fy + cam.cy
    return jnp.stack([u, v], axis=-1)


def stereo_rectification_maps(stereo: StereoCameraModel):
    """(map_left, map_right, rectified StereoCameraModel) for a calibrated
    pair with known extrinsics (reference: initRectificationMap)."""
    if stereo.R is None or stereo.T is None:
        raise ValueError("stereo model has no extrinsics (R/T)")
    R1, R2, P1, P2 = stereo_rectify(stereo.left, stereo.right,
                                    stereo.R, stereo.T)
    m1 = rectify_map_full(stereo.left, R1, P1)
    m2 = rectify_map_full(stereo.right, R2, P2)
    f, cx, cy = float(P1[0, 0]), float(P1[0, 2]), float(P1[1, 2])
    base = abs(float(P2[0, 3]) / f) if P2[0, 3] != 0 else \
        abs(float(P2[1, 3]) / f)
    rect = StereoCameraModel.make(f, f, cx, cy, base,
                                  width=stereo.left.width,
                                  height=stereo.left.height,
                                  local_transform=stereo.left.local_transform)
    return m1, m2, rect


# ----------------------------------------------------------------- yaml IO


def _yaml_mat(name, arr):
    arr = np.asarray(arr, np.float64)
    data = ", ".join(f"{v:.12g}" for v in arr.reshape(-1))
    return (f"{name}:\n   rows: {arr.shape[0]}\n   cols: "
            f"{arr.shape[1] if arr.ndim > 1 else 1}\n"
            f"   data: [ {data} ]\n")


def save_yaml(cam: CameraModel, path: str, name: str = "camera",
              R=None, P=None) -> None:
    """OpenCV/ROS-style camera yaml (reference: CameraModel::save,
    CameraModel.cpp:414-500 — camera_matrix / distortion_coefficients /
    rectification_matrix / projection_matrix / local_transform)."""
    K = np.asarray([[float(cam.fx), 0, float(cam.cx)],
                    [0, float(cam.fy), float(cam.cy)], [0, 0, 1]])
    D = (np.zeros((1, 5)) if cam.dist is None
         else np.asarray(cam.dist, np.float64).reshape(1, -1))
    R = np.eye(3) if R is None else np.asarray(R)
    P = np.concatenate([K, np.zeros((3, 1))], 1) if P is None else np.asarray(P)
    with open(path, "w") as f:
        f.write("%YAML:1.0\n---\n")
        f.write(f"camera_name: {name}\n")
        f.write(f"image_width: {int(cam.width)}\n")
        f.write(f"image_height: {int(cam.height)}\n")
        f.write(_yaml_mat("camera_matrix", K))
        f.write(_yaml_mat("distortion_coefficients", D))
        f.write("distortion_model: plumb_bob\n")
        f.write(_yaml_mat("rectification_matrix", R))
        f.write(_yaml_mat("projection_matrix", P))
        if cam.local_transform is not None:
            f.write(_yaml_mat("local_transform",
                              np.asarray(cam.local_transform)))


def _parse_yaml(path: str):
    """Tolerant parser for the OpenCV FileStorage subset written above
    (and by the reference/ROS camera_calibration)."""
    import re

    txt = open(path).read()
    out = {}
    for m in re.finditer(r"^(\w+):\s*([^\n{]*)$", txt, re.M):
        k, v = m.group(1), m.group(2).strip()
        if v and not v.startswith("!"):
            out[k] = v
    for m in re.finditer(
            r"(\w+):\s*(?:!!opencv-matrix)?\s*\n\s+rows:\s*(\d+)\s*\n\s+cols:"
            r"\s*(\d+)\s*\n(?:\s+dt:\s*\w+\s*\n)?\s+data:\s*\[([^\]]*)\]",
            txt):
        name, r, c = m.group(1), int(m.group(2)), int(m.group(3))
        vals = np.array([float(x) for x in m.group(4).replace("\n", " ")
                        .split(",") if x.strip()], np.float64)
        out[name] = vals.reshape(r, c)
    return out


def load_yaml(path: str) -> CameraModel:
    """Load a camera yaml (reference: CameraModel::load,
    CameraModel.cpp:236-380)."""
    d = _parse_yaml(path)
    K = d["camera_matrix"]
    dist = d.get("distortion_coefficients")
    lt = d.get("local_transform")
    return CameraModel.make(
        K[0, 0], K[1, 1], K[0, 2], K[1, 2],
        width=int(d.get("image_width", 0)),
        height=int(d.get("image_height", 0)),
        dist=None if dist is None else dist.reshape(-1),
        local_transform=None if lt is None else lt.reshape(3, 4))


def save_stereo_yaml(stereo: StereoCameraModel, directory: str,
                     name: str = "stereo") -> None:
    """Save left/right yamls + pose yaml (reference:
    StereoCameraModel::save — <name>_left.yaml, <name>_right.yaml,
    <name>_pose.yaml with the left->right extrinsics)."""
    import os

    save_cam = save_yaml
    if stereo.R is not None and stereo.T is not None:
        R1, R2, P1, P2 = stereo_rectify(stereo.left, stereo.right,
                                        stereo.R, stereo.T)
        save_cam(stereo.left, os.path.join(directory, f"{name}_left.yaml"),
                 name=f"{name}_left", R=R1, P=P1)
        save_cam(stereo.right, os.path.join(directory, f"{name}_right.yaml"),
                 name=f"{name}_right", R=R2, P=P2)
    else:
        save_cam(stereo.left, os.path.join(directory, f"{name}_left.yaml"),
                 name=f"{name}_left")
        save_cam(stereo.right, os.path.join(directory, f"{name}_right.yaml"),
                 name=f"{name}_right")
    with open(os.path.join(directory, f"{name}_pose.yaml"), "w") as f:
        f.write("%YAML:1.0\n---\n")
        f.write(f"camera_name: {name}\n")
        f.write(f"baseline: {float(stereo.baseline):.12g}\n")
        if stereo.R is not None:
            f.write(_yaml_mat("rotation_matrix", np.asarray(stereo.R)))
        if stereo.T is not None:
            f.write(_yaml_mat("translation_matrix",
                              np.asarray(stereo.T).reshape(1, 3)))


def load_stereo_yaml(directory: str, name: str = "stereo") -> StereoCameraModel:
    """Load a stereo rig saved by ``save_stereo_yaml`` (reference:
    StereoCameraModel::load)."""
    import os

    left = load_yaml(os.path.join(directory, f"{name}_left.yaml"))
    right = load_yaml(os.path.join(directory, f"{name}_right.yaml"))
    d = _parse_yaml(os.path.join(directory, f"{name}_pose.yaml"))
    R = d.get("rotation_matrix")
    T = d.get("translation_matrix")
    base = float(d.get("baseline", 0.0))
    if base == 0.0 and T is not None:
        base = float(np.linalg.norm(T))
    return StereoCameraModel(
        left, right, np.asarray(base, np.float32),
        R=None if R is None else R.astype(np.float32),
        T=None if T is None else T.reshape(3).astype(np.float32))
