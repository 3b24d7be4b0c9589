"""Multi-camera rig registration: one body pose from joint observations.

Capability parity: the reference's multi-camera path —
``SensorData`` with multiple camera models and RegistrationVis multi-
camera PnP (/root/reference/corelib/src/RegistrationVis.cpp:315
``computeTransformationImpl`` multi-cam branch; OpenGV-style absolute
pose from several pinhole cameras with known extrinsics).

TPU re-design: the rig is a stacked pytree (per-camera intrinsics +
body-frame extrinsics); per-camera feature extraction vmaps over the
camera axis, and rig registration is one batched RANSAC where hypotheses
are body-frame 3-point Kabsch fits (RGB-D rigs observe 3D in every
camera) and the inlier metric is each observation's reprojection error in
its OWN camera. The refinement is a generalized-PnP Gauss-Newton over the
joint residual set.
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from rtabmap_tpu.geometry import camera as C
from rtabmap_tpu.geometry import transform as T
from rtabmap_tpu.ops import linalg as L3
from rtabmap_tpu.ops import ransac as R


class Rig(NamedTuple):
    """C-camera rig: stacked intrinsics + extrinsics (camera-in-body)."""

    fx: jnp.ndarray        # (C,)
    fy: jnp.ndarray        # (C,)
    cx: jnp.ndarray        # (C,)
    cy: jnp.ndarray        # (C,)
    extrinsics: jnp.ndarray  # (C,3,4) T_body_cam (camera pose in body frame)

    @staticmethod
    def make(cams, extrinsics) -> "Rig":
        return Rig(
            fx=jnp.asarray([float(c.fx) for c in cams]),
            fy=jnp.asarray([float(c.fy) for c in cams]),
            cx=jnp.asarray([float(c.cx) for c in cams]),
            cy=jnp.asarray([float(c.cy) for c in cams]),
            extrinsics=jnp.asarray(np.stack([np.asarray(e) for e in extrinsics])),
        )

    @property
    def n_cameras(self) -> int:
        return self.fx.shape[0]


def rig_normalized(uv, cam_idx, rig: Rig):
    """Pixels -> per-camera normalized coords (K,2)."""
    fx = rig.fx[cam_idx]
    fy = rig.fy[cam_idx]
    cx = rig.cx[cam_idx]
    cy = rig.cy[cam_idx]
    return jnp.stack([(uv[..., 0] - cx) / fx, (uv[..., 1] - cy) / fy], axis=-1)


def rig_residuals(T_wb, pts_w, xn, cam_idx, rig: Rig):
    """Joint reprojection residuals on the normalized plane.

    T_wb: body pose in world (3,4). Observation k: world point pts_w[k]
    seen by camera cam_idx[k] at normalized coords xn[k].
    Returns (residuals (K,2), depths (K,)).
    """
    T_bw = T.inverse(T_wb)
    pts_b = T.apply(T_bw[None], pts_w[None])[0]
    extr = rig.extrinsics[cam_idx]                    # (K,3,4) T_body_cam
    Rcb = jnp.swapaxes(extr[..., :3], -1, -2)          # R^T: body->cam
    pc = jnp.einsum("kij,kj->ki", Rcb, pts_b - extr[..., 3])
    z = jnp.where(jnp.abs(pc[..., 2]) > 1e-6, pc[..., 2], 1e-6)
    proj = pc[..., :2] / z[..., None]
    return proj - xn, pc[..., 2]


@partial(jax.jit, static_argnames=("iters", "min_inliers", "refine_iters"))
def ransac_pnp_rig(pts_w, uv, cam_idx, valid, rig: Rig, pts3d_body, key,
                   iters: int = 192, reproj_norm: float = 0.01,
                   min_inliers: int = 20, guess=None, refine_iters: int = 8):
    """Body pose T_wb from multi-camera observations.

    pts_w (K,3) world landmarks; uv (K,2) pixels; cam_idx (K,) which rig
    camera observed each; pts3d_body (K,3) the observation's own 3D in the
    BODY frame (depth-backprojected + extrinsic). Returns RansacResult
    with transform = T_wb.
    """
    K = pts_w.shape[0]
    xn = rig_normalized(uv, cam_idx, rig)

    idx3 = R._sample_indices(key, valid, iters, 3)
    # hypothesis: body<-world rigid from 3 point pairs (normal-augmented:
    # 3-point cross-covariances are rank-2, see _augment_minimal_3pt)
    s3, d3 = R._augment_minimal_3pt(pts_w[idx3], pts3d_body[idx3])
    w3 = jnp.ones(s3.shape[:-1], pts_w.dtype)
    models_bw = R.rigid_from_correspondences(s3, d3, w3)
    models = jax.vmap(T.inverse)(models_bw)           # T_wb candidates
    if guess is not None:
        models = jnp.concatenate([models, guess[None]], axis=0)

    res, depth = jax.vmap(lambda M: rig_residuals(M, pts_w, xn, cam_idx, rig))(models)
    err = jnp.linalg.norm(res, axis=-1)
    inl = (err < reproj_norm) & valid[None] & (depth > 0)
    best = jnp.argmax(jnp.sum(inl, axis=-1))
    T_wb = models[best]

    # generalized-PnP GN refinement over the joint residuals
    def gn_body(_, T_wb):
        def resfn(xi):
            Tcur = T.retract_left(T_wb, xi)
            r, d = rig_residuals(Tcur, pts_w, xn, cam_idx, rig)
            return r, d

        r0, d0 = resfn(jnp.zeros(6))
        e0 = jnp.linalg.norm(r0, axis=-1)
        w = jnp.where(valid & (e0 < reproj_norm) & (d0 > 0), 1.0, 0.0)
        J = jax.jacfwd(lambda xi: resfn(xi)[0])(jnp.zeros(6))  # (K,2,6)
        Jw = J * w[:, None, None]
        H = jnp.einsum("kri,krj->ij", Jw, J) + 1e-6 * jnp.eye(6)
        g = jnp.einsum("kri,kr->i", Jw, r0)
        dx = -L3.chol_solve_unrolled(H, g)
        return T.retract_left(T_wb, dx)

    T_wb = jax.lax.fori_loop(0, refine_iters, gn_body, T_wb)
    r, d = rig_residuals(T_wb, pts_w, xn, cam_idx, rig)
    e = jnp.linalg.norm(r, axis=-1)
    inliers = valid & (e < reproj_norm) & (d > 0)
    n = jnp.sum(inliers)
    var = jnp.sum(jnp.where(inliers, e * e, 0.0)) / jnp.maximum(n, 1)
    return R.RansacResult(
        transform=T_wb, inliers=inliers, num_inliers=n.astype(jnp.int32),
        success=n >= min_inliers,
        covariance=jnp.eye(6) * jnp.maximum(var, 1e-8),
    )
