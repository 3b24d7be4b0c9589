"""Pairwise visual registration: match + robust motion estimation.

Capability parity: the reference's ``Registration``/``RegistrationVis``
(/root/reference/corelib/src/RegistrationVis.cpp:315
``computeTransformationImpl`` — NNDR feature correspondences, optional
guess-projected window search, then ``Vis/EstimationType``: 1 = PnP-RANSAC
(default), 0 = 3D->3D; covariance from inlier residuals). One jittable
function; ICP refinement chains behind it like the reference's
``kTypeVisIcp`` (see ops/icp.py).

Convention: ``register_frames(A, B)`` returns ``T_ab`` with
``pose_B = pose_A @ T_ab`` — the reference's "transform from A to B".
"""
from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from rtabmap_tpu.core.frame import FrameFeatures
from rtabmap_tpu.geometry import camera as C
from rtabmap_tpu.geometry import transform as T
from rtabmap_tpu.ops import matching as M
from rtabmap_tpu.ops import ransac as R


class RegistrationResult(NamedTuple):
    transform: jnp.ndarray     # (3,4) T_ab
    valid: jnp.ndarray         # () bool
    num_matches: jnp.ndarray   # () int32
    num_inliers: jnp.ndarray   # () int32
    covariance: jnp.ndarray    # (6,6)
    inlier_mask: jnp.ndarray   # (K,) on B's keypoints
    match_idx: jnp.ndarray     # (K,) B->A match indices


def register_frames(a: FrameFeatures, b: FrameFeatures, cam: C.CameraModel,
                    key, guess: Optional[jnp.ndarray] = None,
                    estimation_type: int = 1,
                    nndr: float = 0.8, reproj_px: float = 4.0,
                    inlier_dist: float = 0.1, min_inliers: int = 20,
                    ransac_iters: int = 256,
                    window: float = 0.0) -> RegistrationResult:
    """Estimate T_ab from features. ``estimation_type``: 1 = PnP (B observes
    A's 3D points), 0 = 3D->3D Kabsch RANSAC. When ``guess`` and ``window``
    are set, matching is restricted to a projected search window
    (reference's guided matching)."""
    guess_uv = None
    if guess is not None and window > 0.0:
        # project A's points into B's predicted view for windowed matching
        pts_b = T.apply(T.inverse(guess)[None], a.pts3d[None])[0]
        uv_pred, _ = C.project(pts_b, cam)
        guess_uv = uv_pred

    # match B -> A (B's observations against A's mapped points)
    m = M.match_nndr(
        b.desc, b.valid, a.desc, a.valid & a.valid3d, nndr=nndr,
        guess_uv=None, uv_b=None,
    )
    if guess_uv is not None:
        # windowed: A's predicted uv vs B's observed uv must be close
        du = guess_uv[m.idx] - b.uv
        close = jnp.sum(du * du, axis=-1) <= window * window
        m = m._replace(valid=m.valid & close)
    n_matches = jnp.sum(m.valid)

    pts_a = a.pts3d[m.idx]           # matched A 3D (A's camera frame)
    if estimation_type == 0:
        res = R.ransac_rigid(
            pts_a, b.pts3d, m.valid & b.valid3d, key,
            iters=ransac_iters, threshold=inlier_dist, min_inliers=min_inliers,
        )
        t_ab = res.transform  # maps A-frame pts to B-frame: T_ba of points =
        # dst ≈ T(src): src=A pts, dst=B pts -> that's world(A)->camera(B)
        # extrinsic, so the *motion* A->B is its inverse.
        t_ab = T.inverse(t_ab)
    else:
        res = R.ransac_pnp(
            pts_a, b.uv, m.valid, cam, key, iters=ransac_iters,
            reproj_px=reproj_px, min_inliers=min_inliers,
            guess=guess,
            pts3d_query=jnp.where(b.valid3d[:, None], b.pts3d, 0.0),
        )
        t_ab = res.transform  # camera-B pose in A frame == T_ab

    return RegistrationResult(
        transform=t_ab,
        valid=res.success & (n_matches >= min_inliers),
        num_matches=n_matches.astype(jnp.int32),
        num_inliers=res.num_inliers,
        covariance=res.covariance,
        inlier_mask=res.inliers,
        match_idx=m.idx,
    )
