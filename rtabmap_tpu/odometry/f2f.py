"""Frame-to-Frame (keyframe) visual odometry.

Capability parity: the reference's ``OdometryF2F``
(/root/reference/corelib/src/odometry/OdometryF2F.cpp — registration of
the current frame against the last KEYFRAME (not a feature map), keyframe
refresh on inlier ratio). Simpler and cheaper than F2M; useful as a
fallback strategy and for high-rate streams.
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from rtabmap_tpu.core.frame import FrameFeatures
from rtabmap_tpu.geometry import camera as C
from rtabmap_tpu.geometry import transform as T
from rtabmap_tpu.ops import registration as REG


class OdometryF2F:
    """Host wrapper with the reference Odometry::process semantics."""

    def __init__(self, cam: C.CameraModel, params=None, seed: int = 0):
        from rtabmap_tpu.utils.params import Parameters

        p = params or Parameters()
        self.cam = cam
        self.keyframe_thr = float(p["Odom/KeyFrameThr"])
        self.min_inliers = int(p["Vis/MinInliers"])
        self.nndr = float(p["Vis/CorNNDR"])
        self.reproj_px = float(p["Vis/PnPReprojError"])
        self._key = jax.random.PRNGKey(seed)
        self.pose = T.identity()
        self.vel = jnp.zeros((6,))
        self.keyframe: Optional[FrameFeatures] = None
        self.keyframe_pose = T.identity()
        self._reg = jax.jit(
            lambda a, b, key, guess: REG.register_frames(
                a, b, self.cam, key, guess=guess,
                nndr=self.nndr, reproj_px=self.reproj_px,
                min_inliers=self.min_inliers,
            )
        )
        self.lost = False

    def process(self, frame: FrameFeatures, imu_quat=None):
        if self.keyframe is None:
            self.keyframe = frame
            self.keyframe_pose = self.pose
            return self.pose, jnp.eye(6) * 1e-6, {"matches": 0, "inliers": 0, "keyframe": True}

        self._key, sub = jax.random.split(self._key)
        guess_pose = T.compose(self.pose, T.se3_exp(self.vel))
        guess = T.relative(self.keyframe_pose, guess_pose)
        res = self._reg(self.keyframe, frame, sub, guess)
        ok = bool(res.valid)
        info = {"matches": int(res.num_matches), "inliers": int(res.num_inliers)}
        if not ok:
            self.lost = True
            info["keyframe"] = False
            return None, jnp.eye(6) * 9999.0, info
        self.lost = False
        new_pose = T.compose(self.keyframe_pose, res.transform)
        if imu_quat is not None:
            from rtabmap_tpu.odometry.imu_filter import apply_gravity_alignment

            new_pose = apply_gravity_alignment(new_pose, jnp.asarray(imu_quat))
        self.vel = 0.7 * T.se3_log(T.relative(self.pose, new_pose)) + 0.3 * self.vel
        self.pose = new_pose

        n_feat = int(jnp.sum(frame.valid))
        kf = int(res.num_inliers) < self.keyframe_thr * max(n_feat, 1)
        if kf:
            self.keyframe = frame
            self.keyframe_pose = new_pose
        info["keyframe"] = kf
        return new_pose, res.covariance, info

    def reset(self, pose=None):
        self.pose = jnp.asarray(pose) if pose is not None else T.identity()
        self.vel = jnp.zeros((6,))
        self.keyframe = None
