"""Monocular visual odometry: essential-matrix bootstrap + landmark PnP.

Capability parity: the reference's ``OdometryMono``
(/root/reference/corelib/src/odometry/OdometryMono.cpp:879 LoC — bootstrap
by tracking against the first keyframe until enough flow, initialize the
metric-up-to-scale map from the recovered essential-matrix pose +
triangulation, then localize by PnP against the growing 3D landmark map,
extending it by triangulating new correspondences from keyframes).

TPU re-design: both phases are single jitted kernels over fixed-capacity
slabs — bootstrap = mutual-NNDR matmul matching + batched 8-point E-RANSAC
+ cheirality fan-out + midpoint triangulation; tracking = one (K, L)
Hamming matmul against the landmark descriptor slab + PnP-RANSAC. Map
growth is a masked scatter with a host-side cursor (same pattern as the
BoW slab). Scale is fixed by normalizing the bootstrap baseline to
``OdomMono/InitialBaseline`` (reference default behavior: unit-scale
initialization; scale is unobservable in mono).
"""
from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from rtabmap_tpu.core.frame import FrameFeatures
from rtabmap_tpu.geometry import camera as C
from rtabmap_tpu.geometry import transform as T
from rtabmap_tpu.ops import epipolar as EP
from rtabmap_tpu.ops import matching as M
from rtabmap_tpu.ops import ransac as RS


def _norm_coords(uv, cam):
    return jnp.stack([(uv[..., 0] - cam.cx) / cam.fx,
                      (uv[..., 1] - cam.cy) / cam.fy], axis=-1)


@partial(jax.jit, static_argnames=("iters",))
def _bootstrap(kf: FrameFeatures, fr: FrameFeatures, cam: C.CameraModel, key,
               nndr: float, threshold: float, iters: int = 192):
    """Match kf->fr, estimate E, recover pose + triangulated landmarks.

    Returns (flow_px, T21, n_inliers, pts3d_kf (K,3), pts_ok (K,),
    kf_idx-aligned masks) — all fixed shape (K = kf capacity).
    """
    m = M.match_mutual_nndr(kf.desc, kf.valid, fr.desc, fr.valid, nndr=nndr)
    uv2 = fr.uv[m.idx]
    flow = jnp.where(m.valid, jnp.linalg.norm(uv2 - kf.uv, axis=-1), 0.0)
    med_flow = jnp.sum(flow) / jnp.maximum(jnp.sum(m.valid), 1)
    x1n = _norm_coords(kf.uv, cam)
    x2n = _norm_coords(uv2, cam)
    # dual-model bootstrap (the ORB-SLAM recipe, which the reference's
    # cv::findEssentialMat path lacks): planar / low-parallax scenes make E
    # degenerate, so fit BOTH an essential matrix and a homography and take
    # the model with more support.
    ke, kh = jax.random.split(key)
    T21e, inle, Xe, oke = EP.ransac_essential(x1n, x2n, m.valid, ke,
                                              iters=iters, threshold=threshold)
    Hm, inlh = EP.ransac_homography(x1n, x2n, m.valid, kh, iters=iters,
                                    threshold=threshold)
    T21h, Xh, okh = EP.pose_from_homography(Hm, x1n, x2n, inlh)
    use_h = jnp.sum(inlh) > 0.45 * (jnp.sum(inlh) + jnp.sum(inle))
    T21 = jnp.where(use_h, T21h, T21e)
    X = jnp.where(use_h, Xh, Xe)
    ok = jnp.where(use_h, okh, oke)
    inl = jnp.where(use_h, inlh, inle)
    # two-view BA polish (reference: the mono init's refinement role of
    # cv::recoverPose + local BA in OdometryMono): jointly refine T21 + the
    # triangulated structure on reprojection error, then re-fix the scale
    # gauge to a unit baseline.
    from rtabmap_tpu.optim.ba import BAProblem, bundle_adjust

    K = x1n.shape[0]
    prob = BAProblem(
        poses=jnp.stack([T.identity(), T21]),
        points=X,
        cam_idx=jnp.concatenate([jnp.zeros(K, jnp.int32), jnp.ones(K, jnp.int32)]),
        pt_idx=jnp.concatenate([jnp.arange(K, dtype=jnp.int32)] * 2),
        uv=jnp.concatenate([x1n, x2n]),
        valid=jnp.concatenate([ok, ok]),
        fixed_cams=jnp.array([True, False]),
    )
    refined, _ = bundle_adjust(prob, iters=12, damping=1e-3, huber=4.0 * threshold)
    T21r = refined.poses[1]
    s = 1.0 / jnp.maximum(jnp.linalg.norm(T.translation(T21r)), 1e-9)
    T21 = jnp.concatenate([T.rotation(T21r), T.translation(T21r)[:, None] * s], axis=1)
    X = refined.points * s
    z1 = X[:, 2]
    z2 = (jnp.einsum("ij,nj->ni", T.rotation(T21), X) + T.translation(T21)[None])[:, 2]
    ok = ok & (z1 > 1e-3) & (z2 > 1e-3)
    return med_flow, T21, jnp.sum(inl), X, ok, m.idx


@partial(jax.jit, static_argnames=("iters", "min_inliers"))
def _track(map_xyz, map_desc, map_valid, fr: FrameFeatures, cam: C.CameraModel,
           key, guess, nndr: float, reproj_px: float,
           iters: int = 192, min_inliers: int = 15):
    """Frame -> landmark-map PnP. guess = T_wc camera-in-world (3,4)."""
    m = M.match_nndr(fr.desc, fr.valid, map_desc, map_valid, nndr=nndr)
    pts_w = map_xyz[m.idx]
    res = RS.ransac_pnp(pts_w, fr.uv, m.valid, cam, key, iters=iters,
                        reproj_px=reproj_px, min_inliers=min_inliers,
                        guess=guess)
    return res, m


@jax.jit
def _triangulate_new(kf: FrameFeatures, kf_pose, fr: FrameFeatures, fr_pose,
                     cam: C.CameraModel, nndr: float, min_parallax: float):
    """Triangulate fresh landmarks between a keyframe and the current frame.

    Both poses are camera-in-world (3,4). Returns world points + mask +
    descriptors, fixed shape (K = kf capacity).
    """
    m = M.match_mutual_nndr(kf.desc, kf.valid, fr.desc, fr.valid, nndr=nndr)
    T21 = T.relative(fr_pose, kf_pose)  # kf-cam -> fr-cam... see below
    # relative(A,B) = A^-1 B maps B-frame to A-frame; we want X2 = R X1 + t
    # with 1 = kf cam, 2 = fr cam: that is (fr_pose)^-1 kf_pose.
    x1n = _norm_coords(kf.uv, cam)
    x2n = _norm_coords(fr.uv[m.idx], cam)
    X1, z1, z2 = EP.triangulate_midpoint(T.rotation(T21), T.translation(T21),
                                         x1n, x2n)
    # parallax gate: angle between the two rays
    d1 = jnp.concatenate([x1n, jnp.ones((*x1n.shape[:-1], 1))], axis=-1)
    d2 = jnp.einsum("ji,nj->ni", T.rotation(T21),
                    jnp.concatenate([x2n, jnp.ones((*x2n.shape[:-1], 1))], axis=-1))
    cosang = jnp.sum(d1 * d2, axis=-1) / jnp.maximum(
        jnp.linalg.norm(d1, axis=-1) * jnp.linalg.norm(d2, axis=-1), 1e-9)
    ok = (m.valid & (z1 > 1e-2) & (z2 > 1e-2)
          & (cosang < jnp.cos(min_parallax)))
    Xw = T.apply(kf_pose, X1)
    return Xw, ok, kf.desc


@partial(jax.jit, static_argnames=("iters",))
def _local_ba(map_xyz, poses, obs_idx, obs_uv_n, obs_ok, iters: int = 6):
    """Sliding-window local bundle adjustment over the landmark slab.

    poses (W,3,4) camera-in-world; obs_* (W,K) observations of slab
    landmarks (normalized coords). The two oldest cameras are held fixed —
    that pins both the gauge and the mono scale of the window (reference
    analogue: OdometryF2M local BA, OdometryF2M.cpp:345-475, g2o backend).
    """
    from rtabmap_tpu.optim.ba import BAProblem, bundle_adjust

    W, K = obs_idx.shape
    extr = jax.vmap(T.inverse)(poses)
    prob = BAProblem(
        poses=extr, points=map_xyz,
        cam_idx=jnp.repeat(jnp.arange(W, dtype=jnp.int32), K),
        pt_idx=obs_idx.reshape(-1),
        uv=obs_uv_n.reshape(-1, 2),
        valid=obs_ok.reshape(-1),
        fixed_cams=jnp.arange(W) < 2,
    )
    ref, cost = bundle_adjust(prob, iters=iters, damping=1e-3, huber=0.01)
    return jax.vmap(T.inverse)(ref.poses), ref.points, cost


@jax.jit
def _map_insert(map_xyz, map_desc, map_valid, slots, pts, desc, mask):
    L = map_xyz.shape[0]
    safe = jnp.where(mask, slots, L)
    map_xyz = map_xyz.at[safe].set(pts, mode="drop")
    map_desc = map_desc.at[safe].set(desc, mode="drop")
    map_valid = map_valid.at[safe].set(True, mode="drop")
    return map_xyz, map_desc, map_valid


class OdometryMono:
    """Host wrapper with the reference Odometry::process semantics: returns
    (pose T_wc, covariance, info); pose is None while bootstrapping or lost
    (reference returns null transforms until initialized,
    OdometryMono.cpp computeTransform)."""

    def __init__(self, cam: C.CameraModel, params=None, map_capacity: int = 4096,
                 seed: int = 0, ba_window: int = 4):
        from rtabmap_tpu.utils.params import Parameters

        p = params or Parameters()
        self.cam = cam
        self.ba_window = ba_window
        self.nndr = float(p["Vis/CorNNDR"])
        self.reproj_px = float(p["Vis/PnPReprojError"])
        self.min_inliers = int(p["Vis/MinInliers"])
        self.min_flow = float(p["OdomMono/InitMinFlow"])
        self.baseline = float(p["OdomMono/InitialBaseline"])
        self.min_parallax = float(p["OdomMono/MinParallax"]) * np.pi / 180.0
        self.capacity = map_capacity
        self._key = jax.random.PRNGKey(seed)
        self.reset()

    def reset(self, pose=None):
        self.pose = T.identity() if pose is None else jnp.asarray(pose)
        self.vel = jnp.zeros((6,))
        self.initialized = False
        self.lost = False
        self.keyframe: Optional[FrameFeatures] = None
        self.keyframe_pose = self.pose
        self.map_xyz = jnp.zeros((self.capacity, 3), jnp.float32)
        self.map_desc = None
        self.map_valid = jnp.zeros((self.capacity,), bool)
        self.n_landmarks = 0
        self._window = []  # [(pose, obs_idx, obs_uv_n, obs_ok)] for local BA

    def _insert(self, pts, desc, mask):
        mask = np.asarray(mask)
        n_new = int(mask.sum())
        free = self.capacity - self.n_landmarks
        if n_new > free:
            order = np.cumsum(mask)
            mask = mask & (order <= free)
            n_new = int(mask.sum())
        slots = (self.n_landmarks + np.cumsum(mask) - 1).astype(np.int32)
        self.map_xyz, self.map_desc, self.map_valid = _map_insert(
            self.map_xyz, self.map_desc, self.map_valid,
            jnp.asarray(slots), pts, desc, jnp.asarray(mask))
        self.n_landmarks += n_new

    def process(self, frame: FrameFeatures):
        info = {"matches": 0, "inliers": 0, "initialized": self.initialized}
        if self.map_desc is None:
            self.map_desc = jnp.zeros((self.capacity, frame.desc.shape[1]), jnp.int8)
        if self.keyframe is None:
            self.keyframe = frame
            self.keyframe_pose = self.pose
            return None, None, info

        self._key, sub = jax.random.split(self._key)
        if not self.initialized:
            flow, T21, n_inl, X, ok, _ = _bootstrap(
                self.keyframe, frame, self.cam, sub,
                jnp.float32(self.nndr), jnp.float32(self.reproj_px / self.cam.fx))
            info["flow"] = float(flow)
            info["inliers"] = int(n_inl)
            if float(flow) < self.min_flow or int(np.asarray(ok).sum()) < self.min_inliers:
                return None, None, info  # keep waiting for baseline
            # scale: unit-norm bootstrap translation -> InitialBaseline
            s = jnp.float32(self.baseline)
            T21 = jnp.concatenate([T.rotation(T21), T.translation(T21)[:, None] * s],
                                  axis=1)
            X = X * s
            # landmarks in world = keyframe frame (keyframe_pose = world pose)
            Xw = T.apply(self.keyframe_pose, X)
            self._insert(Xw, self.keyframe.desc, np.asarray(ok))
            prev = self.pose
            self.pose = T.compose(self.keyframe_pose, T.inverse(T21))
            self.vel = T.se3_log(T.relative(prev, self.pose))
            self.initialized = True
            info["initialized"] = True
            info["landmarks"] = self.n_landmarks
            return self.pose, jnp.eye(6) * 1e-4, info

        guess = T.compose(self.pose, T.se3_exp(self.vel))  # constant-velocity
        res, m = _track(self.map_xyz, self.map_desc, self.map_valid, frame,
                        self.cam, sub, guess,
                        jnp.float32(self.nndr), jnp.float32(self.reproj_px),
                        min_inliers=self.min_inliers)
        info["matches"] = int(jnp.sum(m.valid))
        info["inliers"] = int(res.num_inliers)
        if not bool(res.success):
            self.lost = True
            self.vel = jnp.zeros((6,))
            self._window = []
            return None, jnp.eye(6) * 9999.0, info
        self.lost = False
        self.vel = 0.7 * T.se3_log(T.relative(self.pose, res.transform)) + 0.3 * self.vel
        self.pose = res.transform
        # sliding-window local BA: jointly refine recent poses + landmarks
        self._window.append((self.pose, m.idx,
                             _norm_coords(frame.uv, self.cam),
                             m.valid & res.inliers))
        if len(self._window) > self.ba_window:
            self._window.pop(0)
        if len(self._window) >= 3:
            poses = jnp.stack([w[0] for w in self._window])
            obs_idx = jnp.stack([w[1] for w in self._window])
            obs_uv = jnp.stack([w[2] for w in self._window])
            obs_ok = jnp.stack([w[3] for w in self._window])
            new_poses, new_pts, _ = _local_ba(self.map_xyz, poses, obs_idx,
                                              obs_uv, obs_ok)
            self.map_xyz = new_pts
            self._window = [(new_poses[i], *self._window[i][1:])
                            for i in range(len(self._window))]
            self.pose = new_poses[-1]
        # keyframe policy + map growth: when tracked inliers get thin,
        # triangulate fresh landmarks against the last keyframe and rebase it
        if int(res.num_inliers) < 3 * self.min_inliers and self.keyframe is not None:
            Xw, ok, desc = _triangulate_new(
                self.keyframe, self.keyframe_pose, frame, self.pose, self.cam,
                jnp.float32(self.nndr), jnp.float32(self.min_parallax))
            self._insert(Xw, desc, np.asarray(ok))
            self.keyframe = frame
            self.keyframe_pose = self.pose
            info["landmarks"] = self.n_landmarks
        return self.pose, res.covariance, info
