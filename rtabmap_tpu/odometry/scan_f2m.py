"""Scan-to-Map (F2M) LiDAR/ICP odometry.

Capability parity: the reference's ICP odometry mode of ``OdometryF2M``
(/root/reference/corelib/src/odometry/OdometryF2M.cpp — when
``Reg/Strategy`` selects ICP, the local map is a point-cloud slab of up to
``OdomF2M/ScanMaxSize=2000`` points; new keyframe scans are merged after
subtracting points within ``OdomF2M/ScanSubtractRadius`` of existing map
points; keyframe policy on the ICP correspondence ratio
``Odom/ScanKeyFrameThr=0.9``) and the LidarMapping example
(/root/reference/examples/LidarMapping/main.cpp).

TPU-first: the whole tick — point-to-plane ICP of the incoming scan
against the map slab (with constant-velocity guess), pose/velocity
update, keyframe decision, radius-subtract merge and oldest-first cull —
is ONE jitted function over fixed-capacity arrays with masked branches
(no host sync inside the step). Normals for new map points are estimated
once at insertion (k-NN PCA with the analytic 3x3 eigen solver, no TPU
custom calls), so the per-frame ICP reads precomputed map normals.
"""
from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from rtabmap_tpu.geometry import transform as T
from rtabmap_tpu.ops import cloud as CL
from rtabmap_tpu.ops import icp as ICP


def np_ceil_log2(n: int) -> int:
    return int(max(0, (int(n) - 1)).bit_length())


class ScanF2MState(NamedTuple):
    map_pts: jnp.ndarray    # (M,3) world-frame map points
    map_nrm: jnp.ndarray    # (M,3) world-frame normals
    map_valid: jnp.ndarray  # (M,)
    map_seen: jnp.ndarray   # (M,) last-seen keyframe index (cull priority)
    pose: jnp.ndarray       # (3,4) current sensor pose (world)
    vel: jnp.ndarray        # (6,) twist per frame (constant-velocity model)
    kf_count: jnp.ndarray   # () float32
    initialized: jnp.ndarray  # () bool


class ScanOdomResult(NamedTuple):
    pose: jnp.ndarray
    success: jnp.ndarray
    corr_ratio: jnp.ndarray   # () float32 ICP correspondence ratio
    fitness_rmse: jnp.ndarray
    covariance: jnp.ndarray   # (6,6)
    keyframe_added: jnp.ndarray


def init_state(map_capacity: int = 4096) -> ScanF2MState:
    return ScanF2MState(
        map_pts=jnp.zeros((map_capacity, 3), jnp.float32),
        map_nrm=jnp.zeros((map_capacity, 3), jnp.float32),
        map_valid=jnp.zeros((map_capacity,), bool),
        map_seen=jnp.full((map_capacity,), -1.0, jnp.float32),
        pose=T.identity(),
        vel=jnp.zeros((6,), jnp.float32),
        kf_count=jnp.zeros((), jnp.float32),
        initialized=jnp.zeros((), bool),
    )


def _merge_scan(state: ScanF2MState, pts_w, nrm_w, valid,
                subtract_radius: float) -> ScanF2MState:
    """Keyframe merge: drop new points within ``subtract_radius`` of an
    existing map point (OdomF2M/ScanSubtractRadius), then keep the newest
    ``M`` points by seen-stamp (oldest-first cull, OdometryF2M map cap)."""
    kf = state.kf_count + 1.0
    d2, _ = ICP._nn_blocked(pts_w, state.map_pts, state.map_valid)
    novel = valid & (d2 > subtract_radius ** 2)
    cand_seen = jnp.where(novel, kf, -jnp.inf)

    all_pts = jnp.concatenate([state.map_pts, pts_w], axis=0)
    all_nrm = jnp.concatenate([state.map_nrm, nrm_w], axis=0)
    all_valid = jnp.concatenate([state.map_valid, novel], axis=0)
    all_seen = jnp.concatenate(
        [jnp.where(state.map_valid, state.map_seen, -jnp.inf), cand_seen], axis=0)

    Mcap = state.map_pts.shape[0]
    prio = all_seen - jnp.arange(all_seen.shape[0], dtype=jnp.float32) * 1e-6
    _, keep = jax.lax.top_k(prio, Mcap)
    return state._replace(
        map_pts=all_pts[keep],
        map_nrm=all_nrm[keep],
        map_valid=all_valid[keep],
        map_seen=jnp.where(all_valid[keep], all_seen[keep], -1.0),
        kf_count=kf,
    )


def scan_odom_step(state: ScanF2MState, scan_pts, scan_valid,
                   *, voxel: float = 0.05, icp_iters: int = 20,
                   max_corr_dist: float = 0.5, min_corr_ratio: float = 0.2,
                   keyframe_thr: float = 0.9,
                   subtract_radius: float = 0.05,
                   vel_smooth: float = 0.7,
                   normals_k: int = 8) -> Tuple[ScanF2MState, ScanOdomResult]:
    """One scan-odometry tick. Fully jittable (static shapes).

    ``scan_pts`` (N,3) in the sensor frame; ``scan_valid`` (N,) mask.
    """
    scan_valid = CL.voxel_filter(scan_pts, scan_valid, voxel)

    def bootstrap(state):
        pts_w = T.apply(state.pose[None], scan_pts[None])[0]
        nrm_s, _ = CL.estimate_normals(scan_pts, scan_valid, k=normals_k)
        nrm_w = nrm_s @ T.rotation(state.pose).T
        st = _merge_scan(state, pts_w, nrm_w, scan_valid, subtract_radius=0.0)
        st = st._replace(initialized=jnp.ones((), bool))
        res = ScanOdomResult(
            pose=state.pose, success=jnp.ones((), bool),
            corr_ratio=jnp.ones(()), fitness_rmse=jnp.zeros(()),
            covariance=jnp.eye(6) * 1e-6,
            keyframe_added=jnp.ones((), bool))
        return st, res

    def track(state):
        guess_pose = T.compose(state.pose, T.se3_exp(state.vel))
        # ICP solves for the sensor->world transform directly (map is in
        # the world frame), seeded with the constant-velocity guess.
        icp_res = ICP.icp(
            scan_pts, scan_valid, state.map_pts, state.map_valid,
            guess=guess_pose, dst_normals=state.map_nrm,
            iters=icp_iters, max_corr_dist=max_corr_dist,
            point_to_plane=True, min_corr_ratio=min_corr_ratio)
        new_pose = T.orthonormalize(icp_res.transform)
        ok = icp_res.valid

        new_vel = T.se3_log(T.relative(state.pose, new_pose))
        vel = jnp.where(ok, vel_smooth * new_vel + (1 - vel_smooth) * state.vel,
                        jnp.zeros((6,)))
        pose = jnp.where(ok, new_pose, state.pose)

        # keyframe: correspondence ratio fell below Odom/ScanKeyFrameThr
        add_kf = ok & (icp_res.correspondence_ratio < keyframe_thr)
        pts_w = T.apply(pose[None], scan_pts[None])[0]
        nrm_s, _ = CL.estimate_normals(scan_pts, scan_valid, k=normals_k)
        nrm_w = nrm_s @ T.rotation(pose).T
        merged = _merge_scan(state, pts_w, nrm_w, scan_valid, subtract_radius)
        state = jax.tree_util.tree_map(
            lambda a, b: jnp.where(
                jnp.reshape(add_kf, (1,) * a.ndim), b, a),
            state, merged)
        state = state._replace(pose=pose, vel=vel)

        var = jnp.maximum(icp_res.fitness_rmse ** 2, 1e-8)
        cov = jnp.where(ok, 1.0, 9999.0) * jnp.diag(
            jnp.concatenate([jnp.full((3,), var), jnp.full((3,), var * 0.1)]))
        res = ScanOdomResult(
            pose=pose, success=ok,
            corr_ratio=icp_res.correspondence_ratio,
            fitness_rmse=icp_res.fitness_rmse,
            covariance=cov, keyframe_added=add_kf)
        return state, res

    return jax.lax.cond(state.initialized, track, bootstrap, state)


class OdometryScanF2M:
    """Host wrapper with the reference Odometry::process semantics
    (constant-velocity guess, lost -> covariance 9999, reset)."""

    def __init__(self, cam=None, params=None, seed: int = 0,
                 map_capacity: Optional[int] = None, scan_voxel: float = 0.05):
        from rtabmap_tpu.utils.params import Parameters

        p = params or Parameters()
        if map_capacity is None:
            # pad the reference's OdomF2M/ScanMaxSize to a TPU-friendly slab
            map_capacity = max(1024, int(2 ** np_ceil_log2(int(p["OdomF2M/ScanMaxSize"]))))
        self.cam = cam  # unused; kept for factory signature parity
        self._kw = dict(
            voxel=scan_voxel,
            icp_iters=int(p["Icp/Iterations"]),
            max_corr_dist=float(p["Icp/MaxCorrespondenceDistance"]),
            min_corr_ratio=float(p["Icp/CorrespondenceRatio"]),
            keyframe_thr=float(p["Odom/ScanKeyFrameThr"]),
            subtract_radius=float(p["OdomF2M/ScanSubtractRadius"]),
        )
        self.state = init_state(map_capacity)
        self._step = jax.jit(
            lambda st, pts, valid: scan_odom_step(st, pts, valid, **self._kw))
        self.lost = False

    def process(self, scan_pts, scan_valid=None, imu_quat=None):
        pts = jnp.asarray(scan_pts, jnp.float32)
        if scan_valid is None:
            scan_valid = jnp.ones((pts.shape[0],), bool)
        self.state, res = self._step(self.state, pts, jnp.asarray(scan_valid))
        ok = bool(res.success)
        self.lost = not ok
        info = {
            "corr_ratio": float(res.corr_ratio),
            "fitness_rmse": float(res.fitness_rmse),
            "keyframe": bool(res.keyframe_added),
            "map_points": int(jnp.sum(self.state.map_valid)),
        }
        if not ok:
            return None, jnp.eye(6) * 9999.0, info
        return res.pose, res.covariance, info

    def reset(self, pose=None):
        cap = self.state.map_pts.shape[0]
        self.state = init_state(cap)
        if pose is not None:
            self.state = self.state._replace(pose=jnp.asarray(pose))

    @property
    def pose(self):
        return self.state.pose
