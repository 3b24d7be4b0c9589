"""Frame-to-Map (F2M) visual odometry — the default odometry strategy.

Capability parity: the reference's ``OdometryF2M``
(/root/reference/corelib/src/odometry/OdometryF2M.cpp:203
``computeTransform`` — registration of the new frame against a local map of
up to ``OdomF2M/MaxSize=2000`` feature points, keyframe policy on the
inlier ratio ``Odom/KeyFrameThr``, map insert/cull at OdometryF2M.cpp:874)
and the base ``Odometry::process`` motion model (Odometry.cpp:311 —
constant-velocity guess, velocity update, failure covariance convention).

TPU-first: the whole tick — guided matching against the map slab, batched
PnP-RANSAC, pose/velocity update, keyframe decision and map point
insert/cull — is ONE jitted function over fixed-capacity arrays. The
keyframe branch is computed with masked selects instead of host branching,
so the device step has no data-dependent control flow. Local BA over recent
keyframes refines the map asynchronously (optim/ba.py).
"""
from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from rtabmap_tpu.core.frame import FrameFeatures
from rtabmap_tpu.geometry import camera as C
from rtabmap_tpu.geometry import transform as T
from rtabmap_tpu.ops import matching as M
from rtabmap_tpu.ops import ransac as R
from rtabmap_tpu.ops.features import DESC_DIM


class F2MState(NamedTuple):
    map_pts: jnp.ndarray    # (M,3) world-frame map points
    map_desc: jnp.ndarray   # (M,D) ±1 int8
    map_valid: jnp.ndarray  # (M,)
    map_seen: jnp.ndarray   # (M,) float32 last-seen keyframe index (cull prio)
    pose: jnp.ndarray       # (3,4) current camera pose (world)
    vel: jnp.ndarray        # (6,) twist per frame (constant-velocity model)
    kf_count: jnp.ndarray   # () float32 keyframe counter
    initialized: jnp.ndarray  # () bool
    age: jnp.ndarray        # () float32 ticks since bootstrap/reset
    # --- local-BA bookkeeping (OdomF2M/BundleAdjustment):
    map_ids: jnp.ndarray    # (M,) int32 persistent point ids (-1 empty) —
                            # survive the cull permutation, so keyframe
                            # observations can reference points by id
    next_id: jnp.ndarray    # () int32 id counter
    obs_ids: jnp.ndarray    # (F,K) int32 point id per observation (-1 none)
    obs_uv: jnp.ndarray     # (F,K,2) pixel observation
    kf_poses: jnp.ndarray   # (F,3,4) keyframe camera-in-world poses
    kf_valid: jnp.ndarray   # (F,) ring-slot occupied
    kf_stamp: jnp.ndarray   # (F,) float32 kf_count at insertion (age order)
    kf_ptr: jnp.ndarray     # () int32 ring pointer


class OdomResult(NamedTuple):
    pose: jnp.ndarray        # (3,4) new pose (valid only if success)
    success: jnp.ndarray     # () bool
    num_matches: jnp.ndarray # () int32
    num_inliers: jnp.ndarray # () int32
    covariance: jnp.ndarray  # (6,6)
    keyframe_added: jnp.ndarray  # () bool


def init_state(map_capacity: int = 2000, desc_dim: int = DESC_DIM,
               ba_frames: int = 10, obs_capacity: int = 512) -> F2MState:
    return F2MState(
        map_pts=jnp.zeros((map_capacity, 3), jnp.float32),
        map_desc=jnp.zeros((map_capacity, desc_dim), jnp.int8),
        map_valid=jnp.zeros((map_capacity,), bool),
        map_seen=jnp.full((map_capacity,), -1.0, jnp.float32),
        pose=T.identity(),
        vel=jnp.zeros((6,), jnp.float32),
        kf_count=jnp.zeros((), jnp.float32),
        initialized=jnp.zeros((), bool),
        age=jnp.zeros((), jnp.float32),
        map_ids=jnp.full((map_capacity,), -1, jnp.int32),
        next_id=jnp.zeros((), jnp.int32),
        obs_ids=jnp.full((ba_frames, obs_capacity), -1, jnp.int32),
        obs_uv=jnp.zeros((ba_frames, obs_capacity, 2), jnp.float32),
        kf_poses=jnp.tile(jnp.eye(3, 4)[None], (ba_frames, 1, 1)),
        kf_valid=jnp.zeros((ba_frames,), bool),
        kf_stamp=jnp.full((ba_frames,), -1.0, jnp.float32),
        kf_ptr=jnp.zeros((), jnp.int32),
    )


def _insert_keyframe(state: F2MState, frame: FrameFeatures, new_pose,
                     matched_map_idx, matched_ok):
    """Masked map update: refresh seen-stamps of matched points, then merge
    unmatched new 3D points, keeping the most recently seen (cull
    oldest-first like OdometryF2M.cpp:874)."""
    kf = state.kf_count + 1.0
    seen = state.map_seen
    # refresh matched map points
    seen = seen.at[matched_map_idx].max(jnp.where(matched_ok, kf, -1.0))

    # candidate new points: valid 3D keypoints that were NOT matched
    new_mask = frame.valid & frame.valid3d & (~matched_ok)
    world_pts = T.apply(new_pose[None], frame.pts3d[None])[0]
    cand_seen = jnp.where(new_mask, kf, -jnp.inf)
    # persistent ids for the new points (BA observations reference ids,
    # which survive the cull permutation below)
    new_ids = state.next_id + jnp.cumsum(new_mask.astype(jnp.int32)) - 1
    new_ids = jnp.where(new_mask, new_ids, -1)

    all_pts = jnp.concatenate([state.map_pts, world_pts], axis=0)
    all_desc = jnp.concatenate([state.map_desc, frame.desc], axis=0)
    all_valid = jnp.concatenate([state.map_valid, new_mask], axis=0)
    all_seen = jnp.concatenate([jnp.where(state.map_valid, seen, -jnp.inf), cand_seen], axis=0)
    all_ids = jnp.concatenate([state.map_ids, new_ids], axis=0)

    Mcap = state.map_pts.shape[0]
    # keep top-M by (seen, small index-noise for stable ties)
    prio = all_seen - jnp.arange(all_seen.shape[0], dtype=jnp.float32) * 1e-6
    _, keep = jax.lax.top_k(prio, Mcap)

    # record this keyframe's observations in the BA ring: matched map
    # points by their (pre-cull) id, new points by their fresh id
    obs_id_k = jnp.where(matched_ok, state.map_ids[matched_map_idx],
                         jnp.where(new_mask, new_ids, -1)).astype(jnp.int32)
    Fw = state.obs_ids.shape[0]
    Kw = state.obs_ids.shape[1]
    slot = jnp.mod(state.kf_ptr, Fw)
    K = obs_id_k.shape[0]
    if K >= Kw:
        obs_id_k = obs_id_k[:Kw]
        obs_uv_k = frame.uv[:Kw]
    else:
        obs_id_k = jnp.pad(obs_id_k, (0, Kw - K), constant_values=-1)
        obs_uv_k = jnp.pad(frame.uv, ((0, Kw - K), (0, 0)))
    return state._replace(
        map_pts=all_pts[keep],
        map_desc=all_desc[keep],
        map_valid=all_valid[keep],
        map_seen=jnp.where(all_valid[keep], all_seen[keep], -1.0),
        map_ids=jnp.where(all_valid[keep], all_ids[keep], -1),
        next_id=state.next_id + jnp.sum(new_mask).astype(jnp.int32),
        kf_count=kf,
        obs_ids=state.obs_ids.at[slot].set(obs_id_k),
        obs_uv=state.obs_uv.at[slot].set(obs_uv_k),
        kf_poses=state.kf_poses.at[slot].set(new_pose),
        kf_valid=state.kf_valid.at[slot].set(True),
        kf_stamp=state.kf_stamp.at[slot].set(kf),
        kf_ptr=state.kf_ptr + 1,
    )


def odom_step(state: F2MState, frame: FrameFeatures, cam: C.CameraModel, key,
              nndr: float = 0.8, reproj_px: float = 4.0,
              min_inliers: int = 20, keyframe_thr: float = 0.3,
              ransac_iters: int = 192, search_window: float = 0.0,
              vel_smooth: float = 0.7) -> Tuple[F2MState, OdomResult]:
    """One odometry tick. Fully jittable (static shapes, masked branches)."""
    guess = T.compose(state.pose, T.se3_exp(state.vel))

    # ---- bootstrap: empty map -> insert frame as first keyframe
    def bootstrap(state):
        zero_idx = jnp.zeros((frame.capacity,), jnp.int32)
        no_match = jnp.zeros((frame.capacity,), bool)
        st = _insert_keyframe(state, frame, state.pose, zero_idx, no_match)
        st = st._replace(initialized=jnp.ones((), bool))
        res = OdomResult(
            pose=state.pose, success=jnp.ones((), bool),
            num_matches=jnp.zeros((), jnp.int32),
            num_inliers=jnp.zeros((), jnp.int32),
            covariance=jnp.eye(6) * 1e-6,
            keyframe_added=jnp.ones((), bool),
        )
        return st, res

    # ---- normal tick
    def tick(state):
        guess_uv = None
        if search_window > 0.0:
            pts_c = T.apply(T.inverse(guess)[None], state.map_pts[None])[0]
            uv_pred, z_pred = C.project(pts_c, cam)
            vis = (z_pred > 0.05) & C.in_image(uv_pred, cam.width, cam.height, -search_window)
        m = M.match_nndr(frame.desc, frame.valid, state.map_desc,
                         state.map_valid if search_window <= 0.0 else state.map_valid & vis,
                         nndr=nndr)
        if search_window > 0.0:
            du = uv_pred[m.idx] - frame.uv
            m = m._replace(valid=m.valid & (jnp.sum(du * du, -1) <= search_window ** 2))
        n_matches = jnp.sum(m.valid)

        res = R.ransac_pnp(
            state.map_pts[m.idx], frame.uv, m.valid, cam, key,
            iters=ransac_iters, reproj_px=reproj_px, min_inliers=min_inliers,
            guess=guess,
            pts3d_query=jnp.where(frame.valid3d[:, None], frame.pts3d, 0.0),
        )
        ok = res.success
        new_pose = jnp.where(ok, res.transform, state.pose)
        motion = T.se3_log(T.relative(state.pose, new_pose))
        new_vel = jnp.where(ok, vel_smooth * motion + (1 - vel_smooth) * state.vel,
                            jnp.zeros((6,)))

        # keyframe policy: inlier count below ratio of valid features
        n_feat = jnp.sum(frame.valid)
        kf_needed = ok & (res.num_inliers < keyframe_thr * jnp.maximum(n_feat, 1))

        matched_ok = m.valid & res.inliers
        st_kf = _insert_keyframe(state, frame, new_pose, m.idx, matched_ok)
        st = jax.tree_util.tree_map(lambda a, b: jnp.where(kf_needed, a, b), st_kf, state)
        st = st._replace(pose=new_pose, vel=new_vel)
        # Covariance maturity: the first estimates after bootstrap track a
        # single depth-projected keyframe — decimetre-grade no matter how
        # small the reprojection residuals are (no multi-view structure
        # yet). Claiming the usual mm-level certainty on them poisons
        # downstream graph solves: the RGBD/OptimizeMaxError gate measures
        # edge residuals in units of claimed stddev, so one overconfident
        # bad edge (observed: 0.09 m error at claimed 1 mm stddev on the
        # first post-reset edge) rejects every future loop closure and
        # keeps map sessions permanently unmergeable. Decay 1e5 -> 1 over
        # the first 5 TRACKED ticks after a reset() (age counts the
        # bootstrap call too, hence age-1: the first tracked frame must
        # see the full 1e5).
        cov_boost = 10.0 ** (
            5.0 * jnp.clip(1.0 - (state.age - 1.0) / 5.0, 0.0, 1.0))
        out = OdomResult(
            pose=new_pose, success=ok,
            num_matches=n_matches.astype(jnp.int32),
            num_inliers=res.num_inliers,
            covariance=res.covariance * cov_boost,
            keyframe_added=kf_needed,
        )
        return st, out

    st, out = jax.lax.cond(state.initialized, tick, bootstrap, state)
    return st._replace(age=state.age + 1.0), out


def local_ba_step(state: F2MState, cam: C.CameraModel, iters: int = 4,
                  huber_px: float = 3.0,
                  prune_px: float = 8.0) -> F2MState:
    """Local bundle adjustment over the keyframe window (reference:
    OdometryF2M.cpp:345-475 — sba over the last BundleAdjustmentMaxFrames
    keyframes + their map points, outlier observations pruned).

    Jittable: observation ids resolve to current map slots with one
    (F*K, M) equality contraction; the oldest window frame is the gauge
    anchor; refined points/poses scatter back masked.
    """
    from rtabmap_tpu.optim.ba import BAProblem, bundle_adjust, outlier_mask

    Fw, Kw = state.obs_ids.shape
    Mcap = state.map_pts.shape[0]
    obs_ids = state.obs_ids.reshape(-1)                       # (No,)
    obs_uv = state.obs_uv.reshape(-1, 2)
    frame_of = jnp.repeat(jnp.arange(Fw, dtype=jnp.int32), Kw)

    # id -> current slot (points culled from the map resolve to nothing)
    eq = (obs_ids[:, None] == state.map_ids[None, :]) & state.map_valid[None, :]
    slot = jnp.argmax(eq, axis=1).astype(jnp.int32)
    found = jnp.any(eq, axis=1) & (obs_ids >= 0)
    ok = found & state.kf_valid[frame_of]

    n_frames = jnp.sum(state.kf_valid)
    enough = n_frames >= 2

    uv_norm = jnp.stack([(obs_uv[:, 0] - cam.cx) / cam.fx,
                         (obs_uv[:, 1] - cam.cy) / cam.fy], axis=-1)
    extr = jax.vmap(T.inverse)(state.kf_poses)                # world->cam
    oldest = jnp.argmin(jnp.where(state.kf_valid, state.kf_stamp, jnp.inf))
    fixed = (jnp.zeros((Fw,), bool).at[oldest].set(True)
             | ~state.kf_valid)
    prob = BAProblem(poses=extr, points=state.map_pts,
                     cam_idx=frame_of, pt_idx=slot, uv=uv_norm,
                     valid=ok, fixed_cams=fixed)
    out, _ = bundle_adjust(prob, iters=iters,
                           huber=huber_px / float(cam.fx))

    # prune gross outlier observations from the window (sbaOutliers)
    bad = outlier_mask(out, prune_px / float(cam.fx)) & ok
    new_obs_ids = jnp.where(bad, -1, obs_ids).reshape(Fw, Kw)

    # write back only points actually observed by the window
    touched = jnp.zeros((Mcap,), bool).at[slot].set(ok, mode="drop")
    new_pts = jnp.where((touched & state.map_valid)[:, None],
                        out.points, state.map_pts)
    new_kf_poses = jax.vmap(T.inverse)(out.poses)
    new_kf_poses = jnp.where(state.kf_valid[:, None, None],
                             new_kf_poses, state.kf_poses)
    newest = jnp.argmax(jnp.where(state.kf_valid, state.kf_stamp, -jnp.inf))
    new_pose = jnp.where(enough, new_kf_poses[newest], state.pose)

    def apply(state):
        return state._replace(map_pts=new_pts, kf_poses=new_kf_poses,
                              pose=new_pose, obs_ids=new_obs_ids)

    return jax.lax.cond(enough, apply, lambda s: s, state)


class OdometryF2M:
    """Host-side wrapper with the reference's process() semantics: returns
    None transform + covariance 9999 on tracking loss (Odometry.cpp
    failure convention), and supports reset()."""

    def __init__(self, cam: C.CameraModel, params=None, map_capacity: int = 2000,
                 max_features: int = 512, seed: int = 0):
        from rtabmap_tpu.utils.params import Parameters

        p = params or Parameters()
        self.cam = cam
        self.max_features = int(p["Vis/MaxFeatures"] or max_features)
        self.ba_enabled = int(p["OdomF2M/BundleAdjustment"]) > 0
        ba_frames = int(p["OdomF2M/BundleAdjustmentMaxFrames"]) or 10
        self._ba_frames = max(2, min(ba_frames, 10))
        self.state = init_state(int(p["OdomF2M/MaxSize"]) or map_capacity,
                                ba_frames=self._ba_frames,
                                obs_capacity=self.max_features)
        self.keyframe_thr = float(p["Odom/KeyFrameThr"])
        self.min_inliers = int(p["Vis/MinInliers"])
        self.nndr = float(p["Vis/CorNNDR"])
        self.reproj_px = float(p["Vis/PnPReprojError"])
        self._key = jax.random.PRNGKey(seed)
        self._step = jax.jit(
            lambda st, fr, key: odom_step(
                st, fr, self.cam, key,
                nndr=self.nndr, reproj_px=self.reproj_px,
                min_inliers=self.min_inliers, keyframe_thr=self.keyframe_thr,
            )
        )
        self._ba = jax.jit(lambda st: local_ba_step(st, self.cam))
        self.lost = False

    def process(self, frame: FrameFeatures, imu_quat=None):
        self._key, sub = jax.random.split(self._key)
        self.state, res = self._step(self.state, frame, sub)
        ok = bool(res.success)
        if ok and self.ba_enabled and bool(res.keyframe_added):
            # refine window poses + map points; the refined newest-keyframe
            # pose becomes the output pose (OdometryF2M.cpp:345-475)
            self.state = self._ba(self.state)
            res = res._replace(pose=self.state.pose)
        if ok and imu_quat is not None:
            from rtabmap_tpu.odometry.imu_filter import apply_gravity_alignment

            aligned = apply_gravity_alignment(res.pose, jnp.asarray(imu_quat))
            self.state = self.state._replace(pose=aligned)
            res = res._replace(pose=aligned)
        self.lost = not ok
        info = {
            "matches": int(res.num_matches),
            "inliers": int(res.num_inliers),
            "keyframe": bool(res.keyframe_added),
        }
        if not ok:
            return None, jnp.eye(6) * 9999.0, info
        return res.pose, res.covariance, info

    def reset(self, pose=None):
        cap = self.state.map_pts.shape[0]
        self.state = init_state(cap, ba_frames=self.state.obs_ids.shape[0],
                                obs_capacity=self.state.obs_ids.shape[1])
        if pose is not None:
            self.state = self.state._replace(pose=jnp.asarray(pose))

    @property
    def pose(self):
        return self.state.pose
