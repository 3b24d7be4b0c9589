"""Shared dataset benchmark loop: camera stream -> odometry -> SLAM -> ATE.

Capability parity: the reference's dataset tools' main loops
(/root/reference/tools/RgbdDataset/main.cpp:276-330 — postUpdate,
odometry, covariance>=9999 triggers new map, detection-rate gate,
end-of-run `graph::calcRMSE`; KittiDataset adds calcKittiSequenceErrors).
"""
from __future__ import annotations

import time
from typing import Dict, Iterable, Optional

import numpy as np


def run_dataset(frames: Iterable, camera, params=None, stereo_model=None,
                max_kp: int = 512, node_capacity: int = 1024,
                db=None, verbose: bool = True,
                max_frames: int = 0, kitti_errors: bool = False,
                imu_method: str = "madgwick") -> Dict:
    """Run odometry+SLAM over frames; returns metrics + trajectories."""
    import jax
    import jax.numpy as jnp

    from rtabmap_tpu.core.frame import (FeatureExtractor, FrameFeatures,
                                        extract_features)
    from rtabmap_tpu.engine.rtabmap import Rtabmap
    from rtabmap_tpu.odometry.f2m import OdometryF2M
    from rtabmap_tpu.ops import features as F, stereo as ST
    from rtabmap_tpu.utils import metrics
    from rtabmap_tpu.utils.params import Parameters

    from rtabmap_tpu.utils.logging import profile_trace

    p = params or Parameters()
    odom = OdometryF2M(camera, p)
    slam = Rtabmap(camera, p, db=db, node_capacity=node_capacity,
                   words_per_frame=max_kp)
    profiling = bool(str(p["Tpu/ProfileDir"]))
    # Mem/UseOdomFeatures (reference: Memory.cpp:5025 createSignature —
    # true reuses the odometry frame's features for the SLAM node; false
    # re-extracts with the Kp/ budget). Default true = one extraction
    # feeds both, the fused-dispatch fast path.
    use_odom_features = bool(p["Mem/UseOdomFeatures"])
    kp_budget = int(p["Kp/MaxFeatures"])
    if kp_budget <= 0 or kp_budget > max_kp:
        kp_budget = max_kp

    # Kp/DetectorStrategy dispatch (classical response maps or the learned
    # SuperPoint front end, strategy 11) — reference: Feature2D::create
    fe = FeatureExtractor(camera, p, max_kp=max_kp)

    @jax.jit
    def limit_to_kp_budget(feat):
        # keep the top Kp/MaxFeatures responses at the SAME static shape
        # (slabs are sized words_per_frame=max_kp)
        keep = jnp.arange(feat.uv.shape[0]) < kp_budget
        return feat._replace(valid=feat.valid & keep,
                             valid3d=feat.valid3d & keep)

    def extract_stereo_fn(gl, gr):
        kps, desc = F.detect_and_describe(gl, max_kp)
        pts, ok = ST.keypoints_3d_from_stereo(kps.uv, kps.valid, gl, gr, stereo_model)
        return FrameFeatures(uv=kps.uv, desc=desc, pts3d=pts, valid=kps.valid,
                             valid3d=ok, angle=kps.angle, response=kps.response)

    extract_stereo = jax.jit(extract_stereo_fn)

    def extract_stereo_learned(gl, gr):
        # learned detector on the left image; 3D from LK stereo (the
        # reference equally composes SuperPoint with Stereo/* matching)
        kps, desc, descf = fe._sp.extract(gl, max_kp, nms_size=fe._sp_nms,
                                          conf_threshold=fe._sp_threshold)
        pts, ok = ST.keypoints_3d_from_stereo(kps.uv, kps.valid, gl, gr,
                                              stereo_model)
        return FrameFeatures(uv=kps.uv, desc=desc, pts3d=pts, valid=kps.valid,
                             valid3d=ok, angle=kps.angle,
                             response=kps.response), descf

    est_odom, est_stamps, gt_poses = [], [], []
    n_loops = n_lost = 0
    # IMU gravity alignment (SensorCaptureThread::enableIMUFiltering):
    # per-frame sample batches are zero-padded to one static shape so the
    # Madgwick/complementary scan jits once
    IMU_PAD = 64
    imu_q = None
    prev_imu_t = None
    prev_wheel = None  # external-odometry fallback (CidSims --odom)
    t0 = time.time()
    with profile_trace(str(p["Tpu/ProfileDir"])):
        for i, fr in enumerate(frames):
            if max_frames and i >= max_frames:
                break
            with profile_trace.step(i, enabled=profiling):
                gray = jnp.asarray(fr.gray)
                _t_ex = time.perf_counter()
                stereo_used = False
                descf = None
                if fr.depth is not None:
                    feat, descf = fe.extract(gray, jnp.asarray(fr.depth))
                elif fr.right is not None:
                    if fe.learned:
                        feat, descf = extract_stereo_learned(
                            gray, jnp.asarray(fr.right))
                    else:
                        feat = extract_stereo(gray, jnp.asarray(fr.right))
                    stereo_used = True
                else:
                    raise ValueError("frame has neither depth nor right image")
                jax.block_until_ready(feat.uv)
                extract_ms = (time.perf_counter() - _t_ex) * 1000.0
                # capture-stage timing parity (reference: createSignature's
                # TimingMem split, Memory.cpp:5025+): detection, descriptors,
                # 3D keypoints, subpixel, and stereo correspondences all run
                # inside the ONE fused extract dispatch here — the total is
                # attributed to detection, the fused stages report 0 (like
                # the reference reports 0 for stages its config skips)
                capture_stats = {
                    "TimingMem/Keypoints detection/ms": extract_ms,
                    "TimingMem/Descriptors extraction/ms": 0.0,
                    "TimingMem/Keypoints 3D/ms": 0.0,
                    "TimingMem/Keypoints 3D motion/ms": 0.0,
                    "TimingMem/Subpixel/ms": 0.0,
                    "TimingMem/Post decimation/ms": 0.0,
                    "TimingMem/Rectification/ms": 0.0,
                    "TimingMem/Stereo correspondences/ms":
                        extract_ms if stereo_used else 0.0,
                    "TimingMem/Scan filtering/ms": 0.0,
                    "TimingMem/Occupancy grid/ms": 0.0,
                    "TimingMem/Markers detection/ms": 0.0,
                    "Memory/Images buffered/": 0,
                }
                imu_quat = None
                if fr.imu:
                    from rtabmap_tpu.odometry.imu_filter import integrate_imu

                    n_s = min(len(fr.imu), IMU_PAD)
                    g_b = np.zeros((IMU_PAD, 3), np.float32)
                    a_b = np.zeros((IMU_PAD, 3), np.float32)
                    dt_b = np.zeros((IMU_PAD,), np.float32)
                    for s_i, (ts, gy, ac) in enumerate(fr.imu[:IMU_PAD]):
                        dt_b[s_i] = max(ts - prev_imu_t, 0.0) \
                            if prev_imu_t is not None else 0.0
                        prev_imu_t = ts
                        g_b[s_i], a_b[s_i] = gy, ac
                    qs = integrate_imu(jnp.asarray(g_b), jnp.asarray(a_b),
                                       jnp.asarray(dt_b),
                                       q0=imu_q, method=imu_method)
                    imu_q = qs[n_s - 1]
                    imu_quat = imu_q
                _t_odom = time.perf_counter()
                pose, cov, info = odom.process(feat, imu_quat=imu_quat)
                odom_ms = (time.perf_counter() - _t_odom) * 1000.0
                if pose is None:
                    n_lost += 1
                    if fr.odom_pose is not None and prev_wheel is not None \
                            and est_odom:
                        # re-seed VO from the external (wheel) odometry delta
                        # (CidSimsDataset --odom: setOdometryPath guess role)
                        from rtabmap_tpu.geometry import transform as T

                        delta = T.relative(jnp.asarray(prev_wheel),
                                           jnp.asarray(fr.odom_pose))
                        pose = np.asarray(T.compose(
                            jnp.asarray(est_odom[-1]), delta))
                        odom.reset(pose)
                        cov = np.eye(6) * 9999.0
                    else:
                        pose, cov = odom.pose, np.eye(6) * 9999.0
                if fr.odom_pose is not None:
                    prev_wheel = fr.odom_pose
                slam_feat = feat
                if not use_odom_features:
                    # independent Kp/-budget feature set for the map node
                    slam_feat = limit_to_kp_budget(feat)
                st = slam.process(
                    slam_feat, np.asarray(pose), np.asarray(cov),
                    stamp=fr.stamp,
                    gt_pose=fr.gt_pose,
                    raw=(fr.gray, fr.depth) if db is not None else None,
                    descf=descf,
                    extra_stats={"Odometry/TotalTime/ms": odom_ms,
                                 **capture_stats})
            n_loops += int(st.loop_closure_id > 0)
            est_odom.append(np.asarray(pose))
            est_stamps.append(fr.stamp)
            gt_poses.append(fr.gt_pose)
            if verbose and (i + 1) % 50 == 0:
                print(f"frame {i+1}: odom inliers={info['inliers']} loops={n_loops} "
                      f"wm={int(st.get('Memory/Working memory size/'))} "
                      f"({(i+1)/(time.time()-t0):.1f} fps)")

    elapsed = time.time() - t0
    opt = slam.get_optimized_poses()
    ids = sorted(opt)
    est_slam = np.stack([opt[i] for i in ids]) if ids else np.zeros((0, 3, 4))

    out = {
        "frames": len(est_odom), "elapsed_s": elapsed,
        "fps": len(est_odom) / max(elapsed, 1e-9),
        "loops": n_loops, "lost": n_lost,
        "est_odom": np.stack(est_odom) if est_odom else np.zeros((0, 3, 4)),
        "est_slam": est_slam, "stamps": est_stamps,
        "slam": slam, "odom": odom,
    }
    have_gt = [k for k, g in enumerate(gt_poses) if g is not None]
    if len(have_gt) >= 5:
        gt = np.stack([gt_poses[k] for k in have_gt])
        eo = out["est_odom"][have_gt]
        es = est_slam[have_gt] if est_slam.shape[0] == len(est_odom) else None
        out["ate_odom"] = metrics.ate_rmse(eo, gt)
        if es is not None:
            out["ate_slam"] = metrics.ate_rmse(es, gt)
        if kitti_errors:
            src = es if es is not None else eo
            t_err, r_err = metrics.kitti_sequence_errors(src, gt)
            out["kitti_t_err_pct"] = t_err
            out["kitti_r_err_deg_per_m"] = r_err
    if verbose:
        msg = f"done: {out['frames']} frames in {elapsed:.1f}s ({out['fps']:.2f} fps), " \
              f"{n_loops} loops, {n_lost} lost"
        if "ate_slam" in out:
            msg += f", ATE slam={out['ate_slam']:.4f} odom={out['ate_odom']:.4f}"
        print(msg)
    return out
