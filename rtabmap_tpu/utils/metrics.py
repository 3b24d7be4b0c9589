"""Trajectory evaluation metrics: ATE RMSE, RPE, KITTI segment errors.

Capability parity: the reference's graph metric toolbox
(/root/reference/corelib/src/Graph.cpp:799 ``calcRMSE`` — SE(3)-aligned
(optionally scaled) translational RMSE vs ground truth; :690
``calcKittiSequenceErrors`` — official KITTI segment protocol; :758
``calcRelativeErrors``). Batched JAX/numpy implementations.
"""
from __future__ import annotations

from typing import Dict, Tuple

import jax.numpy as jnp
import numpy as np

from rtabmap_tpu.geometry import transform as T


def align_umeyama(est_t, gt_t, with_scale: bool = False):
    """Closed-form SE(3) (+scale) alignment est->gt over (N,3) translations.

    Returns (s, R (3,3), t (3,)) minimizing ||gt - (s R est + t)||².
    """
    est = np.asarray(est_t, np.float64)
    gt = np.asarray(gt_t, np.float64)
    mu_e = est.mean(0)
    mu_g = gt.mean(0)
    ec = est - mu_e
    gc = gt - mu_g
    H = ec.T @ gc / est.shape[0]
    U, S, Vt = np.linalg.svd(H)
    d = np.sign(np.linalg.det(Vt.T @ U.T))
    D = np.diag([1.0, 1.0, d])
    R = Vt.T @ D @ U.T
    if with_scale:
        var_e = (ec ** 2).sum() / est.shape[0]
        s = float(np.trace(np.diag(S) @ D) / var_e) if var_e > 0 else 1.0
    else:
        s = 1.0
    t = mu_g - s * R @ mu_e
    return s, R, t


def ate_rmse(est_poses, gt_poses, with_scale: bool = False) -> float:
    """SE(3)-aligned translational RMSE (meters). Poses (N,3,4)."""
    est_t = np.asarray(est_poses)[:, :3, 3]
    gt_t = np.asarray(gt_poses)[:, :3, 3]
    s, R, t = align_umeyama(est_t, gt_t, with_scale)
    aligned = (s * (R @ est_t.T)).T + t
    err = np.linalg.norm(aligned - gt_t, axis=1)
    return float(np.sqrt((err ** 2).mean()))


def gt_error_stats(est_poses, gt_poses) -> Dict[str, float]:
    """Reference graph::calcRMSE parity (Graph.cpp:799, feeding the Gt/*
    statistics family): anchor the estimated trajectory at the first
    ground-truth pose (NOT Umeyama — the reference aligns on the first
    pose only), then report translational/rotational error statistics.

    Returns the 12 Gt/* aggregate values in reference units (m / deg)."""
    est = np.asarray(est_poses, np.float64)
    gt = np.asarray(gt_poses, np.float64)
    n = min(len(est), len(gt))
    if n == 0:
        return {}
    est, gt = est[:n], gt[:n]

    def to44(P):
        M = np.tile(np.eye(4), (P.shape[0], 1, 1))
        M[:, :3, :] = P
        return M

    E, G = to44(est), to44(gt)
    anchor = G[0] @ np.linalg.inv(E[0])
    A = anchor[None] @ E
    # per-node error transform gt^-1 * aligned_est
    D = np.linalg.inv(G) @ A
    t_err = np.linalg.norm(D[:, :3, 3], axis=1)
    cos = np.clip((np.trace(D[:, :3, :3], axis1=1, axis2=2) - 1) / 2, -1, 1)
    r_err = np.degrees(np.arccos(cos))
    return {
        # localization error of the LATEST node (reference:
        # kGtLocalization_linear_error computed per update)
        "Gt/Localization linear error/m": float(t_err[-1]),
        "Gt/Localization angular error/deg": float(r_err[-1]),
        "Gt/Translational rmse/m": float(np.sqrt((t_err ** 2).mean())),
        "Gt/Translational mean/m": float(t_err.mean()),
        "Gt/Translational median/m": float(np.median(t_err)),
        "Gt/Translational std/m": float(t_err.std()),
        "Gt/Translational min/m": float(t_err.min()),
        "Gt/Translational max/m": float(t_err.max()),
        "Gt/Rotational rmse/deg": float(np.sqrt((r_err ** 2).mean())),
        "Gt/Rotational mean/deg": float(r_err.mean()),
        "Gt/Rotational median/deg": float(np.median(r_err)),
        "Gt/Rotational std/deg": float(r_err.std()),
        "Gt/Rotational min/deg": float(r_err.min()),
        "Gt/Rotational max/deg": float(r_err.max()),
    }


def rpe(est_poses, gt_poses, delta: int = 1) -> Tuple[float, float]:
    """Relative pose error over frame gaps of ``delta``:
    (trans RMSE m, rot RMSE rad)."""
    est = np.asarray(est_poses)
    gt = np.asarray(gt_poses)
    n = est.shape[0] - delta
    te, re = [], []
    for i in range(n):
        de = np.asarray(T.relative(jnp.asarray(est[i]), jnp.asarray(est[i + delta])))
        dg = np.asarray(T.relative(jnp.asarray(gt[i]), jnp.asarray(gt[i + delta])))
        e = np.asarray(T.relative(jnp.asarray(dg), jnp.asarray(de)))
        te.append(np.linalg.norm(e[:3, 3]))
        re.append(float(np.asarray(T.rotation_angle(jnp.asarray(e)))))
    return float(np.sqrt(np.mean(np.square(te)))), float(np.sqrt(np.mean(np.square(re))))


_KITTI_LENGTHS = (100.0, 200.0, 300.0, 400.0, 500.0, 600.0, 700.0, 800.0)


def _trajectory_distances(poses):
    t = poses[:, :3, 3]
    d = np.zeros(len(poses))
    d[1:] = np.cumsum(np.linalg.norm(np.diff(t, axis=0), axis=1))
    return d


def kitti_sequence_errors(est_poses, gt_poses, step: int = 10) -> Tuple[float, float]:
    """Official KITTI protocol: average (t_err %, r_err deg/m) over segment
    lengths 100..800 m, evaluated every ``step`` frames.

    (reference: Graph.cpp:690 calcKittiSequenceErrors.)
    """
    est = np.asarray(est_poses, np.float64)
    gt = np.asarray(gt_poses, np.float64)
    dist = _trajectory_distances(gt)
    t_errs, r_errs = [], []

    def last_frame_from(first, length):
        for i in range(first, len(dist)):
            if dist[i] > dist[first] + length:
                return i
        return -1

    def inv(P):
        R = P[:3, :3]
        t = P[:3, 3]
        out = np.eye(4)
        out[:3, :3] = R.T
        out[:3, 3] = -R.T @ t
        return out

    def to44(P):
        out = np.eye(4)
        out[:3, :4] = P[:3, :4]
        return out

    for first in range(0, len(est), step):
        for length in _KITTI_LENGTHS:
            last = last_frame_from(first, length)
            if last < 0:
                continue
            pose_delta_gt = inv(to44(gt[first])) @ to44(gt[last])
            pose_delta_est = inv(to44(est[first])) @ to44(est[last])
            pose_err = inv(pose_delta_est) @ pose_delta_gt
            r_err = np.arccos(np.clip((np.trace(pose_err[:3, :3]) - 1) / 2, -1, 1))
            t_err = np.linalg.norm(pose_err[:3, 3])
            t_errs.append(t_err / length)
            r_errs.append(r_err / length)
    if not t_errs:
        return 0.0, 0.0
    return float(np.mean(t_errs) * 100.0), float(np.degrees(np.mean(r_errs)))


def summarize(est_poses, gt_poses) -> Dict[str, float]:
    out = {
        "ate_rmse": ate_rmse(est_poses, gt_poses),
        "ate_rmse_scaled": ate_rmse(est_poses, gt_poses, with_scale=True),
    }
    t, r = rpe(est_poses, gt_poses)
    out["rpe_trans"] = t
    out["rpe_rot"] = r
    return out
