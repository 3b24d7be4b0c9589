"""Scan-to-map (LiDAR/ICP) odometry tests.

Reference behavior: OdometryF2M scan local map
(/root/reference/corelib/src/odometry/OdometryF2M.cpp — Odom/ScanKeyFrameThr
keyframes, OdomF2M/ScanSubtractRadius merge, OdomF2M/ScanMaxSize cull) and
the LidarMapping example.
"""
import numpy as np
import jax.numpy as jnp
import pytest

from rtabmap_tpu.datasets import synthetic as S
from rtabmap_tpu.geometry import transform as T
from rtabmap_tpu.odometry.scan_f2m import OdometryScanF2M
from rtabmap_tpu.utils import metrics
from rtabmap_tpu.utils.params import Parameters


def _params():
    return Parameters({
        "Icp/MaxCorrespondenceDistance": 0.5,
        "Icp/Iterations": 15,
        "Icp/CorrespondenceRatio": 0.2,
    })


def test_scan_odometry_tracks_box_room():
    n = 25
    poses = S.lidar_trajectory(n, radius=2.0)
    # only traverse a quarter of the loop: consecutive motion ~0.13 m/frame
    poses = poses[: n // 2]
    odom = OdometryScanF2M(params=_params(), map_capacity=2048, scan_voxel=0.08)

    est, gt = [], []
    for i in range(poses.shape[0]):
        pts, valid = S.lidar_scan(poses[i], n_azimuth=180, n_rings=6)
        pose, cov, info = odom.process(pts, valid)
        assert pose is not None, f"odometry lost at frame {i}: {info}"
        est.append(np.asarray(pose))
        gt.append(np.asarray(poses[i]))

    ate = metrics.ate_rmse(jnp.asarray(np.stack(est)), jnp.asarray(np.stack(gt)))
    assert float(ate) < 0.05, f"scan odometry ATE {float(ate):.4f} m"


def test_scan_odometry_keyframes_and_capacity():
    poses = S.lidar_trajectory(30, radius=2.0)
    odom = OdometryScanF2M(params=_params(), map_capacity=1024, scan_voxel=0.1)
    kf = 0
    for i in range(10):
        pts, valid = S.lidar_scan(poses[i], n_azimuth=120, n_rings=4)
        pose, cov, info = odom.process(pts, valid)
        kf += int(info["keyframe"])
        assert info["map_points"] <= 1024
    assert kf >= 1  # bootstrap keyframe at minimum
    # map accumulated points from more than the first scan or stayed compact
    assert int(jnp.sum(odom.state.map_valid)) > 0


def test_scan_odometry_lost_on_garbage():
    poses = S.lidar_trajectory(10, radius=2.0)
    odom = OdometryScanF2M(params=_params(), map_capacity=1024, scan_voxel=0.1)
    pts, valid = S.lidar_scan(poses[0], n_azimuth=120, n_rings=4)
    odom.process(pts, valid)
    # far-away random cloud: no correspondences within range -> lost
    rng = np.random.RandomState(0)
    junk = jnp.asarray(100.0 + rng.rand(480, 3).astype(np.float32))
    pose, cov, info = odom.process(junk, jnp.ones((480,), bool))
    assert pose is None
    assert float(cov[0, 0]) >= 9999.0


def test_factory_dispatches_reg_strategy_icp():
    from rtabmap_tpu.odometry import create_odometry

    p = _params().set("Reg/Strategy", 1)
    odom = create_odometry(None, p)
    assert isinstance(odom, OdometryScanF2M)
