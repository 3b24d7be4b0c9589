"""Localization mode: relocalize a rebooted robot against a frozen map."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rtabmap_tpu.geometry import camera as C
from rtabmap_tpu.geometry import transform as T
from rtabmap_tpu.datasets import synthetic as S
from rtabmap_tpu.core.frame import extract_features
from rtabmap_tpu.engine.rtabmap import Rtabmap
from rtabmap_tpu.memory.db import Database
from rtabmap_tpu.utils.params import Parameters

CAM = C.CameraModel.make(300.0, 300.0, 160.0, 120.0, 320, 240)


@pytest.mark.slow
def test_localization_against_frozen_map(tmp_path):
    path = str(tmp_path / "map.db")
    poses_gt = S.loop_trajectory(48)
    extract = jax.jit(lambda g, d: extract_features(g, d, CAM, 384))

    # --- mapping session over the full loop (GT odometry)
    db = Database(path)
    slam = Rtabmap(CAM, Parameters(), db=db, node_capacity=128, words_per_frame=384)
    for i in range(0, 48, 2):
        g, d = S.render(poses_gt[i], CAM)
        slam.process(extract(g, d), np.asarray(poses_gt[i]), np.eye(6) * 1e-4,
                     stamp=float(i))
    slam.close()
    db.close()

    # --- localization session: odometry restarts at IDENTITY at frame 20
    db2 = Database(path)
    p = Parameters({"Mem/IncrementalMemory": False})
    loc = Rtabmap.load(db2, CAM, p, node_capacity=128, words_per_frame=384,
                       new_session=True)
    n_map_nodes = len(loc.memory.signatures)
    start = 20
    T0 = poses_gt[start]
    localized = []
    for k, i in enumerate(range(start, start + 10, 2)):
        g, d = S.render(poses_gt[i], CAM)
        odom_pose = np.asarray(T.relative(T0, poses_gt[i]))  # identity-based odom
        st = loc.process(extract(g, d), odom_pose, np.eye(6) * 1e-4,
                         stamp=float(100 + i))
        if st.get("Loop/Localized/", 0):
            cur = loc.optimized_poses[st.ref_id]
            err = float(jnp.linalg.norm(
                T.se3_log(T.relative(jnp.asarray(cur), poses_gt[i]))))
            localized.append(err)
    assert localized, "never localized against the map"
    assert min(localized) < 0.1, localized
    # frozen map: no new permanent nodes beyond the STM ring
    assert len(loc.memory.wm) == len([s for s in loc.memory.signatures.values()
                                      if s.map_id == 0 and not s.in_ltm])
    assert len(loc.memory.signatures) <= n_map_nodes + loc.memory.stm_size + 6
    db2.close()


def test_scan_localization_global_scan_map(tmp_path):
    """LiDAR localization: RGBD/ProximityGlobalScanMap registers the
    current scan against the assembled global scan map and recovers the
    map correction (reference: Rtabmap localization-mode global scan map)."""
    from rtabmap_tpu.core.laser_scan import ScanFormat, make_scan
    from rtabmap_tpu.datasets import synthetic as S2

    path = str(tmp_path / "scanmap.db")
    rng = np.random.default_rng(0)
    extract = jax.jit(lambda g, d: extract_features(g, d, CAM, 128))

    def scan_at(P, seed):
        pts, valid = S2.lidar_scan(jnp.asarray(P), n_azimuth=180, n_rings=6)
        return make_scan(pts, fmt=ScanFormat.XYZ, valid=valid)

    traj = S2.lidar_trajectory(24, radius=2.0)

    def rand_frame():
        g = jnp.asarray(rng.random((240, 320), np.float32))
        d = jnp.asarray(1.0 + rng.random((240, 320), np.float32))
        return extract(g, d)

    db = Database(path)
    p_map = Parameters({"Rtabmap/LoopThr": 2.0, "RGBD/LocalRadius": 0.0,
                        "Rtabmap/DetectionRate": 0})
    slam = Rtabmap(CAM, p_map, db=db, node_capacity=64, words_per_frame=128)
    for i in range(0, 24, 2):
        slam.process(rand_frame(), np.asarray(traj[i]), np.eye(6) * 1e-4,
                     stamp=float(i + 1), scan=scan_at(traj[i], i))
    slam.close()
    db.close()

    db2 = Database(path)
    p_loc = Parameters({"Mem/IncrementalMemory": False,
                        "Rtabmap/LoopThr": 2.0,
                        "RGBD/ProximityGlobalScanMap": True,
                        "Rtabmap/DetectionRate": 0,
                        "Icp/MaxCorrespondenceDistance": 0.5})
    loc = Rtabmap.load(db2, CAM, p_loc, node_capacity=64,
                       words_per_frame=128, new_session=True)
    start = 8
    T0 = jnp.asarray(traj[start])
    # seed a rough prior (reference: Rtabmap::setInitialPose): ~0.25 m /
    # ~8 deg off the true restart pose; scan ICP must pull it in
    perturb = T.se3_exp(jnp.asarray([0.2, -0.15, 0.0, 0.0, 0.0, 0.15]))
    loc.set_initial_pose(np.asarray(T.compose(T0, perturb)))
    errs = []
    for i in range(start, start + 6, 2):
        odom_pose = np.asarray(T.relative(T0, jnp.asarray(traj[i])))
        st = loc.process(rand_frame(), odom_pose, np.eye(6) * 1e-4,
                         stamp=float(100 + i), scan=scan_at(traj[i], 100 + i))
        if st.get("Loop/Localized/", 0):
            cur = loc.optimized_poses[st.ref_id]
            errs.append(float(jnp.linalg.norm(
                T.se3_log(T.relative(jnp.asarray(cur), jnp.asarray(traj[i]))))))
    assert errs, "never scan-localized against the global scan map"
    assert min(errs) < 0.1, errs
    db2.close()
