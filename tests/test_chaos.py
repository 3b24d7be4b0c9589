"""Fault injection: the engine's recovery machinery under induced
failures (odometry loss -> new session; frame drops; covariance spikes)."""
import jax
import jax.numpy as jnp
import numpy as np

from rtabmap_tpu.core.frame import extract_features
from rtabmap_tpu.datasets import synthetic as S
from rtabmap_tpu.engine.rtabmap import Rtabmap
from rtabmap_tpu.geometry import camera as C
from rtabmap_tpu.geometry import transform as T
from rtabmap_tpu.odometry.f2m import OdometryF2M
from rtabmap_tpu.utils.chaos import FaultSchedule
from rtabmap_tpu.utils.params import Parameters


def test_odom_loss_triggers_new_session_and_recovery():
    cam = C.CameraModel.make(300.0, 300.0, 160.0, 120.0, 320, 240)
    p = Parameters().set("Rtabmap/DetectionRate", 0)
    odom = OdometryF2M(cam, p, max_features=192)
    slam = Rtabmap(cam, p, node_capacity=128, words_per_frame=192)
    extract = jax.jit(lambda g, d: extract_features(g, d, cam, 192))
    poses = S.loop_trajectory(64)[:12]
    faults = FaultSchedule(seed=0, odom_loss_at=(5,))

    map_ids = []
    for i in range(12):
        g, d = S.render(poses[i], cam)
        feat = extract(g, d)
        pose, cov, info = faults.odometry(odom.process(feat))
        if pose is None:  # the dataset-tool convention: reset odometry
            odom.reset()
            pose, cov = odom.pose, np.eye(6) * 9999.0
        st = slam.process(feat, np.asarray(pose), np.asarray(cov),
                          stamp=i * 0.1)
        last = slam.get_last_location_id()
        map_ids.append(slam.memory.get(last).map_id)
    assert faults.injected["odom_loss"] == 1
    # a new map session started at the loss, and mapping continued after
    assert map_ids[0] == 0 and map_ids[-1] == 1
    assert slam.get_total_mem_size() >= 10


def test_frame_drops_and_cov_spikes_survive():
    cam = C.CameraModel.make(300.0, 300.0, 160.0, 120.0, 320, 240)
    p = Parameters().set("Rtabmap/DetectionRate", 0)
    odom = OdometryF2M(cam, p, max_features=192)
    slam = Rtabmap(cam, p, node_capacity=128, words_per_frame=192)
    extract = jax.jit(lambda g, d: extract_features(g, d, cam, 192))
    poses = S.loop_trajectory(96)[:16]
    faults = FaultSchedule(seed=3, drop_frame_p=0.25,
                           covariance_spike_p=0.5,
                           covariance_spike_scale=100.0)

    class Fr:
        def __init__(self, g, d):
            self.gray, self.depth = g, d

    stream = (Fr(*S.render(poses[i], cam)) for i in range(16))
    n = 0
    for fr in faults.frames(stream):
        feat = extract(fr.gray, fr.depth)
        pose, cov, info = faults.odometry(odom.process(feat))
        if pose is None:
            odom.reset()
            continue
        slam.process(feat, np.asarray(pose), np.asarray(cov), stamp=n * 0.1)
        n += 1
    assert faults.injected["dropped"] >= 2
    assert faults.injected["cov_spike"] >= 2
    # spiked covariances weaken links but must not corrupt the graph
    poses_out = slam.get_optimized_poses()
    assert all(np.isfinite(np.asarray(p)).all() for p in poses_out.values())
    assert slam.get_total_mem_size() >= n - 2
