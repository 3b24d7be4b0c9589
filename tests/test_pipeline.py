"""Threaded capture->odometry->SLAM pipeline."""
import jax
import numpy as np
import pytest

from rtabmap_tpu.geometry import camera as C
from rtabmap_tpu.datasets import synthetic as S
from rtabmap_tpu.core.frame import extract_features
from rtabmap_tpu.core.pipeline import run_pipeline
from rtabmap_tpu.odometry.f2m import OdometryF2M
from rtabmap_tpu.engine.rtabmap import Rtabmap
from rtabmap_tpu.utils.params import Parameters

CAM = C.CameraModel.make(300.0, 300.0, 160.0, 120.0, 320, 240)


@pytest.mark.slow
def test_pipeline_end_to_end():
    n = 10
    poses = S.loop_trajectory(64)[:n]
    frames = []
    for i in range(n):
        g, d = S.render(poses[i], CAM)

        class Item:
            pass

        it = Item()
        it.gray, it.depth, it.stamp = g, d, float(i)
        frames.append(it)

    extract = jax.jit(lambda g, d: extract_features(g, d, CAM, 384))
    odom = OdometryF2M(CAM)
    slam = Rtabmap(CAM, Parameters(), node_capacity=64, words_per_frame=384)
    # deep queues: lossless mode (drop policy itself is tested below)
    eng, counters = run_pipeline(
        frames, odom, slam,
        post_update=lambda it: extract(it.gray, it.depth),
        queue_size=16,
    )
    assert counters["captured"] == n
    assert counters["slam_processed"] == n
    assert counters["sensor_dropped"] == 0
    assert len(slam.memory.signatures) == n


def test_drop_queue_policy():
    from rtabmap_tpu.core.pipeline import _DropQueue

    q = _DropQueue(2)
    for i in range(5):
        q.put(i)
    # oldest dropped: 3 and 4 remain
    assert q.get() == 3
    assert q.get() == 4
    assert q.dropped == 3
