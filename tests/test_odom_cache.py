"""Localization-mode odometry cache: inconsistent localizations are
rejected by optimizing the rolling odometry window against the frozen map
(reference: Rtabmap.cpp:1816-1842 cache update, :3335+ verification,
RGBD/MaxOdomCacheSize / RGBD/LocalizationPriorError)."""
import numpy as np
import pytest

from rtabmap_tpu.engine.rtabmap import Rtabmap, info_from_cov
from rtabmap_tpu.geometry import camera as C
from rtabmap_tpu.memory.memory import LINK_GLOBAL_CLOSURE, LINK_NEIGHBOR, Link
from rtabmap_tpu.utils.logging import Statistics
from rtabmap_tpu.utils.params import Parameters

CAM = C.CameraModel.make(300.0, 300.0, 160.0, 120.0, 320, 240)


def _pose(x, y=0.0):
    p = np.eye(3, 4, dtype=np.float32)
    p[0, 3] = x
    p[1, 3] = y
    return p


def _loc_engine(cache=10):
    p = Parameters({"Mem/IncrementalMemory": False,
                    "RGBD/MaxOdomCacheSize": cache,
                    "RGBD/OptimizeMaxError": 3.0})
    return Rtabmap(CAM, p, node_capacity=64, words_per_frame=64)


class _FakeSig:
    def __init__(self, sid):
        self.id = sid


def _prime_cache(slam, ids_x):
    """Fill the odometry cache with a straight-line walk."""
    prev = None
    for sid, x in ids_x:
        pose = _pose(x)
        if prev is not None:
            pid, px = prev
            t = _pose(x - px)
            slam._odom_cache_links[(pid, sid)] = Link(
                pid, sid, LINK_NEIGHBOR, t, np.eye(6, dtype=np.float32) * 1e4)
        slam._odom_cache_poses[sid] = pose
        prev = (sid, x)


def test_consistent_localization_accepted():
    slam = _loc_engine()
    # frozen map node 1 at x=0 (map frame == odom frame here)
    slam.optimized_poses[1] = _pose(0.0)
    _prime_cache(slam, [(10, 0.0), (11, 0.5), (12, 1.0)])
    # localization: node 1 sees node 12 at x=1.0 -> T_1_12 = +1.0
    lk = Link(1, 12, LINK_GLOBAL_CLOSURE, _pose(1.0),
              np.eye(6, dtype=np.float32) * 1e2)
    st = Statistics()
    cur = slam._localize_with_odom_cache(_FakeSig(12), [lk], _pose(1.0), st)
    assert cur is not None
    np.testing.assert_allclose(cur[:3, 3], [1.0, 0, 0], atol=1e-2)
    # accepted link is kept in the cache for later verification
    assert (1, 12) in slam._odom_cache_links


def test_inconsistent_localization_rejected():
    """A teleporting localization (5 m off what odometry allows, given a
    previous accepted localization) must be rejected — the
    direct-correction path would have accepted it blindly."""
    slam = _loc_engine()
    slam.optimized_poses[1] = _pose(0.0)
    slam.optimized_poses[2] = _pose(10.0)
    _prime_cache(slam, [(10, 0.0), (11, 0.5), (12, 1.0)])
    # first, a good localization on node 1 at cache node 10: T_1_10 = 0
    good = Link(1, 10, LINK_GLOBAL_CLOSURE, _pose(0.0),
                np.eye(6, dtype=np.float32) * 1e2)
    st = Statistics()
    assert slam._localize_with_odom_cache(_FakeSig(10), [good], _pose(0.0), st) is not None
    # now a wrong localization: node 2 (at x=10) claims the robot at cache
    # node 12 is right on it (T_2_12 = 0) — odometry says we moved only 1 m
    bad = Link(2, 12, LINK_GLOBAL_CLOSURE, _pose(0.0),
               np.eye(6, dtype=np.float32) * 1e2)
    st2 = Statistics()
    cur = slam._localize_with_odom_cache(_FakeSig(12), [bad], _pose(1.0), st2)
    assert cur is None, "teleporting localization was accepted"
    assert st2.get("Loop/Optimization max error ratio/") > 3.0


def test_engine_rejects_teleport_end_to_end():
    """Engine-level: with the odom cache active, a forged far-off
    localization link is rejected in process() and removed from memory."""
    import jax
    import jax.numpy as jnp

    from rtabmap_tpu.core.frame import extract_features
    from rtabmap_tpu.datasets import synthetic as S
    from rtabmap_tpu.geometry import transform as T
    from rtabmap_tpu.memory.db import Database

    poses_gt = S.loop_trajectory(32)
    extract = jax.jit(lambda g, d: extract_features(g, d, CAM, 256))

    # mapping session
    slam = Rtabmap(CAM, Parameters(), node_capacity=96, words_per_frame=256)
    for i in range(0, 32, 2):
        g, d = S.render(poses_gt[i], CAM)
        slam.process(extract(g, d), np.asarray(poses_gt[i]),
                     np.eye(6) * 1e-4, stamp=float(i))

    # flip to localization mode in place (frozen map, cache on)
    slam.memory.incremental = False
    slam.max_odom_cache_size = 8
    slam.max_error = 3.0
    start = 8
    T0 = jnp.asarray(poses_gt[start])
    localized = 0
    rejected = 0
    for k, i in enumerate(range(start, start + 12, 2)):
        g, d = S.render(poses_gt[i], CAM)
        odom = np.asarray(T.relative(T0, jnp.asarray(poses_gt[i])))
        st = slam.process(extract(g, d), odom, np.eye(6) * 1e-4,
                          stamp=float(100 + i))
        localized += int(st.get("Loop/Localized/", 0))
        rejected += int(st.get("Loop/Rejected by optimization/", 0))
    assert localized >= 1, "never localized with odom cache active"

    # forge a teleport: register the localization machinery against a far
    # node by directly injecting a wrong loc link through process()'s path
    sig_id = slam.memory.stm[-1]
    far = max(slam.optimized_poses) if max(slam.optimized_poses) != sig_id \
        else min(slam.optimized_poses)
    wrong = Link(far, sig_id, LINK_GLOBAL_CLOSURE,
                 _pose(50.0), np.eye(6, dtype=np.float32) * 1e2)
    st = Statistics()
    cur = slam._localize_with_odom_cache(
        _FakeSig(sig_id), [wrong],
        slam._odom_cache_poses[sig_id], st)
    assert cur is None
