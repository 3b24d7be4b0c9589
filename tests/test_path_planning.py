"""Topological path planning + goal tracking (reference:
Rtabmap::computePath Rtabmap.h:233-243, updateGoalIndex Rtabmap.cpp:7289,
virtual kVirtualClosure chain links, goal-reached / stuck handling)."""
import jax
import numpy as np
import pytest

from rtabmap_tpu.core.frame import extract_features
from rtabmap_tpu.datasets import synthetic as S
from rtabmap_tpu.engine.rtabmap import Rtabmap
from rtabmap_tpu.geometry import camera as C
from rtabmap_tpu.memory.memory import LINK_VIRTUAL_CLOSURE
from rtabmap_tpu.utils.params import Parameters

CAM = C.CameraModel.make(300.0, 300.0, 160.0, 120.0, 320, 240)


def _mapped_engine(n=16):
    poses = S.loop_trajectory(48)
    extract = jax.jit(lambda g, d: extract_features(g, d, CAM, 384))
    slam = Rtabmap(CAM, Parameters({"RGBD/GoalReachedRadius": 0.4}),
                   node_capacity=128, words_per_frame=384)
    used = []
    for i in range(n):
        g, d = S.render(poses[i], CAM)
        st = slam.process(extract(g, d), np.asarray(poses[i]),
                          np.eye(6) * 1e-4, stamp=float(i))
        if st.ref_id:
            used.append(i)
    return slam, poses, extract, used


@pytest.mark.slow
def test_goal_tracking_end_to_end():
    slam, poses, extract, used = _mapped_engine(16)
    ids = sorted(slam.optimized_poses)
    goal_id = ids[0]

    assert slam.set_goal(goal_id)
    path = slam.get_path()
    assert path[0] == ids[-1] and path[-1] == goal_id
    assert slam.get_path_current_goal() in path
    assert slam.get_path_next_poses(), "follower needs poses to drive to"

    # break the chain between two mid-path nodes: the tracker must repair
    # connectivity with a virtual closure (reference Rtabmap.cpp:7358-7366)
    mid_a, mid_b = path[len(path) // 2], path[len(path) // 2 + 1]
    slam.memory.remove_link(mid_a, mid_b)
    slam.update_goal_index()
    sa = slam.memory.get(mid_a)
    restored = [lk for lk in sa.links.values()
                if lk.type == LINK_VIRTUAL_CLOSURE]
    assert restored, "virtual link not inserted to keep the path connected"

    # drive back along the recorded trajectory; tracking should advance the
    # current index monotonically and finally report goal reached
    start_remaining = len(slam.get_path())
    reached = False
    for k, i in enumerate(reversed(used[:-1])):
        g, d = S.render(poses[i], CAM)
        slam.process(extract(g, d), np.asarray(poses[i]),
                     np.eye(6) * 1e-4, stamp=float(100 + k))
        if slam.path_status == 1:
            reached = True
            break
    assert reached, (slam.path_status, slam.get_path())
    assert not slam.get_path()
    # virtual links cleaned up when the plan completes
    for sid in path:
        s = slam.memory.get(sid)
        if s is not None:
            assert not any(lk.type == LINK_VIRTUAL_CLOSURE
                           for lk in s.links.values())
    assert len(slam.get_path()) < start_remaining + 1


@pytest.mark.slow
def test_goal_pose_snaps_to_nearest_node_and_rejects_far():
    slam, poses, _, _ = _mapped_engine(10)
    ids = sorted(slam.optimized_poses)
    target = np.asarray(slam.optimized_poses[ids[1]], np.float32).copy()
    target[:3, 3] += np.asarray([0.05, 0.0, 0.0], np.float32)
    assert slam.set_goal_pose(target, tolerance=1.0)
    assert slam.get_path()[-1] == ids[1]
    # residual in-node offset retained
    assert np.linalg.norm(slam._path_transform_to_goal[:3, 3]) > 1e-4

    far = target.copy()
    far[:3, 3] += 100.0
    slam.clear_path(0)
    assert not slam.set_goal_pose(far, tolerance=1.0)
    assert slam.path_status == -1


def test_frustum_poses_filtering():
    """reference: graph::frustumPosesFiltering (X fwd, Y up, Z right)."""
    import numpy as np
    from rtabmap_tpu.utils.graph import frustum_poses_filtering

    def pose_at(x, y, z):
        p = np.eye(3, 4, dtype=np.float32)
        p[:, 3] = (x, y, z)
        return p

    poses = {
        1: pose_at(5, 0, 0),     # straight ahead
        2: pose_at(-5, 0, 0),    # behind
        3: pose_at(5, 0, 10),    # far off to the side (>45deg fov)
        4: pose_at(5, 0, 1),     # slightly right, inside
        5: pose_at(200, 0, 0),   # beyond far plane
        6: pose_at(0.05, 0, 0),  # inside near plane
    }
    cam = np.eye(3, 4, dtype=np.float32)
    keep = frustum_poses_filtering(poses, cam, 45.0, 45.0, 0.1, 100.0)
    assert keep == [1, 4]
    drop = frustum_poses_filtering(poses, cam, 45.0, 45.0, 0.1, 100.0,
                                   negative=True)
    assert drop == [2, 3, 5, 6]


def test_radius_poses_clustering():
    """reference: graph::radiusPosesClustering."""
    import numpy as np
    from rtabmap_tpu.utils.graph import radius_poses_clustering

    def pose_at(x, yaw=0.0):
        c, s = np.cos(yaw), np.sin(yaw)
        p = np.asarray([[c, -s, 0, x], [s, c, 0, 0], [0, 0, 1, 0]],
                       np.float32)
        return p

    poses = {1: pose_at(0.0), 2: pose_at(0.5), 3: pose_at(10.0)}
    pairs = radius_poses_clustering(poses, radius=1.0)
    assert set(pairs) == {(1, 2), (2, 1)}
    # orientation gate: rotate node 2 by 90deg, allow only 30deg
    poses[2] = pose_at(0.5, yaw=np.pi / 2)
    pairs = radius_poses_clustering(poses, radius=1.0, angle=np.pi / 6)
    assert pairs == []
