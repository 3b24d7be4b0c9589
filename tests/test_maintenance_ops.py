"""Engine maintenance ops: detectMoreLoopClosures, refineLinks, global BA,
user links, labels, path planning."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rtabmap_tpu.geometry import camera as C
from rtabmap_tpu.datasets import synthetic as S
from rtabmap_tpu.core.frame import extract_features
from rtabmap_tpu.engine.rtabmap import Rtabmap
from rtabmap_tpu.utils import graph as G
from rtabmap_tpu.utils.params import Parameters

CAM = C.CameraModel.make(300.0, 300.0, 160.0, 120.0, 320, 240)


def build_map(n=16):
    poses = S.loop_trajectory(64)[:n]
    extract = jax.jit(lambda g, d: extract_features(g, d, CAM, 384))
    slam = Rtabmap(CAM, Parameters(), node_capacity=64, words_per_frame=384)
    for i in range(n):
        g, d = S.render(poses[i], CAM)
        slam.process(extract(g, d), np.asarray(poses[i]), np.eye(6) * 1e-4,
                     stamp=float(i))
    return slam, poses


@pytest.mark.slow
def test_maintenance_ops():
    slam, poses = build_map(14)

    # --- detect more loop closures between spatial neighbors
    added = slam.detect_more_loop_closures(cluster_radius=0.6)
    assert added >= 1

    # --- user link + labels
    assert slam.add_user_link(1, 5)
    assert slam.set_label(3, "kitchen")
    assert slam.memory.get(3).label == "kitchen"

    # --- path planning over topology
    path = slam.compute_path(1)
    assert path and path[0] == 14 and path[-1] == 1
    # user link 1-5 should shortcut the path
    assert len(path) < 14

    # --- refine links keeps the graph consistent
    refined = slam.refine_links()
    assert refined >= 5

    # --- global BA runs and keeps poses finite & close
    before = {i: p.copy() for i, p in slam.optimized_poses.items()}
    ok = slam.global_bundle_adjustment(iters=8)
    assert ok
    for i, p in slam.optimized_poses.items():
        assert np.isfinite(p).all()
        assert np.linalg.norm(p[:3, 3] - before[i][:3, 3]) < 0.5


def test_graph_utils():
    # chain 1-2-3-4-5 with shortcut 1-5
    import types

    class FakeSig:
        def __init__(self):
            self.links = {}

    class FakeLink:
        def __init__(self, f, t, d):
            self.from_id, self.to_id = f, t
            self.transform = np.eye(3, 4) * 1.0
            self.transform[:3, 3] = [d, 0, 0]

    sigs = {i: FakeSig() for i in range(1, 6)}
    for i in range(1, 5):
        sigs[i].links[i + 1] = FakeLink(i, i + 1, 1.0)
        sigs[i + 1].links[i] = FakeLink(i + 1, i, 1.0)
    sigs[1].links[5] = FakeLink(1, 5, 1.5)
    sigs[5].links[1] = FakeLink(5, 1, 1.5)
    adj = G.links_to_adjacency(sigs)
    poses = {i: np.eye(3, 4, dtype=np.float32) for i in range(1, 6)}
    path = G.compute_path(poses, adj, 1, 5)
    assert path == [1, 5]  # shortcut wins (1.5 < 4.0)
    path2 = G.compute_path(poses, adj, 2, 4)
    assert path2 == [2, 3, 4]
    assert G.compute_path(poses, adj, 1, 99) == []

    near = G.find_nearest_nodes(np.eye(3, 4), poses, radius=1.0)
    assert len(near) == 5
    kept = G.radius_poses_filtering(poses, radius=0.5)
    assert len(kept) == 1


@pytest.mark.slow
def test_repair_graph_and_reject_last():
    from rtabmap_tpu.memory.memory import LINK_USER_CLOSURE, Link

    slam, poses = build_map(10)
    n_links_before = sum(len(s.links) for s in slam.memory.signatures.values())
    # inject a WRONG closure: claims node 2 and node 8 coincide (they don't)
    bad = Link(2, 8, LINK_USER_CLOSURE, np.eye(3, 4, dtype=np.float32),
               np.eye(6, dtype=np.float32) * 100.0)
    slam.memory.add_link(bad)
    removed = slam.repair_graph()
    assert len(removed) >= 1
    assert 8 not in slam.memory.get(2).links

    # reject_last_loop_closure removes the newest closure link
    assert slam.add_user_link(3, 7)
    assert 7 in slam.memory.get(3).links
    assert slam.reject_last_loop_closure()
    assert 7 not in slam.memory.get(3).links
