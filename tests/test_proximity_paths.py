"""Proximity detection registers one closure PER PATH up to
RGBD/ProximityMaxPaths (reference: Rtabmap.cpp:2790-2920 — candidates are
segmented into neighbor-chain paths, sorted by likelihood/distance, and
each of the top paths gets its own registration)."""
import jax
import jax.numpy as jnp
import numpy as np

from rtabmap_tpu.core.frame import extract_features
from rtabmap_tpu.datasets import synthetic as S
from rtabmap_tpu.engine.rtabmap import Rtabmap, info_from_cov
from rtabmap_tpu.geometry import camera as C
from rtabmap_tpu.memory.memory import LINK_LOCAL_SPACE_CLOSURE, LINK_NEIGHBOR, Link
from rtabmap_tpu.utils.params import Parameters

CAM = C.CameraModel.make(300.0, 300.0, 160.0, 120.0, 320, 240)


def _dense_revisit_engine(max_paths):
    p = Parameters()
    p.set("RGBD/ProximityMaxPaths", max_paths)
    slam = Rtabmap(CAM, p, node_capacity=64, words_per_frame=256)
    mem = slam.memory
    pose = S.loop_trajectory(8)[0]
    g, d = S.render(pose, CAM)
    fr = extract_features(g, d, CAM, 256)

    t = np.eye(3, 4, dtype=np.float32)
    t[0, 3] = 0.05
    inf = np.eye(6, dtype=np.float32)
    # two OLD paths (separate neighbor chains) crossing the same place
    chains = []
    for c in range(2):
        ids = []
        for k in range(3):
            s = mem.create_signature(fr, np.asarray(pose), float(k))
            mem.wm.append(s.id)
            slam.optimized_poses[s.id] = np.asarray(pose)
            ids.append(s.id)
        for a, b in zip(ids, ids[1:]):
            mem.add_link(Link(a, b, LINK_NEIGHBOR, t, inf))
        chains.append(ids)
    # current node: same place, NOT linked to either chain
    cur = mem.create_signature(fr, np.asarray(pose), 9.0)
    mem.stm.append(cur.id)
    slam.optimized_poses[cur.id] = np.asarray(pose)
    return slam, cur, chains


def test_two_paths_two_links_one_tick():
    slam, cur, chains = _dense_revisit_engine(max_paths=3)
    links = slam._proximity_detection(cur)
    assert len(links) >= 2, [lk.from_id for lk in links]
    anchors = {lk.from_id for lk in links}
    # one link per path: anchors land in DIFFERENT chains
    in_a = anchors & set(chains[0])
    in_b = anchors & set(chains[1])
    assert in_a and in_b, (anchors, chains)
    assert all(lk.type == LINK_LOCAL_SPACE_CLOSURE for lk in links)


def test_max_paths_caps_links():
    slam, cur, chains = _dense_revisit_engine(max_paths=1)
    links = slam._proximity_detection(cur)
    assert len(links) == 1
