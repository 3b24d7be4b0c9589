"""Rtabmap.h accessor/maintenance API surface (reference:
Rtabmap.h:127-185 — WM/STM introspection, setUserData, deleteLastLocation,
resetMemory, setOptimizedPoses, exportPoses, generateDOTGraph,
dumpPrediction)."""
import os

import jax
import numpy as np
import pytest

from rtabmap_tpu.core.frame import extract_features
from rtabmap_tpu.datasets import synthetic as S
from rtabmap_tpu.engine.rtabmap import Rtabmap
from rtabmap_tpu.geometry import camera as C
from rtabmap_tpu.utils.params import Parameters


@pytest.fixture(scope="module")
def engine():
    cam = C.CameraModel.make(300.0, 300.0, 160.0, 120.0, 320, 240)
    p = Parameters().set("Rtabmap/DetectionRate", 0)
    slam = Rtabmap(cam, p, node_capacity=128, words_per_frame=192)
    extract = jax.jit(lambda g, d: extract_features(g, d, cam, 192))
    poses = S.loop_trajectory(48)[:8]
    from rtabmap_tpu.geometry import transform as T
    import jax.numpy as jnp

    for i in range(8):
        g, d = S.render(poses[i], cam)
        rel = np.asarray(T.relative(jnp.asarray(poses[0]), jnp.asarray(poses[i])))
        slam.process(extract(g, d), rel, np.eye(6) * 1e-4, stamp=i * 0.1)
    return slam


def test_accessors(engine):
    assert engine.get_total_mem_size() >= 8 - 2  # rehearsal may merge
    assert engine.get_stm_size() == len(engine.get_stm())
    assert engine.get_wm_size() == len(engine.get_wm())
    last = engine.get_last_location_id()
    assert last > 0 and engine.is_in_stm(last)
    w = engine.get_weights()
    assert last in w and all(v >= 0 for v in w.values())
    assert engine.get_pose(last) is not None
    assert engine.get_map_correction().shape == (3, 4)
    hyp_id, hyp_val = engine.get_highest_hypothesis()
    assert hyp_val >= 0.0


def test_set_user_data_and_optimized_poses(engine):
    last = engine.get_last_location_id()
    assert engine.set_user_data(last, b"hello")
    assert engine.memory.get(last).user_data == b"hello"
    assert not engine.set_user_data(99999, b"x")
    p = np.eye(3, 4, dtype=np.float32)
    p[0, 3] = 7.0
    engine.set_optimized_poses({last: p})
    assert abs(engine.get_pose(last)[0, 3] - 7.0) < 1e-6


def test_export_and_dot_and_prediction(engine, tmp_path):
    n = engine.export_poses(str(tmp_path / "poses.txt"), fmt=1)
    assert n > 0 and os.path.getsize(str(tmp_path / "poses.txt")) > 0
    ne = engine.generate_dot_graph(str(tmp_path / "graph.dot"))
    txt = open(str(tmp_path / "graph.dot")).read()
    assert ne > 0 and txt.startswith("graph map") and "--" in txt
    engine.dump_prediction(str(tmp_path / "pred.txt"))
    P = np.loadtxt(str(tmp_path / "pred.txt"))
    cap = engine.memory.node_capacity
    assert P.shape == (cap + 1, cap + 1)
    # columns of resident slots are stochastic
    for i in engine.memory.wm:
        s = engine.memory.get(i)
        if s.slot >= 0:
            assert abs(P[:, s.slot].sum() - 1.0) < 1e-6


def test_signature_copy_and_3d_map(engine):
    last = engine.get_last_location_id()
    s = engine.get_signature_copy(last, with_words=True)
    assert s is not None and s.word_ids is not None
    s2 = engine.get_signature_copy(last, with_words=False)
    assert s2.word_ids is None and s2.desc is None
    # mutating the copy's links must not touch the live node
    s.links[424242] = None
    assert 424242 not in engine.memory.get(last).links
    sigs, poses, links = engine.get_3d_map()
    assert last in poses and sigs[last] is not None
    assert len(links) >= len(poses) - 2


def test_delete_last_and_reset(engine):
    before = engine.get_total_mem_size()
    last = engine.get_last_location_id()
    assert engine.delete_last_location()
    assert engine.get_total_mem_size() == before - 1
    assert engine.memory.get(last) is None
    engine.reset_memory()
    assert engine.get_total_mem_size() == 0
    assert engine.get_wm_size() == 0 and engine.get_stm_size() == 0
    assert float(np.asarray(engine.bayes.posterior)[-1]) == 1.0


def test_delete_last_location_persists(tmp_path):
    """deleteLastLocation must also purge the store rows (node would
    otherwise resurrect on resume)."""
    import jax.numpy as jnp
    from rtabmap_tpu.geometry import transform as T
    from rtabmap_tpu.memory.db import Database

    cam = C.CameraModel.make(300.0, 300.0, 160.0, 120.0, 320, 240)
    p = Parameters().set("Rtabmap/DetectionRate", 0)
    db = Database(str(tmp_path / "d.db"))
    slam = Rtabmap(cam, p, db=db, node_capacity=64, words_per_frame=128)
    extract = jax.jit(lambda g, d: extract_features(g, d, cam, 128))
    poses = S.loop_trajectory(48)[:4]
    for i in range(4):
        g, d = S.render(poses[i], cam)
        rel = np.asarray(T.relative(jnp.asarray(poses[0]),
                                    jnp.asarray(poses[i])))
        slam.process(extract(g, d), rel, np.eye(6) * 1e-4, stamp=i * 0.1)
    last = slam.get_last_location_id()
    slam.close()  # persist all 4
    assert slam.delete_last_location()
    db.flush()
    db.close()
    db2 = Database(str(tmp_path / "d.db"), async_writes=False)
    assert last not in db2.all_node_ids()
    assert not any(last in (l.from_id, l.to_id) for l in db2.all_links())
    db2.close()

