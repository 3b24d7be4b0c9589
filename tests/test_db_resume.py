"""Map store persistence: checkpoint/resume + multi-session linking."""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rtabmap_tpu.geometry import camera as C
from rtabmap_tpu.datasets import synthetic as S
from rtabmap_tpu.core.frame import extract_features
from rtabmap_tpu.engine.rtabmap import Rtabmap
from rtabmap_tpu.memory.db import Database
from rtabmap_tpu.utils.params import Parameters

CAM = C.CameraModel.make(300.0, 300.0, 160.0, 120.0, 320, 240)


def test_db_signature_roundtrip(tmp_path):
    from rtabmap_tpu.memory.memory import Link, Signature

    path = str(tmp_path / "m.db")
    db = Database(path)
    sig = Signature(
        id=3, map_id=1, stamp=2.5, pose=np.eye(3, 4, dtype=np.float32), weight=7,
        word_ids=np.array([1, 2, -1], np.int32),
        desc=np.ones((3, 256), np.int8),
        uv=np.zeros((3, 2), np.float32),
        pts3d=np.ones((3, 3), np.float32),
        valid3d=np.array([True, False, True]),
        label="kitchen",
    )
    sig.links[4] = Link(3, 4, 0, np.eye(3, 4, dtype=np.float32), np.eye(6, dtype=np.float32))
    db.save_signature(sig)
    db.save_statistics(3, 2.5, {"Timing/Total/ms": 12.0})
    db.flush()
    db.close()

    db2 = Database(path)
    got = db2.load_signature(3)
    assert got.weight == 7 and got.map_id == 1 and got.label == "kitchen"
    np.testing.assert_array_equal(got.word_ids, sig.word_ids)
    assert 4 in got.links and got.links[4].type == 0
    stats = db2.load_statistics()
    assert stats[0]["Timing/Total/ms"] == 12.0
    db2.close()


@pytest.mark.slow
def test_checkpoint_resume_multisession(tmp_path):
    """Map a half-loop, close, reopen, map the overlapping half: the new
    session must link to the old one via loop closure (reference
    multi-session semantics, SURVEY.md §5.4)."""
    path = str(tmp_path / "map.db")
    poses_gt = S.loop_trajectory(48)
    extract = jax.jit(lambda g, d: extract_features(g, d, CAM, 384))

    db = Database(path)
    slam = Rtabmap(CAM, Parameters(), db=db, node_capacity=128, words_per_frame=384)
    for i in range(20):
        g, d = S.render(poses_gt[i], CAM)
        slam.process(extract(g, d), np.asarray(poses_gt[i]), np.eye(6) * 1e-4,
                     stamp=float(i))
    n_words_1 = slam.memory.vocab.n_words
    slam.close()
    db.close()

    db2 = Database(path)
    slam2 = Rtabmap.load(db2, CAM, Parameters(), node_capacity=128, words_per_frame=384)
    assert slam2.memory.vocab.n_words == n_words_1
    assert len(slam2.memory.wm) == 20
    assert slam2.memory.map_id == 1  # new session

    # second session revisits frames 10..19 (same viewpoints)
    session_links = 0
    for i in range(10, 20):
        g, d = S.render(poses_gt[i], CAM)
        st = slam2.process(extract(g, d), np.asarray(poses_gt[i]), np.eye(6) * 1e-4,
                           stamp=float(100 + i))
        if st.loop_closure_id or st.get("Proximity/Space links added/", 0):
            session_links += 1
    assert session_links >= 1, "sessions never linked"
    # inter-session link exists: a new-session node linked to an old-session node
    found = False
    for sid, s in slam2.memory.signatures.items():
        if s.map_id == 1:
            for j in s.links:
                o = slam2.memory.get(j)
                if o is not None and o.map_id == 0:
                    found = True
    assert found
    slam2.close()
    db2.close()


def test_user_data_roundtrip(tmp_path):
    from rtabmap_tpu.memory.memory import Signature

    path = str(tmp_path / "ud.db")
    db = Database(path, async_writes=False)
    sig = Signature(id=1, map_id=0, stamp=0.0,
                    pose=np.eye(3, 4, dtype=np.float32))
    sig.user_data = b"wifi:-67dBm@00:11:22"
    db.save_signature(sig)
    db.flush()
    db.close()
    db2 = Database(path, async_writes=False)
    got = db2.load_signature(1)
    assert got.user_data == b"wifi:-67dBm@00:11:22"
    db2.close()


def test_env_sensors_and_global_desc_roundtrip(tmp_path):
    from rtabmap_tpu.core.frame import (ENV_SENSOR_AMBIENT_TEMPERATURE,
                                        ENV_SENSOR_WIFI_SIGNAL_STRENGTH,
                                        EnvSensor)
    from rtabmap_tpu.memory.memory import Signature

    path = str(tmp_path / "env.db")
    db = Database(path, async_writes=False)
    sig = Signature(id=2, map_id=0, stamp=1.0,
                    pose=np.eye(3, 4, dtype=np.float32))
    sig.env_sensors = [
        EnvSensor(ENV_SENSOR_WIFI_SIGNAL_STRENGTH, -61.0, 1.0),
        EnvSensor(ENV_SENSOR_AMBIENT_TEMPERATURE, 22.5, 1.0),
    ]
    sig.global_desc = np.arange(128, dtype=np.float32)
    db.save_signature(sig)
    db.flush()
    db.close()
    db2 = Database(path, async_writes=False)
    got = db2.load_signature(2)
    assert len(got.env_sensors) == 2
    assert got.env_sensors[0].type == ENV_SENSOR_WIFI_SIGNAL_STRENGTH
    assert got.env_sensors[0].value == -61.0
    assert got.env_sensors[1].value == 22.5
    np.testing.assert_array_equal(got.global_desc, sig.global_desc)
    db2.close()


def test_admin_map_products_roundtrip(tmp_path):
    path = str(tmp_path / "prod.db")
    db = Database(path, async_writes=False)
    grid = np.random.RandomState(0).randint(-1, 101, (40, 50)).astype(np.int8)
    pts = np.random.RandomState(1).rand(100, 3).astype(np.float32)
    colors = (np.random.RandomState(2).rand(100, 3) * 255).astype(np.uint8)
    verts = pts[:30]
    faces = np.arange(30, dtype=np.int32).reshape(10, 3)
    db.save_admin(
        params={"Grid/CellSize": "0.05"},
        map2d=(grid, np.array([-1.0, -2.0], np.float32), 0.05),
        opt_cloud=(pts, colors),
        opt_mesh=(verts, faces),
    )
    db.close()
    db2 = Database(path, async_writes=False)
    adm = db2.load_admin()
    np.testing.assert_array_equal(adm["map2d"]["grid"], grid)
    np.testing.assert_allclose(adm["map2d"]["origin"], [-1.0, -2.0])
    assert float(adm["map2d"]["cell"]) == pytest.approx(0.05)
    np.testing.assert_array_equal(adm["opt_cloud"]["points"], pts)
    np.testing.assert_array_equal(adm["opt_cloud"]["colors"], colors)
    np.testing.assert_array_equal(adm["opt_mesh"]["faces"], faces)
    # partial re-save keeps prior products
    db2.save_admin(opt_cloud=(pts[:10],))
    adm2 = db2.load_admin()
    np.testing.assert_array_equal(adm2["map2d"]["grid"], grid)
    assert adm2["opt_cloud"]["points"].shape == (10, 3)
    db2.close()


def test_node_gt_velocity_gps_roundtrip(tmp_path):
    from rtabmap_tpu.memory.memory import Signature

    path = str(tmp_path / "gt.db")
    db = Database(path, async_writes=False)
    sig = Signature(id=5, map_id=0, stamp=3.0,
                    pose=np.eye(3, 4, dtype=np.float32))
    gt = np.eye(3, 4, dtype=np.float32)
    gt[0, 3] = 1.25
    sig.gt_pose = gt
    sig.velocity = np.array([0.1, 0, 0, 0, 0, 0.02], np.float32)
    sig.gps = np.array([3.0, -71.123456, 42.3654321, 12.0, 2.0, 0.0], np.float64)
    db.save_signature(sig)
    db.flush()
    db.close()
    db2 = Database(path, async_writes=False)
    got = db2.load_signature(5)
    np.testing.assert_allclose(got.gt_pose, gt)
    np.testing.assert_allclose(got.velocity, sig.velocity)
    np.testing.assert_allclose(got.gps, sig.gps)
    db2.close()


def test_engine_persists_statistics_rows(tmp_path):
    """Every engine tick writes its Statistics map to the DB (reference:
    DBDriver::addStatistics from Rtabmap::process), so the Report tool's
    timing/loc aggregates work on engine-produced stores."""
    path = str(tmp_path / "stats.db")
    poses = S.loop_trajectory(8)
    extract = jax.jit(lambda g, d: extract_features(g, d, CAM, 256))
    db = Database(path)
    slam = Rtabmap(CAM, Parameters(), db=db, node_capacity=32,
                   words_per_frame=256)
    for i in range(4):
        g, d = S.render(poses[i], CAM)
        slam.process(extract(g, d), np.asarray(poses[i]), stamp=float(i + 1),
                     extra_stats={"Odometry/TotalTime/ms": 7.5})
    slam.close()
    db.flush()
    db.close()

    db2 = Database(path, async_writes=False)
    rows = db2.load_statistics()
    db2.close()
    assert len(rows) == 4
    assert all("Timing/Total/ms" in r for r in rows)
    assert rows[0]["Odometry/TotalTime/ms"] == 7.5
    assert rows[-1]["Memory/Short time memory size/"] >= 1
