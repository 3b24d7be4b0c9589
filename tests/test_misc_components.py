"""GPS/geodetic, LaserScan, DBReader replay, database recovery."""
import jax.numpy as jnp
import numpy as np
import pytest

from rtabmap_tpu.core.laser_scan import LaserScan, ScanFormat, make_scan, scan_from_depth
from rtabmap_tpu.geometry import camera as C
from rtabmap_tpu.utils.gps import GPS, geodetic_to_enu, gps_prior_factors


def test_gps_enu_conversion():
    origin = GPS(latitude=45.5017, longitude=-73.5673, altitude=50.0)  # Montreal
    # ~111m north per 0.001 deg latitude
    north = GPS(latitude=45.5017 + 0.001, longitude=-73.5673, altitude=50.0)
    enu = geodetic_to_enu(north, origin)
    assert abs(enu[1] - 111.2) < 1.0, enu
    assert abs(enu[0]) < 1.0 and abs(enu[2]) < 0.5
    east = GPS(latitude=45.5017, longitude=-73.5673 + 0.001, altitude=50.0)
    enu_e = geodetic_to_enu(east, origin)
    assert abs(enu_e[0] - 111.2 * np.cos(np.radians(45.5))) < 1.0
    priors = gps_prior_factors([(1, origin), (2, north)])
    assert len(priors) == 2
    np.testing.assert_allclose(priors[0][1], 0.0, atol=1e-6)


def test_laser_scan_formats():
    pts = np.random.RandomState(0).rand(100, 3).astype(np.float32)
    scan = make_scan(pts, ScanFormat.XYZ, capacity=128)
    assert scan.data.shape == (128, 3)
    assert int(scan.valid.sum()) == 100
    assert not scan.is_2d and not scan.has_normals
    xyz = scan.xyz()
    assert xyz.shape == (128, 3)

    pts2d = np.random.RandomState(1).rand(50, 2).astype(np.float32)
    s2 = make_scan(pts2d, ScanFormat.XY)
    assert s2.is_2d
    assert s2.xyz().shape == (50, 3)

    ptsn = np.concatenate([pts, np.tile([0, 0, 1.0], (100, 1))], axis=1).astype(np.float32)
    s3 = make_scan(ptsn, ScanFormat.XYZN)
    assert s3.has_normals
    np.testing.assert_allclose(np.asarray(s3.normals())[0], [0, 0, 1])


def test_scan_from_depth():
    from rtabmap_tpu.datasets import synthetic as S

    cam = C.CameraModel.make(300.0, 300.0, 160.0, 120.0, 320, 240)
    pose = S.loop_trajectory(64)[0]
    _, depth = S.render(pose, cam)
    scan = scan_from_depth(depth, cam, decimation=8, capacity=1024)
    assert scan.data.shape == (1024, 3)
    assert int(scan.valid.sum()) > 500


def test_db_reader_and_recovery(tmp_path):
    from rtabmap_tpu.memory.db import Database
    from rtabmap_tpu.memory.db_reader import DBReader, database_recovery
    from rtabmap_tpu.memory.memory import Link, Signature

    path = str(tmp_path / "m.db")
    db = Database(path, async_writes=False)
    rng = np.random.RandomState(0)
    for i in range(1, 6):
        sig = Signature(
            id=i, map_id=0, stamp=float(i), pose=np.eye(3, 4, dtype=np.float32),
            word_ids=rng.randint(0, 100, 32).astype(np.int32),
            desc=np.where(rng.rand(32, 256) > 0.5, 1, -1).astype(np.int8),
            uv=rng.rand(32, 2).astype(np.float32),
            pts3d=rng.rand(32, 3).astype(np.float32),
            valid3d=np.ones(32, bool),
        )
        if i > 1:
            t = np.eye(3, 4, dtype=np.float32)
            t[0, 3] = 0.1
            sig.links[i - 1] = Link(i, i - 1, 0, t, np.eye(6, dtype=np.float32))
        db.save_signature(sig)
    db.close()  # note: no Admin record written — "unclosed" database

    # replay
    db2 = Database(path, async_writes=False)
    frames = list(DBReader(db2))
    assert len(frames) == 5
    fr, pose, cov, stamp = frames[0]
    assert fr.desc.shape == (32, 256)
    db2.close()

    # recovery produces a store with optimized poses
    out_path = str(tmp_path / "recovered.db")
    res = database_recovery(path, out_path)
    assert res["nodes"] == 5 and res["optimized"] == 5
    db3 = Database(out_path, async_writes=False)
    admin = db3.load_admin()
    assert len(admin["optimized_poses"]) == 5
    db3.close()


def test_write_log_files(tmp_path):
    import jax
    from rtabmap_tpu.core.frame import extract_features
    from rtabmap_tpu.datasets import synthetic as S
    from rtabmap_tpu.engine.rtabmap import Rtabmap
    from rtabmap_tpu.geometry import camera as C
    from rtabmap_tpu.utils.params import Parameters

    cam = C.CameraModel.make(160.0, 160.0, 79.5, 59.5, 160, 120)
    poses = S.loop_trajectory(64)[:3]
    grays, depths = S.render_sequence(poses, cam)
    ext = jax.jit(lambda g, d: extract_features(g, d, cam, 256))
    slam = Rtabmap(cam, Parameters({"Rtabmap/DetectionRate": 0}),
                   node_capacity=32, words_per_frame=256)
    for i in range(3):
        slam.process(ext(grays[i], depths[i]), np.asarray(poses[i]),
                     np.eye(6) * 1e-4, stamp=float(i))
    path = slam.write_log_files(str(tmp_path))
    lines = open(path).read().strip().splitlines()
    assert len(lines) == 4  # header + 3 ticks
    assert "Timing/Total/ms" in lines[0]
    # integer counters split into LogI (reference LogF/LogI split)
    import os
    ilines = open(os.path.join(str(tmp_path), "LogI.csv")).read().splitlines()
    assert len(ilines) == 4
    assert "Memory/Working memory size/" in ilines[0]
    assert "Timing/Total/ms" not in ilines[0]


def test_statistics_reference_registry_and_engine_keys():
    """Engine-emitted statistics use the reference's declared names
    (Statistics.h RTABMAP_STATS catalog) wherever an equivalent exists."""
    from rtabmap_tpu.utils.logging import Statistics

    reg = Statistics.reference_registry()
    assert len(reg) >= 160
    assert "Timing/Total/ms" in reg
    assert "Memory/Working memory size/" in reg
    assert "Loop/Highest hypothesis value/" in reg
    assert "Memory/Distance travelled/m" in reg


def test_engine_gps_fixes_become_graph_priors():
    """GPS fixes attached via process() surface as xyz prior factors in the
    optimizer's graph when Optimizer/PriorsIgnored=false (reference:
    OptimizerG2O GPS prior edges)."""
    import jax
    from rtabmap_tpu.core.frame import extract_features
    from rtabmap_tpu.datasets import synthetic as S
    from rtabmap_tpu.engine.rtabmap import Rtabmap
    from rtabmap_tpu.utils.params import Parameters

    cam = C.CameraModel.make(160.0, 160.0, 79.5, 59.5, 160, 120)
    p = Parameters().set("Optimizer/PriorsIgnored", "false")
    slam = Rtabmap(cam, p, node_capacity=32, words_per_frame=256)
    extract = jax.jit(lambda g, d: extract_features(g, d, cam, 256))
    poses = S.loop_trajectory(24)[:3]
    for i in range(3):
        g, d = S.render(poses[i], cam)
        frame = extract(g, d)
        slam.process(frame, np.asarray(poses[i]), stamp=float(i + 1),
                     gps=[float(i), -73.5673, 45.5017 + 1e-5 * i, 50.0, 2.0, 0.0])
    ids, _, _, _, _, _, _, priors = slam._build_graph()
    pr_idx, pr_meas, pr_info = priors
    assert len(pr_idx) == 3
    # xyz information only, rotation block zero
    assert np.all(pr_info[0][:3, :3] > 0) or pr_info[0][0, 0] > 0
    np.testing.assert_allclose(pr_info[0][3:, 3:], 0.0)
    # second fix ~1.1m north of the first in ENU
    assert 0.8 < pr_meas[1][1, 3] < 1.4, pr_meas[1][:, 3]
    slam.close()
