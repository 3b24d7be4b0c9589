"""Read-only reference-schema DB importer: a database written in the
reference's documented on-disk format (DatabaseSchema.sql.in:16-130 +
Compression.cpp compressData2 blobs + CameraModel::deserialize) loads
into this framework's Signature/Link types, and replays as frames."""
import io
import sqlite3
import struct
import zlib

import numpy as np

from rtabmap_tpu.memory.ref_db import RefDatabase, uncompress_mat


def _compress_mat(arr: np.ndarray, cvtype: int) -> bytes:
    """reference compressData2: zlib stream + trailing rows/cols/type."""
    data = zlib.compress(np.ascontiguousarray(arr).tobytes())
    rows = arr.shape[0] if arr.ndim > 1 else 1
    cols = arr.shape[1] if arr.ndim > 1 else arr.shape[0]
    return data + struct.pack("<iii", rows, cols, cvtype)


def _pose_blob(p: np.ndarray) -> bytes:
    return np.asarray(p, np.float32).tobytes()


def _calib_blob(fx, fy, cx, cy, w, h) -> bytes:
    """CameraModel::serialize v0.18 layout (11-int header + K + L)."""
    K = np.array([[fx, 0, cx], [0, fy, cy], [0, 0, 1]], np.float64)
    L = np.eye(3, 4, dtype=np.float32)
    header = struct.pack("<11i", 0, 21, 0, 0, w, h, 9, 0, 0, 0, 12)
    return header + K.tobytes() + L.tobytes()


def _make_ref_db(path: str):
    con = sqlite3.connect(path)
    con.executescript("""
    CREATE TABLE Node (id INTEGER PRIMARY KEY, map_id INTEGER, weight
      INTEGER, stamp FLOAT, pose BLOB, ground_truth_pose BLOB, velocity
      BLOB, label TEXT, gps BLOB, env_sensors BLOB, time_enter DATE);
    CREATE TABLE Data (id INTEGER PRIMARY KEY, image BLOB, depth BLOB,
      calibration BLOB, scan BLOB, scan_info BLOB, user_data BLOB,
      time_enter DATE);
    CREATE TABLE Link (from_id INTEGER, to_id INTEGER, type INTEGER,
      information_matrix BLOB, transform BLOB, user_data BLOB);
    CREATE TABLE Word (id INTEGER PRIMARY KEY, descriptor_size INTEGER,
      descriptor BLOB, time_enter DATE);
    CREATE TABLE Feature (node_id INTEGER, word_id INTEGER, pos_x FLOAT,
      pos_y FLOAT, size INTEGER, dir FLOAT, response FLOAT, octave
      INTEGER, depth_x FLOAT, depth_y FLOAT, depth_z FLOAT,
      descriptor_size INTEGER, descriptor BLOB);
    CREATE TABLE Info (STM_size INTEGER, last_sign_added INTEGER,
      parameters TEXT, time_enter DATE);
    CREATE TABLE Statistics (id INTEGER, stamp FLOAT, data BLOB,
      wm_state BLOB);
    CREATE TABLE Admin (version TEXT, opt_cloud BLOB, opt_ids BLOB,
      opt_poses BLOB, time_enter DATE);
    """)
    rng = np.random.RandomState(3)
    poses = []
    for nid in (1, 2, 3):
        pose = np.eye(3, 4, dtype=np.float32)
        pose[0, 3] = 0.5 * (nid - 1)
        poses.append(pose)
        vel = np.arange(6, dtype=np.float32) * 0.1
        gps = np.array([1.0, -71.2, 46.8, 10.0, 2.0, 0.0], np.float64)
        con.execute(
            "INSERT INTO Node (id, map_id, weight, stamp, pose,"
            " ground_truth_pose, velocity, label, gps) VALUES (?,?,?,?,?,?,?,?,?)",
            (nid, 0, nid, 100.0 + nid, _pose_blob(pose), _pose_blob(pose),
             vel.tobytes(), f"n{nid}", gps.tobytes()))
        # per-node features: 8 binary 32-byte descriptors
        for k in range(8):
            desc = rng.randint(0, 256, 32).astype(np.uint8)
            con.execute(
                "INSERT INTO Feature VALUES (?,?,?,?,?,?,?,?,?,?,?,?,?)",
                (nid, 100 + k, 10.0 * k, 5.0 * k, 3, 0.0, 0.5, 0,
                 0.1 * k, 0.2 * k, 1.0 + k, 32, desc.tobytes()))
        # image: 8-bit PNG; depth: 16-bit PNG in millimetres
        from PIL import Image

        img = Image.fromarray(rng.randint(0, 255, (24, 32), dtype=np.uint8))
        buf = io.BytesIO()
        img.save(buf, format="PNG")
        depth_mm = (rng.rand(24, 32) * 3000).astype(np.uint16)
        dbuf = io.BytesIO()
        Image.fromarray(depth_mm).save(dbuf, format="PNG")
        # scan: XYZ float32 1xN 3-channel compressData2 (CV_32FC3 = 21)
        scan = rng.rand(1, 16, 3).astype(np.float32)
        scan_info = np.concatenate([
            np.array([5, 0.0, 10.0, 0, 0, 0, 16], np.float32),
            np.eye(3, 4, dtype=np.float32).ravel()])
        con.execute(
            "INSERT INTO Data (id, image, depth, calibration, scan,"
            " scan_info) VALUES (?,?,?,?,?,?)",
            (nid, buf.getvalue(), dbuf.getvalue(),
             _calib_blob(300.0, 301.0, 16.0, 12.0, 32, 24),
             _compress_mat(scan, 21), scan_info.tobytes()))
    # links: odometry chain + one closure; info 6x6 float64
    info = (np.eye(6) * 50.0).astype(np.float64)
    t = np.eye(3, 4, dtype=np.float32)
    t[0, 3] = 0.5
    for a, b, ty in ((1, 2, 0), (2, 3, 0), (1, 3, 1)):
        con.execute("INSERT INTO Link (from_id, to_id, type,"
                    " information_matrix, transform) VALUES (?,?,?,?,?)",
                    (a, b, ty, info.tobytes(), _pose_blob(t)))
    for k in range(8):
        d = rng.randint(0, 256, 32).astype(np.uint8)
        con.execute("INSERT INTO Word (id, descriptor_size, descriptor)"
                    " VALUES (?,?,?)", (100 + k, 32, d.tobytes()))
    con.execute("INSERT INTO Info (STM_size, last_sign_added, parameters)"
                " VALUES (?,?,?)",
                (10, 3, "Kp/MaxFeatures:500;Rtabmap/LoopThr:0.11"))
    # statistics row: compressData2-wrapped "Name:value;..." CV_8UC1 text
    text = "Timing/Total/ms:12.5;Loop/Id/:0".encode()
    con.execute("INSERT INTO Statistics (id, stamp, data) VALUES (?,?,?)",
                (1, 101.0, _compress_mat(
                    np.frombuffer(text, np.uint8).reshape(1, -1), 0)))
    # admin: optimized poses (opt_ids CV_32SC1, opt_poses CV_32FC1 (3N x 4))
    ids = np.array([[1, 2, 3]], np.int32)
    opt = np.concatenate(poses).astype(np.float32)
    con.execute("INSERT INTO Admin (version, opt_ids, opt_poses)"
                " VALUES (?,?,?)",
                ("0.21.0", _compress_mat(ids, 4), _compress_mat(opt, 5)))
    con.commit()
    con.close()


def test_ref_db_roundtrip(tmp_path):
    path = str(tmp_path / "ref.db")
    _make_ref_db(path)
    db = RefDatabase(path)
    assert db.version == "0.21.0"
    assert db.node_ids() == [1, 2, 3]

    sigs, opt_poses, params = db.load_all()
    assert set(sigs) == {1, 2, 3}
    s1 = sigs[1]
    assert s1.weight == 1 and s1.label == "n1" and s1.stamp == 101.0
    assert s1.pose[0, 3] == 0.0 and sigs[3].pose[0, 3] == 1.0
    np.testing.assert_allclose(s1.gps,
                               [1.0, -71.2, 46.8, 10.0, 2.0, 0.0])
    # features: 8 words, 256-bit ±1 descriptors, 3D present
    assert s1.word_ids.tolist() == [100 + k for k in range(8)]
    assert s1.desc.shape == (8, 256) and set(np.unique(s1.desc)) <= {-1, 1}
    assert s1.valid3d[1:].all()          # k=0 point is (0,0,1) -> valid
    # links: inverse attached on the other endpoint
    assert 2 in s1.links and 3 in s1.links
    assert sigs[2].links[1].transform[0, 3] == -0.5
    # closure typed correctly
    assert sigs[3].links[1].type == 1

    # calibration
    fx, fy, cx, cy, w, h, L = db.load_calibration(1)
    assert (fx, fy, cx, cy, w, h) == (300.0, 301.0, 16.0, 12.0, 32, 24)

    # optimized poses + parameters + statistics
    assert set(opt_poses) == {1, 2, 3}
    assert opt_poses[2][0, 3] == 0.5
    assert params["Kp/MaxFeatures"] == "500"
    stats = db.load_statistics()
    assert stats[0][0] == 1 and stats[0][2]["Timing/Total/ms"] == 12.5

    # replay frames: grayscale image + metric depth + scan
    frames = list(db.frames())
    assert len(frames) == 3
    f = frames[0]
    assert f["gray"].shape == (24, 32) and 0.0 <= f["gray"].max() <= 1.0
    assert f["depth"].shape == (24, 32) and f["depth"].max() <= 3.0
    xyz, fmt = db.load_scan(1)
    assert xyz.shape == (16, 3) and fmt == 5
    db.close()


def test_compress_mat_roundtrip():
    arr = np.arange(12, dtype=np.float32).reshape(3, 4)
    blob = _compress_mat(arr, 5)
    out = uncompress_mat(blob)
    np.testing.assert_array_equal(out, arr)


def test_import_ref_db_tool(tmp_path):
    from rtabmap_tpu.tools.cli import tool_import_ref_db
    from rtabmap_tpu.memory.db import Database

    path = str(tmp_path / "ref.db")
    out = str(tmp_path / "ours.db")
    _make_ref_db(path)
    info = tool_import_ref_db([path, "--out", out])
    assert info["nodes"] == 3 and info["optimized_poses"] == 3
    db = Database(out, async_writes=False)
    s = db.load_signature(2)
    assert s is not None and s.label == "n2"
    admin = db.load_admin()
    assert len(admin["optimized_poses"]) == 3
    db.close()
