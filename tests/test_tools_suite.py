"""New tool-suite coverage: grid persistence + cleanup, data recorder,
console app, stereo eval, vocabulary comparison, epipolar tool,
extract object, images joiner (reference: tools/ — CleanupLocalGrids,
DataRecorder, ConsoleApp, StereoEval, VocabularyComparison,
EpipolarGeometry, ExtractObject, ImagesJoiner)."""
import os

import numpy as np
import jax.numpy as jnp
import pytest

from rtabmap_tpu.tools import cli

SAMPLES = "/root/reference/data/samples"


def _save_images(d, n=3, size=(120, 160), seed=0):
    from PIL import Image

    rng = np.random.default_rng(seed)
    base = (rng.random((size[0] + 40, size[1] + 40)) * 255).astype(np.uint8)
    os.makedirs(d, exist_ok=True)
    for i in range(n):
        crop = base[i * 4:i * 4 + size[0], i * 6:i * 6 + size[1]]
        Image.fromarray(crop).save(os.path.join(d, f"{i:03d}.png"))


def test_grid_scan_db_roundtrip(tmp_path):
    from rtabmap_tpu.core.laser_scan import ScanFormat, make_scan
    from rtabmap_tpu.maps.grids import LocalGrid
    from rtabmap_tpu.memory.db import Database
    from rtabmap_tpu.memory.memory import Signature

    g = LocalGrid(
        ground=np.zeros((8, 2), np.float32), ground_valid=np.zeros(8, bool),
        obstacles=np.arange(16, dtype=np.float32).reshape(8, 2),
        obstacles_valid=np.array([1, 1, 1, 0, 0, 0, 0, 0], bool),
        empty=np.zeros((8, 2), np.float32), empty_valid=np.zeros(8, bool))
    scan = make_scan(np.random.default_rng(0).random((32, 3)).astype(np.float32))
    sig = Signature(id=1, map_id=0, stamp=1.0,
                    pose=np.eye(3, 4, dtype=np.float32))
    sig.grid = g
    sig.scan = scan
    db = Database(str(tmp_path / "g.db"), async_writes=False)
    db.save_signature(sig)
    back = db.load_signature(1)
    assert back.grid is not None and back.scan is not None
    got = np.asarray(back.grid.obstacles)[np.asarray(back.grid.obstacles_valid)]
    want = np.asarray(g.obstacles)[np.asarray(g.obstacles_valid)]
    np.testing.assert_allclose(np.sort(got, 0), np.sort(want, 0))
    np.testing.assert_allclose(back.scan.data, np.asarray(scan.data))
    assert back.scan.format == int(scan.format)
    db.close()


def test_cleanup_local_grids():
    from rtabmap_tpu.maps.grids import LocalGrid, cleanup_local_grids

    cap = 64
    # node 0 at origin: a wall of obstacles at x=2, plus one spurious
    # obstacle at x=1 that every other node sees as empty space
    def mk(obs, emp):
        o = np.zeros((cap, 2), np.float32)
        ov = np.zeros(cap, bool)
        if obs:
            o[:len(obs)] = obs
            ov[:len(obs)] = True
        e = np.zeros((cap, 2), np.float32)
        ev = np.zeros(cap, bool)
        if emp:
            e[:len(emp)] = emp
            ev[:len(emp)] = True
        return LocalGrid(ground=np.zeros((cap, 2), np.float32),
                         ground_valid=np.zeros(cap, bool),
                         obstacles=o, obstacles_valid=ov,
                         empty=e, empty_valid=ev)

    # cell-center coordinates (local_grid_from_cloud snaps to centers)
    wall = [(2.025, 0.025 + 0.05 * k) for k in range(8)]
    dyn = [(1.025, 0.125)]
    empties = [(1.025 + dx * 0.05, 0.125 + dy * 0.05)
               for dx in range(-3, 4) for dy in range(-3, 4)]
    g0 = mk(wall + dyn, [])
    g1 = mk(wall, empties)
    g2 = mk(wall, empties)
    eye = np.eye(3, 4, dtype=np.float32)
    poses = {0: eye, 1: eye, 2: eye}
    cleaned, removed = cleanup_local_grids(poses, {0: g0, 1: g1, 2: g2},
                                           cell_size=0.05, radius=1)
    assert removed == 1, removed
    # the wall must survive
    assert np.asarray(cleaned[0].obstacles_valid).sum() == len(wall)


def test_data_recorder_roundtrip(tmp_path):
    img_dir = str(tmp_path / "imgs")
    _save_images(img_dir, 3)
    out = str(tmp_path / "rec.db")
    n = cli.main(["data_recorder", out, "images", img_dir])
    assert n == 3
    from rtabmap_tpu.memory.db import Database

    db = Database(out, async_writes=False)
    ids = db.all_node_ids()
    assert len(ids) == 3
    img, depth, calib = db.load_raw_frame(ids[0])
    assert img is not None and img.shape == (120, 160)
    db.close()


@pytest.mark.slow
def test_console_app_samples(tmp_path, monkeypatch):
    import shutil

    d = str(tmp_path / "seq")
    os.makedirs(d)
    for i in range(1, 9):
        shutil.copy(f"{SAMPLES}/{i}.jpg", f"{d}/{i:02d}.jpg")
    out = cli.main(["console_app", d])
    assert out is not None and out["frames"] == 8
    assert len(out["slam"].stats_history) >= 7


def test_stereo_eval(tmp_path):
    from PIL import Image

    rng = np.random.default_rng(1)
    left = (rng.random((96, 128)) * 255).astype(np.uint8)
    right = np.roll(left, -6, axis=1)  # uniform disparity 6
    Image.fromarray(left).save(str(tmp_path / "l.png"))
    Image.fromarray(right).save(str(tmp_path / "r.png"))
    out = cli.main(["stereo_eval", str(tmp_path / "l.png"),
                    str(tmp_path / "r.png"), "16"])
    assert out["sparse_n"] > 0
    assert abs(out["dense_mean_disp"] - 6.0) < 2.0


def test_vocabulary_comparison(tmp_path):
    d = str(tmp_path / "imgs")
    _save_images(d, 3)
    rows = cli.main(["vocabulary_comparison", d, "128"])
    assert len(rows) == 3
    assert rows[0][1] > 0  # first frame: all words new


def test_epipolar_geometry_tool():
    out = cli.main(["epipolar_geometry", f"{SAMPLES}/1.jpg", f"{SAMPLES}/2.jpg"])
    assert "F" in out


def test_extract_object(tmp_path):
    from rtabmap_tpu.maps.mesh import read_ply, write_ply

    rng = np.random.default_rng(2)
    plane = np.stack([rng.uniform(-1, 1, 400), rng.uniform(-1, 1, 400),
                      np.zeros(400)], -1)
    obj = rng.normal([0.3, 0.2, 0.3], 0.05, (120, 3))
    far = rng.normal([-0.6, -0.5, 0.4], 0.02, (30, 3))
    cloud = np.concatenate([plane, obj, far]).astype(np.float32)
    inp, outp = str(tmp_path / "in.ply"), str(tmp_path / "out.ply")
    write_ply(inp, cloud)
    n = cli.main(["extract_object", inp, outp])
    assert 90 <= n <= 150, n  # the big cluster, not the plane or far blob
    verts, _, _ = read_ply(outp)
    assert np.linalg.norm(verts.mean(0) - [0.3, 0.2, 0.3]) < 0.1


def test_images_joiner(tmp_path):
    da, db_ = str(tmp_path / "a"), str(tmp_path / "b")
    _save_images(da, 2)
    _save_images(db_, 2, seed=5)
    out = str(tmp_path / "joined")
    n = cli.main(["images_joiner", da, db_, out])
    assert n == 2
    from PIL import Image

    im = Image.open(os.path.join(out, "000000.png"))
    assert im.size == (320, 120)


def test_ply_roundtrip(tmp_path):
    from rtabmap_tpu.maps.mesh import read_ply, write_ply

    v = np.random.default_rng(0).random((10, 3)).astype(np.float32)
    c = (np.random.default_rng(1).random((10, 3)) * 255).astype(np.uint8)
    f = np.array([[0, 1, 2], [3, 4, 5]], np.int32)
    p = str(tmp_path / "m.ply")
    write_ply(p, v, faces=f, colors=c)
    v2, f2, c2 = read_ply(p)
    np.testing.assert_allclose(v, v2, atol=1e-4)
    np.testing.assert_array_equal(f, f2)
    np.testing.assert_array_equal(c, c2)


def test_wifi_mapping_example(tmp_path):
    """User-data channel end-to-end (reference: examples/WifiMapping):
    RSSI packed on every node, persisted, read back at optimized poses."""
    import numpy as np
    from rtabmap_tpu.tools.wifi_mapping import run, rssi_at, unpack_wifi

    out = str(tmp_path / "wifi")
    rows = run(out, n_frames=8, verbose=False)
    assert len(rows) == 8
    import os
    assert os.path.exists(os.path.join(out, "wifi_map.ply"))
    assert os.path.exists(os.path.join(out, "wifi_map.csv"))
    # signal strength decays with distance from the simulated AP
    ap = np.array([1.5, 0.0, 0.0])
    for _, x, y, z, dbm in rows:
        expect = rssi_at([x, y, z], ap)
        assert abs(dbm - expect) < 3.0  # optimized pose ~ render pose


def test_db_edit_tool(tmp_path):
    """DatabaseViewer edit surface as a CLI: list, remove_link (persists
    the deletion through resume), set_label, dot export."""
    import json
    import numpy as np
    from rtabmap_tpu.memory.db import Database
    from rtabmap_tpu.tools.cli import tool_db_edit
    from tests.test_tools import make_tum_dir
    from rtabmap_tpu.tools.cli import tool_rgbd_dataset

    root = make_tum_dir(tmp_path, n=8)
    db_path = str(tmp_path / "m.db")
    tool_rgbd_dataset(["--Rtabmap/DetectionRate", "0", root, db_path])

    nodes = tool_db_edit([db_path, "nodes"])
    assert len(nodes) == 8
    links = tool_db_edit([db_path, "links"])
    assert len(links) >= 7
    # label + dot
    assert tool_db_edit([db_path, "set_label", str(nodes[0]["id"]), "door"])
    dot = str(tmp_path / "g.dot")
    assert tool_db_edit([db_path, "dot", dot]) > 0
    # remove a neighbor link and verify it stays removed in the store
    f, t = links[0]["from"], links[0]["to"]
    tool_db_edit([db_path, "remove_link", str(f), str(t)])
    links2 = tool_db_edit([db_path, "links"])
    assert not any({l["from"], l["to"]} == {f, t} for l in links2)
