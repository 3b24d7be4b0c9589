"""Meshing/export + marker detection."""
import numpy as np
import pytest

from rtabmap_tpu.geometry import camera as C
from rtabmap_tpu.datasets import synthetic as S
from rtabmap_tpu.maps import mesh as M

CAM = C.CameraModel.make(300.0, 300.0, 160.0, 120.0, 320, 240)


def test_organized_fast_mesh_and_export(tmp_path):
    pose = S.loop_trajectory(64)[0]
    gray, depth = S.render(pose, CAM)
    verts, faces, fvalid = M.organized_fast_mesh(depth, CAM, decimation=4)
    assert int(fvalid.sum()) > 1000
    normals = M.mesh_normals(verts, faces, fvalid)
    v, f, _ = M.compact_mesh(verts, faces, fvalid)
    assert f.max() < len(v)
    # export + header check
    ply = str(tmp_path / "m.ply")
    M.write_ply(ply, v, f)
    nv, nf = M.read_ply_counts(ply)
    assert nv == len(v) and nf == len(f)
    M.write_obj(str(tmp_path / "m.obj"), v, f)
    assert (tmp_path / "m.obj").stat().st_size > 1000


def test_mesh_rejects_depth_jumps():
    # two fronto-parallel planes with a big depth step
    depth = np.full((64, 64), 2.0, np.float32)
    depth[:, 32:] = 5.0
    import jax.numpy as jnp

    verts, faces, fvalid = M.organized_fast_mesh(jnp.asarray(depth), CAM, decimation=1)
    v = np.asarray(verts)
    f = np.asarray(faces)[np.asarray(fvalid)]
    # no face may straddle the jump: all 3 vertices on the same side
    xs = v[f][:, :, 2]  # z values
    same = np.all(np.abs(xs - xs[:, :1]) < 0.5, axis=1)
    assert same.all()


def test_gain_compensation():
    # image 1 is 20% darker than 0; 2 matches 0
    overlaps = [(0, 1, 1.0, 0.8), (0, 2, 1.0, 1.0), (1, 2, 0.8, 1.0)]
    g = M.gain_compensation(overlaps, 3)
    np.testing.assert_allclose(g[0], 1.0, atol=1e-6)
    np.testing.assert_allclose(g[1] * 0.8, g[0] * 1.0, atol=0.05)


def test_marker_detection():
    from rtabmap_tpu.ops.markers import MarkerDetector, draw_marker

    det = MarkerDetector("4X4_50", marker_length=0.2)
    img = np.full((480, 640), 255, np.uint8)
    m = draw_marker("4X4_50", 7, 160)
    img[160:320, 240:400] = m
    cam = C.CameraModel.make(500.0, 500.0, 320.0, 240.0, 640, 480)
    found = det.detect(img, cam)
    assert len(found) == 1
    lm = found[0]
    assert lm.id == 7
    # marker is centered and fronto-parallel; 160px/0.2m at f=500 -> z=0.625
    assert abs(lm.transform[2, 3] - 0.625) < 0.08, lm.transform
    assert abs(lm.transform[0, 3]) < 0.05 and abs(lm.transform[1, 3]) < 0.05
