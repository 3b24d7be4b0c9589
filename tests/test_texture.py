"""Texture mapping: camera assignment, multiband atlas bake, OBJ export.

Reference capability: util3d_surface createTextureMesh/mergeTextures +
GainCompensator (see maps/texture.py docstring)."""
import numpy as np
import pytest

from rtabmap_tpu.geometry import camera as C
from rtabmap_tpu.geometry import transform as T
from rtabmap_tpu.maps import mesh as MS
from rtabmap_tpu.maps import texture as TX


@pytest.fixture(scope="module")
def scene():
    """A fronto-parallel plane at z=2 with a horizontal intensity ramp,
    seen by two cameras (second shifted +x, half the exposure)."""
    cam = C.CameraModel.make(80.0, 80.0, 32.0, 24.0, 64, 48)
    depth = np.full((48, 64), 2.0, np.float32)
    verts, faces, fv = MS.organized_fast_mesh(depth, cam, decimation=4)
    verts, faces, _ = MS.compact_mesh(np.asarray(verts), np.asarray(faces),
                                      np.asarray(fv))
    u = np.linspace(0.2, 0.9, 64, dtype=np.float32)
    img0 = np.tile(u, (48, 1))
    img1 = 0.5 * img0  # underexposed second view
    pose0 = np.asarray(T.identity())
    pose1 = np.asarray(T.from_xyzrpy(np.array([0.1, 0, 0, 0, 0, 0],
                                              np.float32)))
    return cam, verts, faces, [pose0, pose1], [img0, img1], depth


def test_face_camera_scores(scene):
    cam, verts, faces, poses, imgs, depth = scene
    s = np.asarray(TX.face_camera_scores(verts, faces, poses, cam))
    assert s.shape == (2, len(faces))
    assert (s[0] > 0).mean() > 0.9   # camera 0 sees nearly every face
    # a camera behind the plane sees nothing
    back = np.asarray(T.from_xyzrpy(np.array([0, 0, 5, 0, np.pi, 0],
                                             np.float32)))
    s2 = np.asarray(TX.face_camera_scores(verts, faces, [back], cam))
    assert (s2 <= 0).all()


def test_occlusion_culls_hidden_faces(scene):
    cam, verts, faces, poses, imgs, depth = scene
    # depth map says everything is at z=1 -> all faces (z=2) are occluded
    near = np.full_like(depth, 1.0)
    s = np.asarray(TX.face_camera_scores(verts, faces, [poses[0]], cam,
                                         depths=[near]))
    assert (s <= 0).all()
    s_ok = np.asarray(TX.face_camera_scores(verts, faces, [poses[0]], cam,
                                            depths=[depth]))
    assert (s_ok[0] > 0).mean() > 0.9


def test_bake_atlas_matches_image(scene):
    cam, verts, faces, poses, imgs, depth = scene
    tm = TX.texture_mesh(verts, faces, [poses[0]], cam, [imgs[0]],
                         compensate_gains=False)
    assert tm.atlas.ndim == 2 and tm.uvs.shape == (len(faces), 3, 2)
    A = tm.atlas.shape[0]
    # each observed face corner texel should match the image at the
    # corner vertex's projection
    errs = []
    for f in range(0, len(faces), 7):
        if tm.face_camera[f] < 0:
            continue
        for c in range(3):
            v = verts[faces[f, c]]
            u_img = v[0] / v[2] * cam.fx + cam.cx
            expect = 0.2 + (0.9 - 0.2) * (u_img / 63.0)
            u, vv = tm.uvs[f, c] * A
            got = tm.atlas[int(vv), int(u)]
            errs.append(abs(got - expect))
    assert np.median(errs) < 0.06


def test_gain_compensated_multiband_blend(scene):
    cam, verts, faces, poses, imgs, depth = scene
    tm = TX.texture_mesh(verts, faces, poses, cam, imgs,
                         compensate_gains=True)
    tm_raw = TX.texture_mesh(verts, faces, poses, cam, imgs,
                             compensate_gains=False)
    obs = tm.face_camera >= 0
    A = tm.atlas.shape[0]
    cent_uv = tm.uvs[obs].mean(axis=1) * A
    vals = tm.atlas[cent_uv[:, 1].astype(int), cent_uv[:, 0].astype(int)]
    vals_raw = tm_raw.atlas[cent_uv[:, 1].astype(int),
                            cent_uv[:, 0].astype(int)]
    # without compensation the underexposed camera drags the blend down;
    # with gains the atlas should be brighter and closer to image0 levels
    assert vals.mean() > vals_raw.mean() + 0.02


def test_textured_obj_roundtrip(tmp_path, scene):
    cam, verts, faces, poses, imgs, depth = scene
    tm = TX.texture_mesh(verts, faces, [poses[0]], cam, [imgs[0]])
    p = str(tmp_path / "mesh.obj")
    TX.write_textured_obj(p, tm)
    v2, f2, uv2, atlas2 = TX.read_textured_obj(p)
    assert v2.shape == tm.vertices.shape and (f2 == tm.faces).all()
    assert np.allclose(uv2, tm.uvs, atol=1e-4)
    assert atlas2.shape[0] == tm.atlas.shape[0]
    assert np.abs(atlas2.astype(np.float32) / 255.0 - tm.atlas).max() < 0.01


def test_png_rgb_roundtrip(tmp_path):
    rng = np.random.RandomState(0)
    img = rng.rand(20, 30, 3).astype(np.float32)
    p = str(tmp_path / "x.png")
    TX.write_png(p, img)
    back = TX.read_png(p).astype(np.float32) / 255.0
    assert back.shape == (20, 30, 3)
    assert np.abs(back - img).max() < 0.01


def test_export_cloud_textured_mesh(tmp_path):
    """data_recorder-style DB -> export_cloud --mesh --texture
    (reference: rtabmap-export pipeline)."""
    from rtabmap_tpu.memory.db import Database
    from rtabmap_tpu.tools.cli import tool_export_cloud

    cam = C.CameraModel.make(40.0, 40.0, 16.0, 12.0, 32, 24)
    db_path = str(tmp_path / "rec.db")
    db = Database(db_path, async_writes=False)
    rng = np.random.RandomState(1)
    tex = rng.rand(24, 32).astype(np.float32)
    for k in range(3):
        pose = np.asarray(T.from_xyzrpy(
            np.array([0.05 * k, 0, 0, 0, 0, 0], np.float32)))
        depth = np.full((24, 32), 1.5, np.float32)
        db.save_raw_frame(k + 1, stamp=float(k), pose=pose,
                          image=tex, depth=depth)
    db.save_admin()
    db.flush()
    db.close()
    out = str(tmp_path / "map.obj")
    nfaces = tool_export_cloud([db_path, out, "--mesh", "--texture",
                                "--cam", "40,40,16,12,32,24"])
    assert nfaces > 10
    v2, f2, uv2, atlas = TX.read_textured_obj(out)
    assert len(v2) > 0 and atlas.size > 0
    # plain mesh export too
    out2 = str(tmp_path / "map.ply")
    n2 = tool_export_cloud([db_path, out2, "--mesh",
                            "--cam", "40,40,16,12,32,24"])
    assert n2 == nfaces
