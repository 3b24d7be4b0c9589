"""Camera yaml IO + FULL stereo rectification (R1/R2/P1/P2) — reference:
CameraModel::save/load (CameraModel.cpp:236-500) and
StereoCameraModel::initRectificationMap (StereoCameraModel.cpp:618).

The rectification invariant: after applying (R1,P1)/(R2,P2), any 3D point
projects to the SAME ROW in both rectified images, and disparity is
f*baseline/z."""
import numpy as np
import pytest

from rtabmap_tpu.geometry import camera as C


def _rot(axis, deg):
    th = np.deg2rad(deg)
    c, s = np.cos(th), np.sin(th)
    if axis == "x":
        return np.array([[1, 0, 0], [0, c, -s], [0, s, c]])
    if axis == "y":
        return np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]])
    return np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]])


def test_yaml_roundtrip(tmp_path):
    cam = C.CameraModel.make(
        300.0, 302.0, 161.5, 119.25, 320, 240,
        dist=np.array([0.1, -0.05, 0.001, 0.002, 0.01], np.float32),
        local_transform=np.eye(3, 4, dtype=np.float32))
    p = str(tmp_path / "cam.yaml")
    C.save_yaml(cam, p, name="test_cam")
    back = C.load_yaml(p)
    for a, b in [(cam.fx, back.fx), (cam.fy, back.fy), (cam.cx, back.cx),
                 (cam.cy, back.cy)]:
        np.testing.assert_allclose(float(a), float(b), rtol=1e-6)
    assert back.width == 320 and back.height == 240
    np.testing.assert_allclose(np.asarray(back.dist), np.asarray(cam.dist),
                               rtol=1e-6)
    np.testing.assert_allclose(np.asarray(back.local_transform),
                               np.asarray(cam.local_transform), atol=1e-8)


def test_stereo_yaml_roundtrip(tmp_path):
    left = C.CameraModel.make(300.0, 300.0, 160.0, 120.0, 320, 240)
    right = C.CameraModel.make(298.0, 299.0, 158.0, 121.0, 320, 240)
    R = _rot("y", 1.5) @ _rot("x", -0.7)
    T = np.array([-0.12, 0.002, -0.004])
    st = C.StereoCameraModel(left, right, np.float32(0.12),
                             R=R.astype(np.float32),
                             T=T.astype(np.float32))
    C.save_stereo_yaml(st, str(tmp_path), name="rig")
    back = C.load_stereo_yaml(str(tmp_path), name="rig")
    np.testing.assert_allclose(np.asarray(back.R), R, atol=1e-6)
    np.testing.assert_allclose(np.asarray(back.T), T, atol=1e-6)
    np.testing.assert_allclose(float(back.baseline), 0.12, rtol=1e-5)


def test_rectification_row_alignment_and_disparity():
    """The core stereo_rectify invariant on a misaligned rig."""
    left = C.CameraModel.make(300.0, 300.0, 160.0, 120.0, 320, 240)
    right = C.CameraModel.make(305.0, 304.0, 158.0, 122.0, 320, 240)
    # X_r = R X_l + T (OpenCV convention); ~2 deg misalignment
    R = _rot("y", 2.0) @ _rot("z", 1.0)
    B = 0.10
    T = np.array([-B, 0.003, -0.002])
    R1, R2, P1, P2 = C.stereo_rectify(left, right, R, T)
    rng = np.random.default_rng(0)
    X = rng.uniform([-1, -1, 2.0], [1, 1, 6.0], size=(50, 3))
    Xr = X @ R.T + T

    def proj_K(Rr, P, Xc):
        # image formation: rotate the camera's own points by its
        # rectification rotation, project with the shared K (P[:, :3])
        Y = Xc @ np.asarray(Rr, np.float64).T
        uvw = Y @ np.asarray(P, np.float64)[:, :3].T
        return uvw[:, :2] / uvw[:, 2:3], Y[:, 2]

    uv1, z1 = proj_K(R1, P1, X)
    uv2, z2 = proj_K(R2, P2, Xr)
    # P2's 4th column projects LEFT-rectified-frame points into the right
    # image (cv::stereoRectify convention) — must agree with the above
    Yl = X @ np.asarray(R1, np.float64).T
    uvw = Yl @ np.asarray(P2, np.float64)[:, :3].T + np.asarray(P2)[None, :, 3]
    np.testing.assert_allclose(uvw[:, :2] / uvw[:, 2:3], uv2, atol=0.05)
    # rows align to sub-0.05 px
    np.testing.assert_allclose(uv1[:, 1], uv2[:, 1], atol=0.05)
    # disparity = f * baseline / z, positive
    disp = uv1[:, 0] - uv2[:, 0]
    f = float(P1[0, 0])
    base = abs(float(P2[0, 3]) / f)
    np.testing.assert_allclose(base, np.linalg.norm(T), rtol=1e-3)
    np.testing.assert_allclose(disp, f * base / z1, rtol=5e-3, atol=0.05)
    assert (disp > 0).all()


def test_rectification_maps_identity_for_ideal_rig():
    """An already-rectified rig's maps are (near-)identity grids."""
    cam = C.CameraModel.make(300.0, 300.0, 160.0, 120.0, 32, 24)
    st = C.StereoCameraModel(cam, cam, np.float32(0.1),
                             R=np.eye(3, dtype=np.float32),
                             T=np.array([-0.1, 0, 0], np.float32))
    m1, m2, rect = C.stereo_rectification_maps(st)
    H, W = 24, 32
    vv, uu = np.meshgrid(np.arange(H), np.arange(W), indexing="ij")
    np.testing.assert_allclose(np.asarray(m1[..., 0]), uu, atol=1e-3)
    np.testing.assert_allclose(np.asarray(m1[..., 1]), vv, atol=1e-3)
    np.testing.assert_allclose(float(rect.baseline), 0.1, rtol=1e-5)
