import jax.numpy as jnp
import numpy as np
import pytest

from rtabmap_tpu.geometry import camera as C
from rtabmap_tpu.utils.params import Parameters


def test_project_backproject_roundtrip():
    cam = C.CameraModel.make(525.0, 525.0, 319.5, 239.5, 640, 480)
    pts = jnp.array([[[0.5, -0.2, 2.0], [1.0, 1.0, 4.0]]])
    uv, z = C.project(pts, cam)
    back = C.backproject(uv, z, cam)
    np.testing.assert_allclose(np.asarray(back), np.asarray(pts), atol=1e-5)


def test_undistort_roundtrip():
    cam = C.CameraModel.make(
        525.0, 525.0, 319.5, 239.5, 640, 480,
        dist=jnp.array([0.2, -0.05, 0.001, -0.001, 0.0]),
    )
    uv = jnp.array([[100.0, 80.0], [320.0, 240.0], [600.0, 400.0]])
    und = C.undistort_points(uv, cam, iters=10)
    # distorting the undistorted normalized coords must give the original pixel
    xn = (und[..., 0] - cam.cx) / cam.fx
    yn = (und[..., 1] - cam.cy) / cam.fy
    d = C.distort(jnp.stack([xn, yn], -1), cam.dist)
    u2 = d[..., 0] * cam.fx + cam.cx
    v2 = d[..., 1] * cam.fy + cam.cy
    np.testing.assert_allclose(np.asarray(jnp.stack([u2, v2], -1)), np.asarray(uv), atol=1e-2)


def test_stereo_depth_disparity():
    st = C.StereoCameraModel.make(700.0, 700.0, 320.0, 240.0, 0.12)
    disp = jnp.array([10.0, 0.0, 35.0])
    depth = C.disparity_to_depth(disp, st)
    assert depth[1] == 0.0
    np.testing.assert_allclose(float(depth[0]), 700.0 * 0.12 / 10.0, rtol=1e-6)
    back = C.depth_to_disparity(depth, st)
    np.testing.assert_allclose(np.asarray(back), [10.0, 0.0, 35.0], rtol=1e-5)


def test_params_registry_has_reference_defaults():
    # SURVEY.md §5.6 key defaults
    assert Parameters.default("Rtabmap/LoopThr") == 0.11
    assert Parameters.default("Mem/STMSize") == 10
    assert Parameters.default("Kp/MaxFeatures") == 500
    assert Parameters.default("Vis/MinInliers") == 20
    assert Parameters.default("Vis/EstimationType") == 1
    assert Parameters.default("OdomF2M/MaxSize") == 2000
    assert Parameters.default("Grid/CellSize") == 0.05
    assert len(Parameters.registry()) >= 613


def test_params_set_and_parse():
    p = Parameters({"Rtabmap/LoopThr": "0.2"})
    assert p["Rtabmap/LoopThr"] == 0.2
    with pytest.raises(KeyError):
        p.set("Nope/Nope", 1)
    q, rest = Parameters.parse_arguments(["--Mem/STMSize", "20", "pos", "--Rtabmap/PublishStats", "false"])
    assert q["Mem/STMSize"] == 20
    assert q["Rtabmap/PublishStats"] is False
    assert rest == ["pos"]


def test_params_ini_roundtrip(tmp_path):
    p = Parameters({"Rtabmap/LoopThr": 0.33, "Mem/STMSize": 42})
    path = str(tmp_path / "cfg.ini")
    p.write_ini(path)
    q = Parameters().read_ini(path)
    assert q["Rtabmap/LoopThr"] == pytest.approx(0.33)
    assert q["Mem/STMSize"] == 42
