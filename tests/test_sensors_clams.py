"""Sensor capture drivers, VLP-16 decode, CLAMS depth calibration."""
import os

import jax.numpy as jnp
import numpy as np
import pytest

from rtabmap_tpu.ops import clams
from rtabmap_tpu.sensors.capture import (
    CameraImages, CameraRGBDImages, available_drivers, create_camera,
)
from rtabmap_tpu.sensors.lidar import (
    ELEVATIONS_DEG, LidarVLP16, decode_packet, encode_packet,
)


# ------------------------------------------------------------------- capture


def _write_png(path, arr):
    from PIL import Image

    Image.fromarray(arr).save(path)


def test_camera_images_driver(tmp_path):
    d = tmp_path / "imgs"
    d.mkdir()
    for i in range(3):
        _write_png(str(d / f"{i}.png"), np.full((8, 10), i * 40, np.uint8))
    cam = create_camera("images", str(d), fps=10.0)
    assert cam.init()
    frames = list(cam)
    assert len(frames) == 3
    assert frames[0].gray.shape == (8, 10)
    assert frames[0].gray.dtype == np.float32 and frames[0].gray.max() <= 1.0
    assert frames[2].id == 3 and abs(frames[1].stamp - 0.1) < 1e-9


def test_camera_rgbd_driver(tmp_path):
    rd, dd = tmp_path / "rgb", tmp_path / "depth"
    rd.mkdir(), dd.mkdir()
    for i in range(2):
        _write_png(str(rd / f"{i}.png"), np.full((6, 6, 3), 100, np.uint8))
        _write_png(str(dd / f"{i}.png"), np.full((6, 6), 5000, np.uint16))
    cam = CameraRGBDImages(str(rd), str(dd))
    assert cam.init()
    f = next(iter(cam))
    np.testing.assert_allclose(f.depth, 1.0)  # 5000/5000 = 1m


def test_hardware_driver_stub_errors():
    with pytest.raises(RuntimeError, match="hardware SDK"):
        create_camera("realsense2")
    assert "images" in available_drivers() and "zed" in available_drivers()


# --------------------------------------------------------------------- lidar


def test_vlp16_roundtrip_decode():
    az = np.arange(12, dtype=np.float32) * 0.4
    dist = np.random.default_rng(0).uniform(1.0, 50.0, (12, 32)).astype(np.float32)
    inten = np.random.default_rng(1).integers(0, 255, (12, 32))
    pkt = encode_packet(az, dist, inten)
    assert len(pkt) == 1206
    az2, d2, i2 = decode_packet(pkt)
    np.testing.assert_allclose(az2, az, atol=0.01)
    np.testing.assert_allclose(d2, dist, atol=0.002)
    np.testing.assert_array_equal(i2, inten)


def test_vlp16_full_revolution_geometry():
    # lasers firing at constant 10 m range over a full revolution
    pkts = []
    for p in range(75):  # 75 packets * 24 firings * 0.2 deg = 360 deg
        az = (np.arange(12, dtype=np.float32) * 0.4 + p * 4.8) % 360.0
        dist = np.full((12, 32), 10.0, np.float32)
        pkts.append(encode_packet(az, dist))
    # extra packet to trigger the wrap and emit
    pkts.append(encode_packet(np.arange(12, dtype=np.float32) * 0.4,
                              np.full((12, 32), 10.0, np.float32)))
    scans = list(LidarVLP16(pkts))
    assert len(scans) >= 1
    s = scans[0]
    xyz = np.asarray(s.xyz())[np.asarray(s.valid)]
    r = np.linalg.norm(xyz, axis=1)
    np.testing.assert_allclose(r, 10.0, atol=0.05)
    # z spread matches the +/-15 deg elevation fan
    assert abs(xyz[:, 2].max() - 10.0 * np.sin(np.deg2rad(15))) < 0.05
    # azimuth coverage: points in all four quadrants
    q = (xyz[:, 0] > 0).astype(int) * 2 + (xyz[:, 1] > 0).astype(int)
    assert len(np.unique(q)) == 4


# --------------------------------------------------------------------- clams


def test_clams_learns_multiplier():
    H, W = 64, 80
    model = clams.init_model(H, W, bin_px=8, bin_depth=1.0, max_depth=8.0)
    rng = np.random.default_rng(0)
    # true distortion: measured depth reads 10% short beyond 3m
    for _ in range(8):
        gt = rng.uniform(0.5, 7.5, (H, W)).astype(np.float32)
        measured = np.where(gt > 3.0, gt * 0.9, gt)
        model = clams.accumulate(model, jnp.asarray(measured), jnp.asarray(gt))
    meas = np.where(np.full((H, W), 5.0) > 3.0, 5.0 * 0.9, 5.0).astype(np.float32)
    fixed = np.asarray(clams.undistort(model, jnp.asarray(meas), min_count=4))
    np.testing.assert_allclose(fixed, 5.0, atol=0.15)
    # near range stays ~identity (the 2-3m bin straddles the synthetic
    # discontinuity at 3m, so allow the small mixed-bin bias)
    near = np.full((H, W), 2.0, np.float32)
    np.testing.assert_allclose(np.asarray(clams.undistort(model, jnp.asarray(near),
                                                          min_count=4)), 2.0, atol=0.1)
    far_fix = np.asarray(clams.undistort(model, jnp.full((H, W), 1.0), min_count=4))
    np.testing.assert_allclose(far_fix, 1.0, atol=0.02)  # clean bin: identity


def test_clams_save_load(tmp_path):
    model = clams.init_model(32, 32)
    model = clams.accumulate(model, jnp.full((32, 32), 2.0), jnp.full((32, 32), 2.2))
    p = str(tmp_path / "clams.npz")
    clams.save_model(model, p)
    m2 = clams.load_model(p)
    np.testing.assert_allclose(np.asarray(m2.mult_sum), np.asarray(model.mult_sum))


def test_lidar_deskew_recovers_static_world():
    """Points captured from a moving sensor, tagged with capture times,
    deskew back to the sweep-start frame (reference: util3d::deskew)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from rtabmap_tpu.geometry import transform as T
    from rtabmap_tpu.sensors.lidar import deskew

    rng = np.random.RandomState(1)
    world = jnp.asarray(rng.rand(32, 3) * 4 - 2, jnp.float32)
    xi = jnp.asarray([0.3, -0.1, 0.05, 0.02, 0.04, 0.25])  # twist /s
    times = jnp.linspace(0.0, 0.1, 32)
    # sensor pose at time t: exp(xi*t); captured point = pose^-1 * world
    caps = []
    for i in range(32):
        P = T.se3_exp(xi * times[i])
        caps.append(T.apply(T.inverse(P)[None], world[i][None, None])[0, 0])
    captured = jnp.stack(caps)
    out = deskew(captured, times, xi, stamp=0.0)
    err = jnp.abs(out - world).max()
    assert float(err) < 1e-4, float(err)
