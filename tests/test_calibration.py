"""Calibration: chessboard detection, Zhang intrinsics, stereo extrinsics.

Oracle: synthetic boards with known intrinsics/poses (the reference
delegates to cv::calibrateCamera — we check against ground truth
directly, which is stronger)."""
import numpy as np
import jax.numpy as jnp

from rtabmap_tpu.geometry import transform as T
from rtabmap_tpu.ops import calibration as CAL


def _render_board(H_img_from_board, size=(320, 240), cells=(7, 6)):
    """Checkerboard image: evaluate checker(x,y) at board coords obtained by
    mapping each pixel through inv(H). Interior corners sit at integer
    lattice points 1..cols-? in board units."""
    W, Hh = size
    u, v = np.meshgrid(np.arange(W, dtype=np.float64),
                       np.arange(Hh, dtype=np.float64))
    Hinv = np.linalg.inv(H_img_from_board)
    x = Hinv[0, 0] * u + Hinv[0, 1] * v + Hinv[0, 2]
    y = Hinv[1, 0] * u + Hinv[1, 1] * v + Hinv[1, 2]
    w = Hinv[2, 0] * u + Hinv[2, 1] * v + Hinv[2, 2]
    bx, by = x / w, y / w
    inside = (bx >= 0) & (bx < cells[0]) & (by >= 0) & (by < cells[1])
    checker = ((np.floor(bx) + np.floor(by)) % 2)
    # white margin outside the squares, like a printed target
    img = np.where(inside, checker, 1.0).astype(np.float32)
    return img


def test_chessboard_detection_synthetic():
    # board->image homography: scale + slight perspective + offset
    Hm = np.array([[24.0, 3.0, 60.0],
                   [-2.0, 22.0, 50.0],
                   [1e-4, 2e-4, 1.0]])
    cells = (7, 6)  # squares; interior corners = 6 x 5
    pattern = (6, 5)
    img = _render_board(Hm, (320, 240), cells)
    got = CAL.find_chessboard(img, pattern)
    assert got is not None, "grid not found"
    # ground truth interior corners: board lattice (1..6, 1..5)
    ii, jj = np.meshgrid(np.arange(1, 7), np.arange(1, 6), indexing="xy")
    bp = np.stack([ii.ravel(), jj.ravel(), np.ones(ii.size)], -1)
    proj = bp @ Hm.T
    gt = proj[:, :2] / proj[:, 2:3]
    # match detected to GT greedily (ordering canonicalization may flip)
    d = np.linalg.norm(got[:, None] - gt[None], axis=-1)
    err = d.min(1)
    assert (err < 1.0).all(), f"corner err max {err.max():.2f}px"
    # each GT corner matched exactly once
    assert len(set(d.argmin(1))) == len(gt)


def _synth_views(K, dist, n_views=6, pattern=(8, 6), square=0.03, seed=0):
    rng = np.random.default_rng(seed)
    obj = CAL.chessboard_object_points(pattern, square)
    img_pts, poses = [], []
    fx, fy, cx, cy = K
    for _ in range(n_views):
        rvec = rng.uniform(-0.4, 0.4, 3) + np.array([0.1, 0.1, 0])
        tvec = np.array([
            rng.uniform(-0.05, 0.05) - square * pattern[0] / 2,
            rng.uniform(-0.05, 0.05) - square * pattern[1] / 2,
            rng.uniform(0.4, 0.8)])
        R = np.asarray(T.so3_exp(jnp.asarray(rvec, jnp.float32)))
        pc = obj @ R.T + tvec
        uv = np.asarray(CAL._project_dist(
            jnp.asarray(pc, jnp.float32), fx, fy, cx, cy,
            jnp.asarray(dist, jnp.float32)))
        img_pts.append(uv.astype(np.float32))
        poses.append(np.concatenate([R, tvec[:, None]], 1))
    return obj, img_pts, poses


def test_calibrate_camera_zhang():
    K = (410.0, 400.0, 165.0, 125.0)
    dist = np.array([-0.12, 0.05, 0.001, -0.001, 0.0], np.float32)
    obj, img_pts, _ = _synth_views(K, dist)
    res = CAL.calibrate_camera(obj, img_pts, (320, 240))
    assert res.rms < 0.3, res.rms
    assert abs(float(res.camera.fx) - K[0]) / K[0] < 0.02
    assert abs(float(res.camera.fy) - K[1]) / K[1] < 0.02
    assert abs(float(res.camera.cx) - K[2]) < 6.0
    assert abs(float(res.camera.cy) - K[3]) < 6.0
    assert abs(float(res.camera.dist[0]) - dist[0]) < 0.05


def test_stereo_calibrate():
    K = (380.0, 380.0, 160.0, 120.0)
    dist = np.zeros(5, np.float32)
    obj, left_pts, poses = _synth_views(K, dist, seed=3)
    # right camera: 0.11 m baseline along -x in camera frame
    ext = np.eye(4)
    ext[0, 3] = -0.11
    right_pts = []
    fx, fy, cx, cy = K
    for P in poses:
        pc = obj @ P[:, :3].T + P[:, 3]
        pr = pc @ ext[:3, :3].T + ext[:3, 3]
        uv = np.asarray(CAL._project_dist(
            jnp.asarray(pr, jnp.float32), fx, fy, cx, cy, jnp.asarray(dist)))
        right_pts.append(uv.astype(np.float32))
    res = CAL.stereo_calibrate(obj, left_pts, right_pts, (320, 240))
    assert abs(res.baseline - 0.11) < 0.005, res.baseline
    # rotation ~ identity
    assert np.allclose(res.extrinsics[:3, :3], np.eye(3), atol=0.02)
    assert res.rms < 0.5
