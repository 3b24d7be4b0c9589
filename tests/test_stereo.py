"""Stereo: LK sparse disparity + dense BM on a synthetic rectified pair."""
import jax
import jax.numpy as jnp
import numpy as np

from rtabmap_tpu.datasets import synthetic as S
from rtabmap_tpu.geometry import camera as C
from rtabmap_tpu.geometry import transform as T
from rtabmap_tpu.core.frame import extract_features
from rtabmap_tpu.ops import stereo as ST

CAM = C.CameraModel.make(300.0, 300.0, 160.0, 120.0, 320, 240)
BASELINE = 0.1
STEREO = C.StereoCameraModel.make(300.0, 300.0, 160.0, 120.0, BASELINE, 320, 240)


def render_pair():
    pose_l = S.loop_trajectory(64)[0]
    shift = T.from_xyzrpy(jnp.array([BASELINE, 0, 0, 0, 0, 0]))
    pose_r = T.compose(pose_l, shift)  # right camera offset along +x
    gl, dl = S.render(pose_l, CAM)
    gr, _ = S.render(pose_r, CAM)
    return gl, gr, dl


def test_lk_stereo_matches_depth():
    gl, gr, dl = render_pair()
    fr_kps, _ = jax.jit(lambda g: __import__('rtabmap_tpu.ops.features', fromlist=['x']).detect_and_describe(g, 256))(gl)
    disp, ok = ST.lk_stereo_disparity(gl, gr, fr_kps.uv, fr_kps.valid)
    assert int(ok.sum()) > 80
    depth_est = C.disparity_to_depth(disp, STEREO)
    from rtabmap_tpu.ops import image as im
    depth_gt = im.bilinear_sample(dl, fr_kps.uv)
    rel_err = np.abs(np.asarray(depth_est) - np.asarray(depth_gt)) / np.asarray(depth_gt)
    rel_err = rel_err[np.asarray(ok)]
    assert np.median(rel_err) < 0.03, np.median(rel_err)


def test_stereo_3d_keypoints():
    gl, gr, dl = render_pair()
    from rtabmap_tpu.ops import features as F
    kps, desc = F.detect_and_describe(gl, 256)
    pts, ok = ST.keypoints_3d_from_stereo(kps.uv, kps.valid, gl, gr, STEREO)
    # compare against depth-derived 3D
    pts_d, ok_d = F.keypoints_3d_from_depth(kps, dl, CAM)
    both = np.asarray(ok & ok_d)
    err = np.linalg.norm(np.asarray(pts) - np.asarray(pts_d), axis=-1)[both]
    assert both.sum() > 60
    assert np.median(err) < 0.08, np.median(err)


def test_dense_bm_reasonable():
    gl, gr, dl = render_pair()
    disp = ST.dense_bm_disparity(gl, gr, max_disparity=48)
    gt_disp = np.asarray(C.depth_to_disparity(dl, STEREO))
    d = np.asarray(disp)
    mask = d > 0
    assert mask.mean() > 0.3
    err = np.abs(d - gt_disp)[mask]
    assert np.median(err) < 1.5, np.median(err)


def test_dense_sgbm_disparity():
    from rtabmap_tpu.ops.stereo import dense_sgbm_disparity

    rng = np.random.default_rng(0)
    H, W, true_d = 48, 96, 7
    left = rng.random((H, W)).astype(np.float32)
    right = np.roll(left, -true_d, axis=1)  # uniform disparity scene
    disp = np.asarray(dense_sgbm_disparity(jnp.asarray(left), jnp.asarray(right),
                                           max_disparity=16))
    v = disp > 0
    inner = v[:, 20:-4]
    assert inner.mean() > 0.5
    err = np.abs(disp[:, 20:-4][inner] - true_d)
    assert np.median(err) < 0.6


def test_sgbm_smooths_weak_texture():
    from rtabmap_tpu.ops.stereo import dense_bm_disparity, dense_sgbm_disparity

    rng = np.random.default_rng(1)
    H, W, true_d = 48, 96, 5
    # strong texture only on sparse rows: BM is ambiguous between them,
    # SGM's smoothness term propagates the correct disparity
    left = 0.02 * rng.random((H, W)).astype(np.float32)
    left[::6] += rng.random((len(range(0, H, 6)), W)).astype(np.float32)
    right = np.roll(left, -true_d, axis=1)
    sg = np.asarray(dense_sgbm_disparity(jnp.asarray(left), jnp.asarray(right),
                                         max_disparity=16))
    vs = sg > 0
    acc_sg = (np.abs(sg[:, 20:-4] - true_d)[vs[:, 20:-4]] < 1.0).mean()
    assert acc_sg > 0.7
