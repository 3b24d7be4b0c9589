import jax
import jax.numpy as jnp
import numpy as np

from rtabmap_tpu.geometry import camera as C
from rtabmap_tpu.geometry import transform as T
from rtabmap_tpu.ops import ransac as R


def make_scene(key, n=200, outlier_frac=0.3, noise=0.005):
    k1, k2, k3, k4 = jax.random.split(key, 4)
    pts = jax.random.uniform(k1, (n, 3), minval=-2.0, maxval=2.0) + jnp.array([0.0, 0.0, 5.0])
    gt = T.from_xyzrpy(jnp.array([0.3, -0.1, 0.2, 0.05, -0.03, 0.1]))
    dst = T.apply(gt[None], pts[None])[0]
    dst = dst + noise * jax.random.normal(k2, dst.shape)
    n_out = int(n * outlier_frac)
    out_idx = jnp.arange(n_out)
    dst = dst.at[out_idx].add(jax.random.uniform(k3, (n_out, 3), minval=-3, maxval=3))
    valid = jnp.ones((n,), bool)
    return pts, dst, valid, gt


def test_rigid_exact():
    key = jax.random.PRNGKey(0)
    pts = jax.random.uniform(key, (50, 3), minval=-1, maxval=1)
    gt = T.from_xyzrpy(jnp.array([1.0, 2.0, -0.5, 0.3, 0.2, -0.4]))
    dst = T.apply(gt[None], pts[None])[0]
    est = R.rigid_from_correspondences(pts, dst, jnp.ones((50,)))
    np.testing.assert_allclose(np.asarray(est), np.asarray(gt), atol=1e-5)


def test_ransac_rigid_with_outliers():
    pts, dst, valid, gt = make_scene(jax.random.PRNGKey(1))
    res = jax.jit(lambda s, d, v, k: R.ransac_rigid(s, d, v, k))(
        pts, dst, valid, jax.random.PRNGKey(2)
    )
    assert bool(res.success)
    err = T.se3_log(T.relative(gt, res.transform))
    assert float(jnp.linalg.norm(err)) < 0.02, np.asarray(err)
    assert int(res.num_inliers) > 120


def test_dlt_pnp_exact():
    key = jax.random.PRNGKey(3)
    pts = jax.random.uniform(key, (12, 3), minval=-2, maxval=2) + jnp.array([0.0, 0.0, 6.0])
    gt_wc = T.from_xyzrpy(jnp.array([0.2, 0.1, -0.3, 0.1, -0.05, 0.2]))  # camera in world
    Tcw = T.inverse(gt_wc)
    pc = T.apply(Tcw[None], pts[None])[0]
    xn = pc[:, :2] / pc[:, 2:3]
    est = R._dlt_pnp(pts, xn)
    err = T.se3_log(T.relative(Tcw, est))
    assert float(jnp.linalg.norm(err)) < 1e-3, np.asarray(err)


def test_ransac_pnp_with_outliers():
    cam = C.CameraModel.make(525.0, 525.0, 319.5, 239.5, 640, 480)
    key = jax.random.PRNGKey(4)
    k1, k2, k3 = jax.random.split(key, 3)
    n = 300
    pts = jax.random.uniform(k1, (n, 3), minval=-3, maxval=3) + jnp.array([0.0, 0.0, 8.0])
    gt_wc = T.from_xyzrpy(jnp.array([0.15, -0.1, 0.3, 0.04, 0.08, -0.05]))
    pc = T.apply(T.inverse(gt_wc)[None], pts[None])[0]
    uv, z = C.project(pc, cam)
    uv = uv + 0.5 * jax.random.normal(k2, uv.shape)
    n_out = 90
    uv = uv.at[:n_out].add(jax.random.uniform(k3, (n_out, 2), minval=-80, maxval=80))
    valid = (z > 0) & C.in_image(uv, 640, 480)
    res = jax.jit(
        lambda p, u, v, k: R.ransac_pnp(p, u, v, cam, k, reproj_px=3.0)
    )(pts, uv, valid, jax.random.PRNGKey(5))
    assert bool(res.success), int(res.num_inliers)
    err = T.se3_log(T.relative(gt_wc, res.transform))
    assert float(jnp.linalg.norm(err)) < 0.02, np.asarray(err)
    # outlier slots should mostly be rejected
    assert float(res.inliers[:n_out].mean()) < 0.3


def test_ransac_pnp_with_guess():
    cam = C.CameraModel.make(525.0, 525.0, 319.5, 239.5, 640, 480)
    key = jax.random.PRNGKey(6)
    pts = jax.random.uniform(key, (100, 3), minval=-2, maxval=2) + jnp.array([0.0, 0.0, 5.0])
    gt_wc = T.from_xyzrpy(jnp.array([0.05, 0.02, 0.1, 0.01, 0.02, -0.01]))
    pc = T.apply(T.inverse(gt_wc)[None], pts[None])[0]
    uv, z = C.project(pc, cam)
    valid = z > 0
    res = R.ransac_pnp(pts, uv, valid, cam, jax.random.PRNGKey(7), iters=32,
                       guess=T.identity())
    err = T.se3_log(T.relative(gt_wc, res.transform))
    assert float(jnp.linalg.norm(err)) < 5e-3
