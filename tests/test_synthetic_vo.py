"""End-to-end single-step VO on the synthetic world."""
import jax
import jax.numpy as jnp
import numpy as np

from rtabmap_tpu.geometry import camera as C
from rtabmap_tpu.geometry import transform as T
from rtabmap_tpu.datasets import synthetic as S
from rtabmap_tpu.ops import features as F, matching as M, ransac as R

CAM = C.CameraModel.make(300.0, 300.0, 160.0, 120.0, 320, 240)


def test_render_sane():
    poses = S.loop_trajectory(8)
    g, d = S.render(poses[0], CAM)
    assert g.shape == (240, 320) and d.shape == (240, 320)
    assert float(d.min()) >= 0.0
    assert float((d > 0).mean()) > 0.99
    # texture has contrast
    assert float(g.std()) > 0.05


def test_vo_step_pnp():
    poses = S.loop_trajectory(64)
    detect = jax.jit(lambda g: F.detect_and_describe(g, 300))
    g0, d0 = S.render(poses[0], CAM)
    g1, d1 = S.render(poses[1], CAM)
    kp0, ds0 = detect(g0)
    kp1, ds1 = detect(g1)
    p0, ok0 = F.keypoints_3d_from_depth(kp0, d0, CAM)
    p1, ok1 = F.keypoints_3d_from_depth(kp1, d1, CAM)
    w0 = T.apply(poses[0][None], p0[None])[0]
    m = M.match_mutual_nndr(ds1, kp1.valid & ok1, ds0, kp0.valid & ok0, nndr=0.8)
    assert int(m.valid.sum()) > 50
    res = R.ransac_pnp(w0[m.idx], kp1.uv, m.valid, CAM, jax.random.PRNGKey(0),
                       reproj_px=3.0, pts3d_query=p1)
    assert bool(res.success)
    err = float(jnp.linalg.norm(T.se3_log(T.relative(poses[1], res.transform))))
    assert err < 0.02, err
