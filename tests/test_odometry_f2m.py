"""F2M odometry over a short synthetic arc: drift must stay small."""
import jax
import numpy as np

from rtabmap_tpu.geometry import camera as C
from rtabmap_tpu.datasets import synthetic as S
from rtabmap_tpu.core.frame import extract_features
from rtabmap_tpu.odometry.f2m import OdometryF2M
from rtabmap_tpu.utils import metrics

CAM = C.CameraModel.make(300.0, 300.0, 160.0, 120.0, 320, 240)


def test_f2m_short_arc():
    n_total, n_used = 64, 12
    poses = S.loop_trajectory(n_total)[:n_used]
    extract = jax.jit(lambda g, d: extract_features(g, d, CAM, 384))
    odom = OdometryF2M(CAM)
    est = []
    for i in range(n_used):
        g, d = S.render(poses[i], CAM)
        pose, cov, info = odom.process(extract(g, d))
        assert pose is not None, f"lost at {i}: {info}"
        est.append(np.asarray(pose))
    ate = metrics.ate_rmse(np.stack(est), np.asarray(poses))
    assert ate < 0.05, ate


def test_metrics_identity():
    poses = np.asarray(S.loop_trajectory(16))
    assert metrics.ate_rmse(poses, poses) < 1e-6
    t, r = metrics.rpe(poses, poses)
    assert t < 1e-6 and r < 1e-5


def test_metrics_alignment_invariance():
    import jax.numpy as jnp
    from rtabmap_tpu.geometry import transform as T

    poses = S.loop_trajectory(16)
    offset = T.from_xyzrpy(jnp.array([5.0, -2.0, 1.0, 0.3, 0.1, -0.7]))
    moved = jnp.stack([T.compose(offset, poses[i]) for i in range(16)])
    # ATE is invariant to a global rigid transform of the whole trajectory
    assert metrics.ate_rmse(np.asarray(moved), np.asarray(poses)) < 1e-5
