"""F2F odometry + Kalman/particle motion filters."""
import jax
import jax.numpy as jnp
import numpy as np

from rtabmap_tpu.geometry import camera as C
from rtabmap_tpu.datasets import synthetic as S
from rtabmap_tpu.core.frame import extract_features
from rtabmap_tpu.odometry.f2f import OdometryF2F
from rtabmap_tpu.odometry import motion_filter as MF
from rtabmap_tpu.utils import metrics

CAM = C.CameraModel.make(300.0, 300.0, 160.0, 120.0, 320, 240)


def test_f2f_short_arc():
    n = 10
    poses = S.loop_trajectory(64)[:n]
    extract = jax.jit(lambda g, d: extract_features(g, d, CAM, 384))
    odom = OdometryF2F(CAM)
    est = []
    for i in range(n):
        g, d = S.render(poses[i], CAM)
        pose, cov, info = odom.process(extract(g, d))
        assert pose is not None, f"lost at {i}: {info}"
        est.append(np.asarray(pose))
    ate = metrics.ate_rmse(np.stack(est), np.asarray(poses))
    assert ate < 0.06, ate


def test_kalman_constant_velocity():
    st = MF.init_kalman()
    dt = 0.1
    true_v = np.array([1.0, 0.0, 0.0, 0.0, 0.0, 0.2])
    rng = np.random.RandomState(0)
    for k in range(50):
        st = MF.kalman_predict(st, dt, q=0.01)
        meas = true_v * (k + 1) * dt + 0.01 * rng.randn(6)
        st = MF.kalman_update(st, jnp.asarray(meas, jnp.float32), jnp.eye(6) * 1e-4)
    v = np.asarray(MF.predicted_velocity(st))
    np.testing.assert_allclose(v, true_v, atol=0.08)
    # prediction ahead should extrapolate
    st2 = MF.kalman_predict(st, dt, q=0.01)
    np.testing.assert_allclose(np.asarray(st2.x[:6]), true_v * 51 * dt, atol=0.05)


def test_particle_filter_tracks():
    key = jax.random.PRNGKey(0)
    st = MF.init_particles(key, n=500, dim=2, sigma=0.5)
    rng = np.random.RandomState(1)
    target = np.array([0.3, -0.2])
    est = None
    for k in range(30):
        key, sub = jax.random.split(key)
        meas = target + 0.05 * rng.randn(2)
        st, est = MF.particle_step(st, jnp.asarray(meas, jnp.float32), sub)
    np.testing.assert_allclose(np.asarray(est), target, atol=0.08)
