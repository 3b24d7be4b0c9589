"""IMU orientation filters + epipolar geometry."""
import jax
import jax.numpy as jnp
import numpy as np

from rtabmap_tpu.geometry import camera as C
from rtabmap_tpu.geometry import transform as T
from rtabmap_tpu.odometry import imu_filter as IMU
from rtabmap_tpu.ops import epipolar as EP


def test_madgwick_converges_to_gravity():
    # body tilted 20 deg about x; static accel measures gravity in body frame
    n = 400
    dt = jnp.full((n,), 0.01)
    gyro = jnp.zeros((n, 3))
    roll = 0.35
    g_body = jnp.array([0.0, np.sin(roll), np.cos(roll)]) * 9.81
    accel = jnp.tile(g_body, (n, 1))
    qs = IMU.integrate_imu(gyro, accel, dt, method="madgwick", beta=0.2)
    rpy = np.asarray(T.to_xyzrpy(T.from_quaternion(qs[-1])))
    assert abs(rpy[3] - roll) < 0.03, rpy


def test_complementary_tracks_gyro():
    # constant yaw rate, gravity along z
    n = 200
    dt = jnp.full((n,), 0.01)
    rate = 0.5
    gyro = jnp.tile(jnp.array([0.0, 0.0, rate]), (n, 1))
    accel = jnp.tile(jnp.array([0.0, 0.0, 9.81]), (n, 1))
    qs = IMU.integrate_imu(gyro, accel, dt, method="complementary")
    rpy = np.asarray(T.to_xyzrpy(T.from_quaternion(qs[-1])))
    assert abs(rpy[5] - rate * n * 0.01) < 0.05, rpy


def test_gravity_correction_removes_yaw():
    q = np.asarray(T.to_quaternion(T.from_xyzrpy(jnp.array([0, 0, 0, 0.2, 0.1, 1.3]))))
    R = IMU.gravity_aligned_correction(jnp.asarray(q))
    rpy = np.asarray(T.to_xyzrpy(R))
    assert abs(rpy[5]) < 1e-5
    assert abs(rpy[3] - 0.2) < 1e-4 and abs(rpy[4] - 0.1) < 1e-4


def test_fundamental_ransac_and_check():
    cam = C.CameraModel.make(400.0, 400.0, 320.0, 240.0, 640, 480)
    key = jax.random.PRNGKey(0)
    k1, k2, k3 = jax.random.split(key, 3)
    pts = jax.random.uniform(k1, (200, 3), minval=-3, maxval=3) + jnp.array([0, 0, 6.0])
    pose_b = T.from_xyzrpy(jnp.array([0.5, 0.1, 0.2, 0.05, 0.1, 0.02]))
    uv_a, za = C.project(pts, cam)
    pb = T.apply(T.inverse(pose_b)[None], pts[None])[0]
    uv_b, zb = C.project(pb, cam)
    uv_b = uv_b + 0.3 * jax.random.normal(k2, uv_b.shape)
    valid = (za > 0) & (zb > 0)
    # corrupt 30%
    uv_b = uv_b.at[:60].add(jax.random.uniform(k3, (60, 2), minval=-100, maxval=100))
    ok, F, inl = EP.check_hypothesis(uv_a, uv_b, valid, jax.random.PRNGKey(1))
    assert bool(ok)
    assert float(inl[60:].mean()) > 0.8
    assert float(inl[:60].mean()) < 0.3

    # random correspondences must NOT verify
    uv_rand = jax.random.uniform(k3, uv_b.shape, minval=0, maxval=640)
    ok2, _, _ = EP.check_hypothesis(uv_a, uv_rand, valid, jax.random.PRNGKey(2))
    assert not bool(ok2)
