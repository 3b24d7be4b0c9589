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


def test_gravity_alignment_merges_rp_keeps_yaw():
    from rtabmap_tpu.geometry import transform as T
    from rtabmap_tpu.odometry.imu_filter import apply_gravity_alignment

    pose = T.from_xyzrpy(jnp.asarray([1.0, 2.0, 3.0, 0.1, -0.05, 0.7]))
    imu_q = T.to_quaternion(T.from_xyzrpy(jnp.asarray([0, 0, 0, 0.02, 0.03, 1.5])))
    out = np.asarray(T.to_xyzrpy(apply_gravity_alignment(pose, imu_q)))
    np.testing.assert_allclose(out[:3], [1.0, 2.0, 3.0], atol=1e-5)
    np.testing.assert_allclose(out[3], 0.02, atol=1e-5)   # roll from IMU
    np.testing.assert_allclose(out[4], 0.03, atol=1e-5)   # pitch from IMU
    np.testing.assert_allclose(out[5], 0.7, atol=1e-5)    # yaw kept


def test_f2f_accepts_imu_quat():
    from rtabmap_tpu.core.frame import extract_features
    from rtabmap_tpu.datasets import synthetic as S
    from rtabmap_tpu.geometry import camera as C
    from rtabmap_tpu.geometry import transform as T
    from rtabmap_tpu.odometry.f2f import OdometryF2F

    cam = C.CameraModel.make(160.0, 160.0, 79.5, 59.5, 160, 120)
    poses = S.loop_trajectory(64)[:3]
    grays, depths = S.render_sequence(poses, cam)
    ext = jax.jit(lambda g, d: extract_features(g, d, cam, 256))
    odom = OdometryF2F(cam)
    q_id = jnp.asarray([0.0, 0.0, 0.0, 1.0])
    odom.process(ext(grays[0], depths[0]), imu_quat=q_id)
    pose, cov, info = odom.process(ext(grays[1], depths[1]), imu_quat=q_id)
    assert pose is not None
    # identity IMU forces roll/pitch to 0 while translation/yaw survive
    rpy = np.asarray(T.to_xyzrpy(pose))
    np.testing.assert_allclose(rpy[3], 0.0, atol=1e-5)
    np.testing.assert_allclose(rpy[4], 0.0, atol=1e-5)
