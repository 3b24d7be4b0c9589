"""Monocular odometry: essential bootstrap + landmark-map tracking."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rtabmap_tpu.core.frame import extract_features
from rtabmap_tpu.datasets import synthetic as S
from rtabmap_tpu.geometry import camera as C
from rtabmap_tpu.geometry import transform as T
from rtabmap_tpu.odometry.mono import OdometryMono
from rtabmap_tpu.ops import epipolar as EP
from rtabmap_tpu.utils.metrics import align_umeyama
from rtabmap_tpu.utils.params import Parameters


def test_essential_recovers_known_motion():
    # synthetic calibrated pair with known relative pose
    rng = np.random.default_rng(3)
    n = 256
    X = np.stack([rng.uniform(-2, 2, n), rng.uniform(-1.5, 1.5, n),
                  rng.uniform(3, 8, n)], axis=1).astype(np.float32)
    Rz = T.so3_exp(jnp.asarray([0.02, -0.05, 0.01]))
    t = jnp.asarray([0.3, 0.05, 0.1])
    X2 = (np.asarray(Rz) @ X.T).T + np.asarray(t)
    x1n = jnp.asarray(X[:, :2] / X[:, 2:3])
    x2n = jnp.asarray(X2[:, :2] / X2[:, 2:3])
    T21, inl, Xtri, ok = EP.ransac_essential(
        x1n, x2n, jnp.ones(n, bool), jax.random.PRNGKey(0), threshold=1e-4)
    assert int(jnp.sum(inl)) > 200
    # rotation recovered
    dR = np.asarray(T.rotation(T21)) @ np.asarray(Rz).T
    ang = np.degrees(np.arccos(np.clip((np.trace(dR) - 1) / 2, -1, 1)))
    assert ang < 0.5
    # translation direction recovered (up to the mono scale)
    tn = np.asarray(T.translation(T21))
    tg = np.asarray(t) / np.linalg.norm(np.asarray(t))
    assert abs(float(tn @ tg)) > 0.99
    # triangulated structure matches up to the same scale
    sc = np.linalg.norm(np.asarray(t))
    err = np.linalg.norm(np.asarray(Xtri)[np.asarray(ok)] * sc - X[np.asarray(ok)], axis=1)
    assert np.median(err) < 0.05


def _strafe_trajectory(n, step=0.06, yaw_per_step=0.004):
    """Lateral dolly along x with a slight yaw — a well-posed mono init
    scenario (translation-dominant flow), the regime the reference's
    OdomMono/InitMinFlow gate is designed to wait for."""
    poses = []
    for i in range(n):
        R = np.asarray(T.so3_exp(jnp.asarray([0.0, yaw_per_step * i, 0.0])))
        t = np.array([[step * i], [0.0], [0.0]], np.float32)
        poses.append(np.concatenate([R.astype(np.float32), t], axis=1))
    return jnp.asarray(np.stack(poses))


@pytest.mark.slow
def test_mono_odometry_synthetic_sequence():
    cam = C.CameraModel.make(160.0, 160.0, 79.5, 59.5, 160, 120)
    n = 20
    poses = _strafe_trajectory(n)
    grays, _ = S.render_sequence(poses, cam)
    p = Parameters({"OdomMono/InitMinFlow": 8.0, "Vis/MinInliers": 12})
    odom = OdometryMono(cam, p, seed=0)
    ext = jax.jit(lambda g: extract_features(g, jnp.zeros_like(g), cam, 256))
    est, gt = [], []
    for i in range(n):
        pose, cov, info = odom.process(ext(grays[i]))
        if pose is not None:
            est.append(np.asarray(pose))
            gt.append(np.asarray(poses[i]))
    assert odom.initialized
    assert len(est) >= n // 2
    assert odom.n_landmarks > 50
    # mono is up-to-scale: similarity-align trajectories and check shape
    est_t = np.stack([e[:, 3] for e in est])
    gt_t = np.stack([g[:, 3] for g in gt])
    s, R, t = align_umeyama(jnp.asarray(est_t), jnp.asarray(gt_t), with_scale=True)
    aligned = float(s) * est_t @ np.asarray(R).T + np.asarray(t)
    rmse = float(np.sqrt(np.mean(np.sum((aligned - gt_t) ** 2, axis=1))))
    span = float(np.linalg.norm(gt_t.max(0) - gt_t.min(0)))
    assert rmse < 0.15 * span, (rmse, span)
