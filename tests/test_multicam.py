"""Multi-camera rig registration."""
import jax
import jax.numpy as jnp
import numpy as np

from rtabmap_tpu.geometry import camera as C
from rtabmap_tpu.geometry import transform as T
from rtabmap_tpu.ops.multicam import Rig, ransac_pnp_rig, rig_residuals


def _rig():
    cam = C.CameraModel.make(200.0, 200.0, 99.5, 74.5, 200, 150)
    front = np.eye(3, 4, dtype=np.float32)
    # side camera: yaw 90 deg, offset 0.2m in body +x
    side = np.asarray(T.from_xyzrpy(jnp.asarray([0.2, 0.0, 0.0, 0.0, np.pi / 2, 0.0])),
                      np.float32)
    return Rig.make([cam, cam], [front, side])


def test_rig_pose_recovery():
    rng = np.random.default_rng(0)
    rig = _rig()
    n_per = 120
    # world landmarks in front of each camera for a body at a known pose
    T_wb = np.asarray(T.from_xyzrpy(jnp.asarray([0.5, -0.2, 0.3, 0.03, -0.05, 0.4])),
                      np.float32)
    pts_w, uv, ci, body3d = [], [], [], []
    for c in range(2):
        extr = np.asarray(rig.extrinsics[c])
        # points 2-5m in front of camera c
        pc = np.stack([rng.uniform(-1, 1, n_per), rng.uniform(-0.7, 0.7, n_per),
                       rng.uniform(2, 5, n_per)], 1).astype(np.float32)
        u = pc[:, 0] / pc[:, 2] * 200 + 99.5
        v = pc[:, 1] / pc[:, 2] * 200 + 74.5
        pb = pc @ extr[:, :3].T + extr[:, 3]          # camera -> body
        pw = pb @ T_wb[:, :3].T + T_wb[:, 3]          # body -> world
        pts_w.append(pw)
        uv.append(np.stack([u, v], 1))
        ci.append(np.full(n_per, c, np.int32))
        body3d.append(pb)
    pts_w = jnp.asarray(np.concatenate(pts_w))
    uv = jnp.asarray(np.concatenate(uv).astype(np.float32))
    ci = jnp.asarray(np.concatenate(ci))
    body3d = jnp.asarray(np.concatenate(body3d))
    valid = jnp.ones((2 * n_per,), bool)

    # sanity: residuals at the true pose are zero
    r, d = rig_residuals(jnp.asarray(T_wb), pts_w,
                         jnp.stack([(uv[:, 0] - 99.5) / 200, (uv[:, 1] - 74.5) / 200], -1),
                         ci, rig)
    assert float(jnp.max(jnp.abs(r))) < 1e-4 and float(jnp.min(d)) > 0

    res = ransac_pnp_rig(pts_w, uv, ci, valid, rig, body3d,
                         jax.random.PRNGKey(0))
    assert bool(res.success)
    assert int(res.num_inliers) > 200
    got = np.asarray(res.transform)
    assert np.linalg.norm(got[:, 3] - T_wb[:, 3]) < 0.02
    dR = got[:, :3] @ T_wb[:, :3].T
    ang = np.degrees(np.arccos(np.clip((np.trace(dR) - 1) / 2, -1, 1)))
    assert ang < 0.5


def test_rig_outlier_robustness():
    rng = np.random.default_rng(1)
    rig = _rig()
    T_wb = np.eye(3, 4, dtype=np.float32)
    n = 160
    pc = np.stack([rng.uniform(-1, 1, n), rng.uniform(-0.7, 0.7, n),
                   rng.uniform(2, 5, n)], 1).astype(np.float32)
    u = pc[:, 0] / pc[:, 2] * 200 + 99.5
    v = pc[:, 1] / pc[:, 2] * 200 + 74.5
    uv = np.stack([u, v], 1).astype(np.float32)
    # corrupt 30% of pixels
    bad = rng.random(n) < 0.3
    uv[bad] += rng.uniform(20, 60, (bad.sum(), 2))
    res = ransac_pnp_rig(jnp.asarray(pc), jnp.asarray(uv),
                         jnp.zeros(n, jnp.int32), jnp.ones(n, bool), rig,
                         jnp.asarray(pc), jax.random.PRNGKey(2))
    assert bool(res.success)
    got = np.asarray(res.transform)
    assert np.linalg.norm(got[:, 3]) < 0.02
