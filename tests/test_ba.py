"""Bundle adjustment: noisy cameras+points must converge to GT."""
import jax
import jax.numpy as jnp
import numpy as np

from rtabmap_tpu.geometry import transform as T
from rtabmap_tpu.optim import ba as BA


def make_problem(key, nc=6, npts=120, noise_pose=0.05, noise_pt=0.05, px_noise=0.0):
    ks = jax.random.split(key, 6)
    pts_gt = jax.random.uniform(ks[0], (npts, 3), minval=-3, maxval=3) + jnp.array([0, 0, 8.0])
    poses_gt = []
    for i in range(nc):
        poses_gt.append(T.from_xyzrpy(jnp.array([0.4 * i, 0.1 * (i % 2), 0.0, 0.0, 0.02 * i, 0.0])))
    poses_gt = jnp.stack(poses_gt)  # camera-in-world... use as world->cam directly

    cam_idx = jnp.repeat(jnp.arange(nc, dtype=jnp.int32), npts)
    pt_idx = jnp.tile(jnp.arange(npts, dtype=jnp.int32), nc)
    pc = jax.vmap(lambda Tc: T.apply(Tc[None], pts_gt[None])[0])(poses_gt)
    z = pc[..., 2]
    uv = (pc[..., :2] / z[..., None]).reshape(-1, 2)
    if px_noise > 0:
        uv = uv + px_noise * jax.random.normal(ks[1], uv.shape)
    valid = (z.reshape(-1) > 0.1)

    poses0 = jax.vmap(T.retract)(poses_gt, noise_pose * jax.random.normal(ks[2], (nc, 6)))
    # fix cams 0 AND 1 at GT: anchors both the frame and the scale gauge
    # (monocular BA with one anchor has free global scale)
    poses0 = poses0.at[0].set(poses_gt[0]).at[1].set(poses_gt[1])
    pts0 = pts_gt + noise_pt * jax.random.normal(ks[3], (npts, 3))
    fixed = jnp.zeros((nc,), bool).at[0].set(True).at[1].set(True)
    prob = BA.BAProblem(poses0, pts0, cam_idx, pt_idx, uv, valid, fixed)
    return prob, poses_gt, pts_gt


def test_ba_converges_to_gt():
    prob, poses_gt, pts_gt = make_problem(jax.random.PRNGKey(0))
    out, cost = BA.bundle_adjust(prob, iters=12, huber=1.0)
    pose_err = jnp.linalg.norm(
        jax.vmap(lambda a, b: T.se3_log(T.relative(a, b)))(out.poses, poses_gt), axis=-1)
    assert float(pose_err.max()) < 5e-3, np.asarray(pose_err)
    # scale-consistent point recovery
    pt_err = jnp.linalg.norm(out.points - pts_gt, axis=-1)
    assert float(jnp.median(pt_err)) < 1e-2
    assert float(cost) < 1e-4


def test_ba_outlier_mask():
    prob, poses_gt, pts_gt = make_problem(jax.random.PRNGKey(1))
    # corrupt 20 observations
    uv = prob.uv.at[:20].add(0.5)
    prob = prob._replace(uv=uv)
    out, _ = BA.bundle_adjust(prob, iters=12, huber=0.01)
    mask = BA.outlier_mask(out, reproj_thr=0.05)
    assert float(mask[:20].mean()) > 0.8      # corrupted flagged
    assert float(mask[20:].mean()) < 0.05     # clean kept


def test_large_ba_matches_dense():
    """Implicit-Schur CG BA converges to the dense solution on a small
    problem (then scales where dense cannot — global BA path)."""
    import jax.numpy as jnp
    import numpy as np

    from rtabmap_tpu.geometry import transform as T
    from rtabmap_tpu.optim.ba import (BAProblem, bundle_adjust,
                                      bundle_adjust_large)

    rng = np.random.RandomState(0)
    Nc, Np, No = 6, 120, 600
    pts = (rng.randn(Np, 3) * 0.8 + np.array([0, 0, 5])).astype(np.float32)
    poses = np.tile(np.eye(3, 4, dtype=np.float32), (Nc, 1, 1))
    poses[:, 0, 3] = np.linspace(0, 0.5, Nc)
    ci = rng.randint(0, Nc, No).astype(np.int32)
    pi = rng.randint(0, Np, No).astype(np.int32)
    pc = pts[pi].copy()
    pc[:, 0] -= poses[ci][:, 0, 3]
    uv = (pc[:, :2] / pc[:, 2:3]).astype(np.float32)
    # perturb
    noisy_pts = pts + 0.02 * rng.randn(Np, 3).astype(np.float32)
    noisy_poses = poses.copy()
    noisy_poses[1:, :3, 3] += 0.01 * rng.randn(Nc - 1, 3).astype(np.float32)
    prob = BAProblem(jnp.asarray(noisy_poses), jnp.asarray(noisy_pts),
                     jnp.asarray(ci), jnp.asarray(pi), jnp.asarray(uv),
                     jnp.ones(No, bool), jnp.zeros(Nc, bool).at[0].set(True))
    dense, cd = bundle_adjust(prob, iters=8)
    large, cl = bundle_adjust_large(prob, iters=8, cg_iters=40)
    assert float(cl) < 0.3 * float(
        np.sum((uv - np.asarray(prob.uv)) ** 2) + 1e-9) or float(cl) < 1e-4
    # both reach comparable cost and similar camera trajectories
    assert float(cl) < 2.0 * float(cd) + 1e-6
    d_t = np.abs(np.asarray(dense.poses)[:, :, 3]
                 - np.asarray(large.poses)[:, :, 3]).max()
    assert d_t < 5e-3, d_t
