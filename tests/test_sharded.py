"""Multi-device sharding on the virtual 8-CPU mesh."""
import jax
import jax.numpy as jnp
import numpy as np

from rtabmap_tpu.parallel import sharded as SH
from rtabmap_tpu.ops import matching as M


def test_sharded_knn_matches_single_device():
    key = jax.random.PRNGKey(0)
    W, Q = 1024, 64
    slab = jnp.where(jax.random.bernoulli(key, 0.5, (W, 256)), 1, -1).astype(jnp.int8)
    query = slab[jnp.arange(Q) * 3]  # exact copies -> distance 0 expected
    valid = jnp.arange(W) < 900
    mesh = SH.make_mesh(8)
    d_sh, i_sh = SH.sharded_knn2(mesh, query, slab, valid)
    d_ref, i_ref = M.knn_blocked(query, slab, k=2, block=256, base_valid=valid)
    np.testing.assert_allclose(np.asarray(d_sh), np.asarray(d_ref), atol=1e-3)
    np.testing.assert_array_equal(np.asarray(i_sh[:, 0]), np.asarray(i_ref[:, 0]))


def test_sharded_tfidf_matches_single_device():
    from rtabmap_tpu.vocab.dictionary import tfidf_likelihood

    W, N, K = 512, 64, 32
    rng = np.random.RandomState(0)
    node_words = rng.randint(-1, W, (N, K)).astype(np.int32)
    node_valid = rng.rand(N) > 0.2
    query = rng.randint(0, W, (K,)).astype(np.int32)
    word_nw = rng.randint(0, 10, (W,)).astype(np.float32)
    mesh = SH.make_mesh(8)
    lik_sh = SH.sharded_tfidf(
        mesh, jnp.asarray(query), jnp.asarray(node_words), jnp.asarray(node_valid),
        jnp.asarray(word_nw), jnp.float32(N), W,
    )
    lik_ref = tfidf_likelihood(
        jnp.asarray(query), jnp.asarray(node_words), jnp.asarray(node_valid),
        jnp.asarray(word_nw), jnp.float32(N), W,
    )
    np.testing.assert_allclose(np.asarray(lik_sh), np.asarray(lik_ref), rtol=1e-5)


import pytest


@pytest.mark.slow
def test_sharded_pcg_step_improves_chi2():
    import sys, os
    sys.path.insert(0, os.path.dirname(__file__))
    from test_pose_graph import make_noisy_loop
    from rtabmap_tpu.optim import pose_graph as PG

    g, gt = make_noisy_loop(n=31)  # 31 edges + pad to 32
    E = g.edges_from.shape[0]
    pad = 32 - E
    ef = jnp.concatenate([g.edges_from, jnp.zeros((pad,), jnp.int32)])
    et = jnp.concatenate([g.edges_to, jnp.zeros((pad,), jnp.int32)])
    meas = jnp.concatenate([g.edges_meas, jnp.tile(jnp.eye(3, 4)[None], (pad, 1, 1))])
    info = jnp.concatenate([g.edges_info, jnp.tile(jnp.eye(6)[None], (pad, 1, 1))])
    ev = jnp.concatenate([jnp.ones((E,)), jnp.zeros((pad,))])
    mesh = SH.make_mesh(8)
    poses = g.poses
    chi0 = float(PG.graph_chi2(g))
    step = jax.jit(lambda p: SH.sharded_pcg_step(mesh, p, ef, et, meas, info, ev,
                                                 root=0, cg_iters=24))
    for _ in range(3):
        poses = step(poses)
    chi1 = float(PG.graph_chi2(g._replace(poses=poses)))
    assert chi1 < chi0 * 0.2, (chi0, chi1)


def test_sharded_ba_step_matches_single_device_reduction():
    """Distributed BA step (observations sharded over 8 devices) must reduce
    reprojection cost on a synthetic noisy problem, and leave fixed cameras
    untouched."""
    from rtabmap_tpu.optim import ba as BA
    from rtabmap_tpu.geometry import transform as T

    rng = np.random.RandomState(3)
    Nc, Np = 4, 24
    pts = rng.rand(Np, 3).astype(np.float32) * 2 - 1 + np.array([0, 0, 4.0])
    poses_gt = np.stack([
        np.asarray(T.from_xyzrpy(jnp.asarray([0.3 * c, 0.0, 0.0, 0, 0, 0])))
        for c in range(Nc)
    ])
    ci = np.repeat(np.arange(Nc), Np).astype(np.int32)
    pi = np.tile(np.arange(Np), Nc).astype(np.int32)

    def project(Tcw, p):
        pc = Tcw[:, :3] @ p + Tcw[:, 3]
        return pc[:2] / pc[2]

    uv = np.stack([project(poses_gt[c], pts[p]) for c, p in zip(ci, pi)])
    # perturb
    poses0 = poses_gt.copy()
    poses0[1:, :, 3] += rng.randn(Nc - 1, 3) * 0.02
    pts0 = pts + rng.randn(Np, 3).astype(np.float32) * 0.02
    fixed = np.zeros((Nc,), bool)
    fixed[0] = True

    prob = BA.BAProblem(
        poses=jnp.asarray(poses0), points=jnp.asarray(pts0),
        cam_idx=jnp.asarray(ci), pt_idx=jnp.asarray(pi),
        uv=jnp.asarray(uv, jnp.float32), valid=jnp.ones((Nc * Np,), bool),
        fixed_cams=jnp.asarray(fixed),
    )

    def cost(poses, points):
        r, _, _, _ = jax.vmap(BA._residual_jac)(
            poses[prob.cam_idx], points[prob.pt_idx], prob.uv)
        return float(jnp.sum(r * r))

    mesh = SH.make_mesh(8)
    poses, points = prob.poses, prob.points
    c0 = cost(poses, points)
    for _ in range(5):
        poses, points = SH.sharded_ba_step(
            mesh, poses, points, prob.cam_idx, prob.pt_idx, prob.uv,
            prob.valid, prob.fixed_cams, damping=1e-4)
    c1 = cost(poses, points)
    assert c1 < c0 * 0.05, (c0, c1)
    np.testing.assert_allclose(np.asarray(poses[0]), poses0[0], atol=1e-6)


def test_sharded_vo_fleet():
    from rtabmap_tpu.datasets import synthetic as S
    from rtabmap_tpu.geometry import camera as C
    from rtabmap_tpu.geometry import transform as T

    cam = C.CameraModel.make(160.0, 160.0, 79.5, 59.5, 160, 120)
    poses = S.loop_trajectory(96)[:2]
    grays, depths = S.render_sequence(poses, cam)
    B = 8  # one stream per virtual device
    ga = jnp.tile(grays[0][None], (B, 1, 1))
    da = jnp.tile(depths[0][None], (B, 1, 1))
    gb = jnp.tile(grays[1][None], (B, 1, 1))
    db = jnp.tile(depths[1][None], (B, 1, 1))
    keys = jax.random.split(jax.random.PRNGKey(0), B)
    mesh = SH.make_mesh(8)
    out_poses, n_inl = SH.sharded_vo_step(mesh, ga, da, gb, db, keys, cam,
                                          max_kp=256)
    assert out_poses.shape == (B, 3, 4)
    assert np.asarray(n_inl).min() >= 12
    # every stream recovers (roughly) the same relative motion as GT
    rel_gt = np.asarray(T.relative(poses[0], poses[1]))
    for b in range(B):
        err = np.linalg.norm(np.asarray(out_poses[b])[:, 3] - rel_gt[:, 3])
        assert err < 0.05, (b, err)


def test_multihost_meshes_single_process():
    """multihost helpers degrade gracefully to 1 process / N virtual
    devices; sharded kernels accept the resulting meshes."""
    import numpy as np
    import jax.numpy as jnp
    from rtabmap_tpu.parallel import multihost as MH
    from rtabmap_tpu.parallel.sharded import sharded_knn2

    info = MH.process_info()
    assert info["process_count"] == 1 and info["global_devices"] == 8
    mesh = MH.global_mesh()
    assert mesh.shape["shard"] == 8
    m2 = MH.slice_mesh()
    assert m2.shape["dp"] == 1 and m2.shape["shard"] == 8

    rng = np.random.RandomState(0)
    slab = jnp.asarray(np.where(rng.rand(64, 32) > 0.5, 1, -1), jnp.int8)
    d, i = sharded_knn2(mesh, slab[:8], slab, jnp.ones(64, bool))
    assert (np.asarray(i)[:, 0] == np.arange(8)).all()  # self-match


def test_sharded_ba_large_matches_single_device():
    """Implicit-Schur distributed BA step == local bundle_adjust_large's
    first step (obs axis sharded over the mesh)."""
    import numpy as np
    import jax.numpy as jnp
    from rtabmap_tpu.optim.ba import BAProblem, bundle_adjust_large
    from rtabmap_tpu.parallel.sharded import make_mesh, sharded_ba_large_step

    rng = np.random.RandomState(1)
    Nc, Np, No = 4, 64, 64 * 8
    pts = (rng.randn(Np, 3) + np.array([0, 0, 5])).astype(np.float32)
    poses = np.tile(np.eye(3, 4, dtype=np.float32), (Nc, 1, 1))
    poses[:, 0, 3] = np.linspace(0, 0.3, Nc)
    ci = rng.randint(0, Nc, No).astype(np.int32)
    pi = rng.randint(0, Np, No).astype(np.int32)
    pc = pts[pi].copy()
    pc[:, 0] -= poses[ci][:, 0, 3]
    uv = (pc[:, :2] / pc[:, 2:3] + 0.002 * rng.randn(No, 2)).astype(np.float32)
    noisy = pts + 0.02 * rng.randn(Np, 3).astype(np.float32)
    fixed = jnp.zeros((Nc,), bool).at[0].set(True)

    mesh = make_mesh(8)
    sp, spt = sharded_ba_large_step(
        mesh, jnp.asarray(poses), jnp.asarray(noisy), jnp.asarray(ci),
        jnp.asarray(pi), jnp.asarray(uv), jnp.ones((No,), bool), fixed)
    prob = BAProblem(jnp.asarray(poses), jnp.asarray(noisy),
                     jnp.asarray(ci), jnp.asarray(pi), jnp.asarray(uv),
                     jnp.ones(No, bool), fixed)
    lp, _ = bundle_adjust_large(prob, iters=1, cg_iters=20)
    # same normal equations -> same update (up to CG tolerance)
    assert np.abs(np.asarray(sp) - np.asarray(lp.poses)).max() < 5e-4
    assert np.abs(np.asarray(spt) - np.asarray(lp.points)).max() < 5e-3
