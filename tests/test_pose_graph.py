"""Pose-graph optimizer: odometry chain + loop closure must correct drift."""
import jax
import jax.numpy as jnp
import numpy as np

from rtabmap_tpu.geometry import transform as T
from rtabmap_tpu.optim import pose_graph as PG


def make_noisy_loop(n=30, drift=0.03, key=jax.random.PRNGKey(0)):
    """Ground truth: circle. Odometry: GT relative motions + noise (drift).
    One loop-closure edge last->first with the TRUE relative motion."""
    import numpy as onp

    gt = []
    for i in range(n):
        a = 2 * onp.pi * i / n
        gt.append(
            onp.asarray(
                T.from_xyzrpy(
                    jnp.array([onp.cos(a), onp.sin(a), 0.0, 0.0, 0.0, a + onp.pi / 2])
                )
            )
        )
    gt = jnp.asarray(onp.stack(gt))

    keys = jax.random.split(key, n)
    odom_meas = []
    for i in range(n - 1):
        rel = T.relative(gt[i], gt[i + 1])
        noise = T.se3_exp(drift * jax.random.normal(keys[i], (6,)) * jnp.array([1, 1, 1, 0.3, 0.3, 0.3]))
        odom_meas.append(T.compose(rel, noise))
    # integrate noisy odometry for the initial guess
    poses = [gt[0]]
    for m in odom_meas:
        poses.append(T.compose(poses[-1], m))
    poses = jnp.stack(poses)

    ef = list(range(n - 1)) + [n - 1]
    et = list(range(1, n)) + [0]
    meas = odom_meas + [T.relative(gt[n - 1], gt[0])]
    # information = 1/sigma^2 of the actual measurement noise (reference
    # convention: links carry their registration covariance)
    info = [jnp.eye(6) / drift ** 2] * (n - 1) + [jnp.eye(6) / 0.01 ** 2]
    g = PG.make_graph(
        poses, jnp.array(ef), jnp.array(et), jnp.stack(meas), jnp.stack(info)
    )
    return g, gt


def _ate(poses, gt):
    return float(jnp.sqrt(jnp.mean(jnp.sum((T.translation(poses) - T.translation(gt)) ** 2, -1))))


def test_dense_corrects_loop():
    g, gt = make_noisy_loop()
    before = _ate(g.poses, gt)
    out, chi2 = PG.optimize_dense(g, iters=15)
    after = _ate(out.poses, gt)
    assert after < before * 0.65, (before, after)
    assert after < 0.09, after
    assert float(chi2) < float(PG.graph_chi2(g))


def test_pcg_matches_dense():
    g, gt = make_noisy_loop()
    out_d, _ = PG.optimize_dense(g, iters=15)
    out_p, _ = PG.optimize_pcg(g, iters=15, cg_iters=80)
    d = _ate(out_d.poses, gt)
    p = _ate(out_p.poses, gt)
    assert abs(d - p) < 0.03, (d, p)


def test_max_error_gate_flags_bad_closure():
    """The reference accepts a new closure only if post-optimization link
    errors stay under RGBD/OptimizeMaxError sigma (Rtabmap.cpp:5385 gate).
    Reproduce: a wrong closure must blow up the per-link error ratio."""
    g, gt = make_noisy_loop()
    out_good, _ = PG.optimize_dense(g, iters=15)
    lin_good, ang_good = PG.edge_errors(out_good)

    bad_meas = T.from_xyzrpy(jnp.array([2.0, 2.0, 1.0, 0.5, 0.5, 0.5]))
    g2 = g._replace(
        edges_from=jnp.concatenate([g.edges_from, jnp.array([5], jnp.int32)]),
        edges_to=jnp.concatenate([g.edges_to, jnp.array([20], jnp.int32)]),
        edges_meas=jnp.concatenate([g.edges_meas, bad_meas[None]]),
        edges_info=jnp.concatenate([g.edges_info, (jnp.eye(6) / 0.01 ** 2)[None]]),
        edge_valid=jnp.concatenate([g.edge_valid, jnp.array([True])]),
    )
    out_bad, _ = PG.optimize_dense(g2, iters=15)
    lin_bad, ang_bad = PG.edge_errors(out_bad)
    # gate semantics (RGBD/OptimizeMaxError=3): good graph stays under the
    # 3-sigma ratio, the wrong closure pushes some link far beyond it
    assert float(jnp.max(lin_good)) < 3.0
    assert float(jnp.maximum(jnp.max(lin_bad), jnp.max(ang_bad))) > 3.0

    # robust (Huber) optimization must ALSO keep the trajectory closer to GT
    out_robust, _ = PG.optimize_dense(g2, iters=15, robust=True, huber_delta=3.0)
    assert _ate(out_robust.poses, gt) <= _ate(out_bad.poses, gt) + 1e-6


def test_edge_validity_mask():
    g, gt = make_noisy_loop()
    # invalidate the loop closure -> optimization should NOT correct drift
    g2 = g._replace(edge_valid=g.edge_valid.at[-1].set(False))
    out, _ = PG.optimize_dense(g2, iters=10)
    # without the closure the chain stays near its noisy init
    assert _ate(out.poses, gt) > 0.5 * _ate(g.poses, gt)


def test_dcs_switchable_constraints_disable_outlier_closure():
    """Vertigo parity (Optimizer/Robust): with a wrong loop closure marked
    switchable, DCS must drive its weight to ~0 so the solution stays close
    to the all-good-edges optimum (reference OptimizerG2O.cpp:859)."""
    g, gt = make_noisy_loop()
    bad_meas = T.from_xyzrpy(jnp.array([2.0, 2.0, 1.0, 0.5, 0.5, 0.5]))
    g2 = g._replace(
        edges_from=jnp.concatenate([g.edges_from, jnp.array([5], jnp.int32)]),
        edges_to=jnp.concatenate([g.edges_to, jnp.array([20], jnp.int32)]),
        edges_meas=jnp.concatenate([g.edges_meas, bad_meas[None]]),
        edges_info=jnp.concatenate([g.edges_info, (jnp.eye(6) / 0.01 ** 2)[None]]),
        edge_valid=jnp.concatenate([g.edge_valid, jnp.array([True])]),
    )
    # only the two closure edges (true last->first + the outlier) switchable
    E = g2.edges_from.shape[0]
    switch = jnp.zeros((E,), bool).at[-1].set(True).at[-2].set(True)

    out_plain, _ = PG.optimize_dense(g2, iters=15)
    out_dcs, _ = PG.optimize_dense(g2, iters=15, switch_mask=switch, dcs_phi=1.0)
    out_ref, _ = PG.optimize_dense(g, iters=15)  # without the outlier

    ate_plain, ate_dcs, ate_ref = (_ate(out_plain.poses, gt),
                                   _ate(out_dcs.poses, gt),
                                   _ate(out_ref.poses, gt))
    assert ate_dcs < ate_plain * 0.5, (ate_plain, ate_dcs)
    assert ate_dcs < ate_ref + 0.05, (ate_dcs, ate_ref)

    # the GOOD closure must survive switching (still corrects drift)
    assert ate_dcs < _ate(g.poses, gt) * 0.65

    # PCG path agrees
    out_pcg, _ = PG.optimize_pcg(g2, iters=15, cg_iters=80,
                                 switch_mask=switch, dcs_phi=1.0)
    assert abs(_ate(out_pcg.poses, gt) - ate_dcs) < 0.05


def test_gps_xyz_priors_pull_drifted_chain():
    """Unary xyz priors (GPS role) must correct a drifting open chain —
    no loop closure, just absolute position fixes on every 5th node."""
    import numpy as onp
    from rtabmap_tpu.optim import pose_graph as PG

    g, gt = make_noisy_loop(n=24, drift=0.05)
    # drop the loop-closure edge: keep only odometry
    E = g.edges_from.shape[0]
    edge_valid = jnp.asarray(onp.arange(E) < E - 1)
    pr = list(range(0, 24, 3))
    pr_idx = jnp.asarray(onp.asarray(pr, onp.int32))
    pr_meas = gt[pr_idx]
    inf6 = onp.zeros((len(pr), 6, 6), onp.float32)
    inf6[:, :3, :3] = onp.eye(3) * 100.0  # xyz-only information (GPS)
    gp = g._replace(edge_valid=edge_valid,
                    priors_idx=pr_idx,
                    priors_meas=jnp.asarray(pr_meas),
                    priors_info=jnp.asarray(inf6),
                    prior_valid=jnp.ones((len(pr),), bool))

    def ate(poses):
        return float(jnp.sqrt(jnp.mean(jnp.sum(
            (poses[:, :, 3] - gt[:, :, 3]) ** 2, -1))))

    before = ate(gp.poses)
    out, _ = PG.optimize_dense(gp, iters=25)
    after = ate(out.poses)
    assert after < before * 0.5, (before, after)
    # and the PCG path agrees
    out2, _ = PG.optimize_pcg(gp, iters=15, cg_iters=48)
    assert ate(out2.poses) < before * 0.5, (before, ate(out2.poses))


def test_gravity_priors_level_roll_pitch():
    """Rotation-block priors (gravity role) must level a tilted chain."""
    import numpy as onp
    from rtabmap_tpu.optim import pose_graph as PG

    n = 8
    poses = onp.stack([
        onp.asarray(T.from_xyzrpy(jnp.array([i * 1.0, 0, 0, 0.3, -0.2, 0.0])))
        for i in range(n)])
    meas = onp.stack([
        onp.asarray(T.relative(jnp.asarray(poses[i]), jnp.asarray(poses[i + 1])))
        for i in range(n - 1)])
    level = onp.stack([
        onp.asarray(T.from_xyzrpy(jnp.array([i * 1.0, 0, 0, 0, 0, 0.0])))
        for i in range(n)])
    inf6 = onp.zeros((n, 6, 6), onp.float32)
    inf6[:, 3:5, 3:5] = onp.eye(2) * 50.0  # roll/pitch only
    g = PG.make_graph(
        jnp.asarray(poses), jnp.arange(n - 1), jnp.arange(1, n),
        jnp.asarray(meas),
        priors_idx=jnp.arange(n), priors_meas=jnp.asarray(level),
        priors_info=jnp.asarray(inf6))
    out, _ = PG.optimize_dense(g, iters=20)
    rpy = onp.stack([onp.asarray(T.to_xyzrpy(out.poses[i])) for i in range(n)])
    # node 0 is the gauge-fixed root (clamped, like the reference's
    # fixed first pose) — only free nodes must level
    assert onp.abs(rpy[1:, 3:5]).max() < 0.05, rpy[:, 3:5]


def test_lm_two_session_merge_extreme_information_spread():
    """Pin the round-4 LM rewrite: a 500-node two-session merge whose edge
    information spans 1e-6..1e8 produced NaN poses under plain fixed-damping
    GN (float32 Cholesky breakdown -> the engine discarded the closure).
    True LM with step acceptance must stay finite and actually merge the
    sessions (inter-session closures satisfied)."""
    import numpy as onp

    n = 250  # per session
    key = jax.random.PRNGKey(7)
    # session 1: straight line in x; session 2: parallel line offset in y,
    # but INITIALIZED with a large bogus offset (unmerged sessions start at
    # odometry frames far from the closure-consistent configuration)
    gt = onp.zeros((2 * n, 3, 4), onp.float32)
    gt[:, :, :3] = onp.eye(3)
    gt[:n, 0, 3] = onp.arange(n) * 0.1
    gt[n:, 0, 3] = onp.arange(n) * 0.1
    gt[n:, 1, 3] = 0.5
    init = gt.copy()
    init[n:, 0, 3] += 5.0   # second session far from truth
    init[n:, 1, 3] += 3.0

    ef, et, meas, info = [], [], [], []
    rel = onp.eye(3, 4, dtype=onp.float32)
    rel[0, 3] = 0.1
    for s in range(2):
        for i in range(n - 1):
            ef.append(s * n + i)
            et.append(s * n + i + 1)
            meas.append(rel)
            # extreme information spread: alternate overconfident
            # (post-reset style 1e8) and mature (1e2) odometry edges
            info.append(onp.eye(6, dtype=onp.float32) *
                        (1e8 if i % 7 == 0 else 1e2))
    # inter-session closures every 25 nodes with true relative pose
    for i in range(0, n, 25):
        ef.append(i)
        et.append(n + i)
        m = onp.eye(3, 4, dtype=onp.float32)
        m[1, 3] = 0.5
        meas.append(m)
        info.append(onp.eye(6, dtype=onp.float32) * 1e4)
    # a couple of deliberately weak edges (1e-6) exercising the low end
    for i in (3, 150):
        ef.append(i)
        et.append(i + 1)
        meas.append(rel)
        info.append(onp.eye(6, dtype=onp.float32) * 1e-6)

    g = PG.make_graph(
        jnp.asarray(init), jnp.asarray(onp.array(ef, onp.int32)),
        jnp.asarray(onp.array(et, onp.int32)),
        jnp.asarray(onp.stack(meas)), jnp.asarray(onp.stack(info)))
    out, chi2 = PG.optimize(g, iters=24)
    poses = np.asarray(out.poses)
    assert np.all(np.isfinite(poses)), "LM produced non-finite poses"
    assert np.isfinite(float(chi2))
    # sessions actually merged: closure edges satisfied to centimetres at
    # every closure-constrained node (the free tail past the last closure
    # converges slower under PCG and is not part of the regression)
    sess2 = poses[250:]
    dy = sess2[:, 1, 3] - poses[:250, 1, 3]
    closure_nodes = np.arange(0, 250, 25)
    assert np.all(np.abs(dy[closure_nodes] - 0.5) < 0.05), dy[closure_nodes]
    assert np.all(np.abs(dy - 0.5) < 0.15), (dy.min(), dy.max())


def test_lm_rejected_steps_do_not_burn_dcs_anneal():
    """The graduated-non-convexity schedule must be driven by the
    ACCEPTED-step count, not the raw iteration index: rejected LM
    iterations (n_acc frozen) leave phi at its current level instead of
    exhausting the anneal before any drift is corrected."""
    # schedule pinned: phi stays at phi0 while no step is accepted ...
    assert float(PG._dcs_phi_schedule(1e4, 1.0, jnp.float32(0.0), 15)) == 1e4
    # ... decays only with accepted steps, reaching dcs_phi at iters-1
    mid = float(PG._dcs_phi_schedule(1e4, 1.0, jnp.float32(7.0), 15))
    assert 1.0 < mid < 1e4
    assert abs(float(PG._dcs_phi_schedule(1e4, 1.0, jnp.float32(14.0), 15)) - 1.0) < 1e-3
    # and overshooting accepted count clamps at dcs_phi
    assert abs(float(PG._dcs_phi_schedule(1e4, 1.0, jnp.float32(99.0), 15)) - 1.0) < 1e-3

    # behavioral: a sluggish start (large initial lambda -> tiny early
    # steps) still ends with the good closure active and drift corrected
    g, gt = make_noisy_loop()
    E = g.edges_from.shape[0]
    switch = jnp.zeros((E,), bool).at[-1].set(True)
    out, _ = PG.optimize_dense(g, iters=15, damping=1.0,
                               switch_mask=switch, dcs_phi=1.0)
    ate = _ate(out.poses, gt)
    assert ate < _ate(g.poses, gt) * 0.65, ate
