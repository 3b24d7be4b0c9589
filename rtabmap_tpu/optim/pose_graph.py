"""SE(3) pose-graph optimization: batched Gauss-Newton / LM in pure JAX.

Capability parity: the reference's ``Optimizer`` backends
(/root/reference/corelib/src/optimizer/OptimizerG2O.cpp:219 ``optimize``,
OptimizerGTSAM.cpp:139 — SE3 pose graphs with 6x6 edge information
matrices, robust Huber kernels, prior/gravity factors, fixed root gauge,
warm-started incremental re-optimization). Instead of wrapping g2o/GTSAM,
the solver is built TPU-first:

- residuals + exact per-edge Jacobians are vmapped over the edge slab
  (autodiff of the SE(3) residual at the linearization point),
- the normal system is assembled as dense (6N,6N) for small graphs (one
  Cholesky on the MXU) or solved matrix-free with preconditioned conjugate
  gradient whose Hx product is a gather/scatter over edges — no sparse
  matrix format needed,
- iterations run under ``lax.scan`` with Levenberg damping; all shapes
  static, fully jittable, differentiable end-to-end.
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from rtabmap_tpu.geometry import transform as T


class PoseGraph(NamedTuple):
    """Fixed-capacity pose graph slab.

    Unary prior factors (P entries, may be 0-length) cover the reference's
    absolute-pose constraints: GPS position priors (information only in the
    xyz block — OptimizerG2O.cpp:634-685 XYZ prior edges) and gravity /
    IMU-orientation priors (information in the rotation block —
    g2o/edge_se3_gravity.h). Residual: log(meas^-1 * T_i)."""

    poses: jnp.ndarray       # (N,3,4)
    node_valid: jnp.ndarray  # (N,)
    edges_from: jnp.ndarray  # (E,) int32
    edges_to: jnp.ndarray    # (E,) int32
    edges_meas: jnp.ndarray  # (E,3,4) T_from_to measurement
    edges_info: jnp.ndarray  # (E,6,6) information matrices
    edge_valid: jnp.ndarray  # (E,)
    root: jnp.ndarray        # () int32 gauge-fixed node
    priors_idx: jnp.ndarray = jnp.zeros((0,), jnp.int32)   # (P,) node ids
    priors_meas: jnp.ndarray = jnp.zeros((0, 3, 4), jnp.float32)  # (P,3,4)
    priors_info: jnp.ndarray = jnp.zeros((0, 6, 6), jnp.float32)  # (P,6,6)
    prior_valid: jnp.ndarray = jnp.zeros((0,), bool)        # (P,)


def make_graph(poses, edges_from, edges_to, edges_meas, edges_info=None,
               node_valid=None, edge_valid=None, root=0,
               priors_idx=None, priors_meas=None, priors_info=None,
               prior_valid=None) -> PoseGraph:
    E = edges_from.shape[0]
    N = poses.shape[0]
    if edges_info is None:
        edges_info = jnp.broadcast_to(jnp.eye(6), (E, 6, 6))
    if node_valid is None:
        node_valid = jnp.ones((N,), bool)
    if edge_valid is None:
        edge_valid = jnp.ones((E,), bool)
    P = 0 if priors_idx is None else len(priors_idx)
    if priors_idx is None:
        priors_idx = jnp.zeros((0,), jnp.int32)
        priors_meas = jnp.zeros((0, 3, 4), jnp.float32)
        priors_info = jnp.zeros((0, 6, 6), jnp.float32)
    if prior_valid is None:
        prior_valid = jnp.ones((P,), bool)
    return PoseGraph(
        poses=jnp.asarray(poses, jnp.float32),
        node_valid=node_valid,
        edges_from=jnp.asarray(edges_from, jnp.int32),
        edges_to=jnp.asarray(edges_to, jnp.int32),
        edges_meas=jnp.asarray(edges_meas, jnp.float32),
        edges_info=jnp.asarray(edges_info, jnp.float32),
        edge_valid=edge_valid,
        root=jnp.asarray(root, jnp.int32),
        priors_idx=jnp.asarray(priors_idx, jnp.int32),
        priors_meas=jnp.asarray(priors_meas, jnp.float32),
        priors_info=jnp.asarray(priors_info, jnp.float32),
        prior_valid=jnp.asarray(prior_valid, bool),
    )


# ----------------------------------------------------------------- residuals


def _edge_residual(pose_i, pose_j, meas):
    """r = log(meas^-1 * (pose_i^-1 * pose_j)) — (6,)."""
    return T.se3_log(T.compose(T.inverse(meas), T.relative(pose_i, pose_j)))


def _edge_residual_jac(pose_i, pose_j, meas):
    """Residual + exact Jacobians wrt right-perturbations of pose_i/pose_j."""

    def f(xi, xj):
        return _edge_residual(T.retract(pose_i, xi), T.retract(pose_j, xj), meas)

    z = jnp.zeros((6,))
    r = f(z, z)
    Ji = jax.jacfwd(f, argnums=0)(z, z)
    Jj = jax.jacfwd(f, argnums=1)(z, z)
    return r, Ji, Jj


def _prior_residual_jac(pose, meas):
    """Unary absolute-pose residual log(meas^-1 * T) + exact Jacobian wrt a
    right-perturbation of T (GPS / gravity / pose-prior factors)."""

    def f(xi):
        p = T.retract(pose, xi)
        return T.se3_log(T.compose(T.inverse(meas), p))

    z = jnp.zeros((6,))
    return f(z), jax.jacfwd(f)(z)


def _prior_blocks(g: PoseGraph, poses):
    """(P,6) residuals, (P,6,6) H blocks, (P,6) b contributions."""
    rp, Jp = jax.vmap(_prior_residual_jac)(poses[g.priors_idx], g.priors_meas)
    info = g.priors_info * g.prior_valid[:, None, None]
    JtI = jnp.einsum("pki,pkl->pil", Jp, info)
    return rp, jnp.einsum("pil,plj->pij", JtI, Jp), jnp.einsum("pil,pl->pi", JtI, rp)


def graph_residuals(g: PoseGraph):
    """(E,6) residuals (invalid edges zeroed)."""
    r = jax.vmap(_edge_residual)(g.poses[g.edges_from], g.poses[g.edges_to], g.edges_meas)
    return jnp.where(g.edge_valid[:, None], r, 0.0)


def graph_chi2(g: PoseGraph):
    r = graph_residuals(g)
    chi2 = jnp.sum(jnp.einsum("ei,eij,ej->e", r, g.edges_info, r))
    if g.priors_idx.shape[0] > 0:
        rp, _ = jax.vmap(_prior_residual_jac)(g.poses[g.priors_idx], g.priors_meas)
        info = g.priors_info * g.prior_valid[:, None, None]
        chi2 = chi2 + jnp.sum(jnp.einsum("pi,pij,pj->p", rp, info, rp))
    return chi2


def edge_errors(g: PoseGraph):
    """Per-edge error ratios matching graph::computeMaxGraphErrors
    (/root/reference/corelib/src/Graph.cpp:937): linear = max |component
    diff| between optimized relative pose and the link measurement over the
    link's translational stddev; angular = geodesic angle over rotational
    stddev. Link variance = max diagonal covariance (1/min info diag).

    Returns (lin_ratio (E,), ang_ratio (E,)).
    """
    rel = jax.vmap(T.relative)(g.poses[g.edges_from], g.poses[g.edges_to])
    dt = jnp.abs(T.translation(rel) - T.translation(g.edges_meas))
    lin_err = jnp.max(dt, axis=-1)
    dR = jax.vmap(lambda a, b: T.rotation_angle(T.compose(T.inverse(a), b)))(
        g.edges_meas, rel
    )
    diag = jnp.diagonal(g.edges_info, axis1=-2, axis2=-1)
    trans_std = jnp.sqrt(1.0 / jnp.maximum(jnp.min(diag[:, :3], axis=-1), 1e-12))
    rot_std = jnp.sqrt(1.0 / jnp.maximum(jnp.min(diag[:, 3:], axis=-1), 1e-12))
    lin_ratio = jnp.where(g.edge_valid, lin_err / trans_std, 0.0)
    ang_ratio = jnp.where(g.edge_valid, dR / rot_std, 0.0)
    return lin_ratio, ang_ratio


@jax.jit
def solve_diagnostics(g: PoseGraph):
    """Post-solve edge diagnostics in ONE jitted dispatch: the per-edge
    error ratios (edge_errors), the worst absolute linear/angular edge
    deviations and their edge indices. Eagerly these were ~20 small op
    compiles PER PADDING BUCKET (each a leaked XLA:CPU executable — the
    long-run map-count blowup), and ~20 device round trips per closure
    tick through the TPU tunnel."""
    lin_ratio, ang_ratio = edge_errors(g)
    rel = jax.vmap(T.relative)(g.poses[g.edges_from], g.poses[g.edges_to])
    dlin = jnp.max(jnp.abs(T.translation(rel) - T.translation(g.edges_meas)),
                   axis=-1)
    dang = jax.vmap(lambda a, b: T.rotation_angle(
        T.compose(T.inverse(a), b)))(g.edges_meas, rel)
    k_lin = jnp.argmax(jnp.where(g.edge_valid, dlin, -1.0))
    k_ang = jnp.argmax(jnp.where(g.edge_valid, dang, -1.0))
    max_err = jnp.maximum(jnp.max(lin_ratio), jnp.max(ang_ratio))
    return (max_err, jnp.max(ang_ratio), dlin[k_lin], dang[k_ang],
            k_lin, k_ang)


# ------------------------------------------------------------------- solvers


# DCS switch target: an edge is "satisfied" when its Mahalanobis chi2 is at
# noise level. For a correctly-weighted 6-DOF link E[chi2] = 6; the 99%
# chi-square(6) quantile 16.81 keeps calibrated closures fully ON (s=1)
# while an actual outlier (chi2 orders of magnitude higher) is still
# crushed quadratically. phi=1 (the DCS paper scalar default) switched off
# GOOD closures whose information came from mm-level inlier residuals
# (chi2 ~ 10 at convergence), and the OptimizeMaxError gate then rejected
# them — Optimizer/Robust silently disabled loop closing.
DCS_PHI_DEFAULT = 16.81


def _robust_cost(g: PoseGraph, poses, robust: bool, huber_delta: float,
                 switch_mask, phi):
    """The actual robust objective the LM step minimizes — used for step
    acceptance. With plain least squares this is graph_chi2; with Huber it
    is the Huber rho; with DCS switchable edges the saturating kernel
    min(chi2, phi) (the closed-form s**2*chi2 + phi*(1-s)**2 of Agarwal et
    al. evaluates to exactly min(chi2, phi)). Accepting steps on the RAW
    chi2 instead broke Optimizer/Robust: a step that moves the solution
    away from an outlier closure raises that edge's raw chi2 and was
    rejected, so wrong loop closures could never be switched off."""
    gg = g._replace(poses=poses)
    r = graph_residuals(gg)
    chi2_e = jnp.einsum("ei,eij,ej->e", r, g.edges_info, r)
    if robust:
        m = jnp.sqrt(jnp.maximum(chi2_e, 1e-12))
        rho = jnp.where(m <= huber_delta, chi2_e,
                        huber_delta * (2.0 * m - huber_delta))
    else:
        rho = chi2_e
    if switch_mask is not None:
        rho = jnp.where(switch_mask, jnp.minimum(rho, phi), rho)
    cost = jnp.sum(rho * g.edge_valid)
    if g.priors_idx.shape[0] > 0:
        rp, _ = jax.vmap(_prior_residual_jac)(poses[g.priors_idx],
                                              g.priors_meas)
        info = g.priors_info * g.prior_valid[:, None, None]
        cost = cost + jnp.sum(jnp.einsum("pi,pij,pj->p", rp, info, rp))
    return cost


def _dcs_phi0(g: PoseGraph, switch_mask, dcs_phi: float):
    """Data-driven anneal start: the median chi2 of the switchable edges at
    the initial poses (x2 headroom so the median edge starts fully ON,
    s=1).  A fixed 1e4*phi start was actively harmful: when an outlier
    closure carries high information, phi >> its chi2 leaves it with
    enough residual weight to out-pull the odometry chain's series
    stiffness, the early solve walks into the outlier's basin, its chi2
    drops below every later phi level, and DCS never switches it off.
    Anchoring phi0 to the switchable-chi2 median (standard <=50%-outlier
    assumption) keeps drift-consistent closures on while crushing
    outliers' weight quadratically from the very first iteration."""
    r0 = graph_residuals(g)
    chi0_e = jnp.einsum("ei,eij,ej->e", r0, g.edges_info, r0)
    # only UNSATISFIED switchable edges (chi2 > target phi) inform the
    # anneal start: already-satisfied closures have s=1 at ANY phi >=
    # their chi2, so they cannot be hurt by a large phi0 — but in a
    # warm-started graph they'd drag the median to ~0 and every NEW
    # closure (large chi2 against the drifted estimate) would be treated
    # as an outlier from iteration one.
    sw = switch_mask & g.edge_valid & (chi0_e > dcs_phi)
    n_sw = jnp.sum(sw)
    vals = jnp.sort(jnp.where(sw, chi0_e, jnp.inf))
    med = vals[jnp.clip((n_sw - 1) // 2, 0, vals.shape[0] - 1)]
    med = jnp.where(n_sw > 0, med, dcs_phi)
    return jnp.maximum(jnp.float32(dcs_phi), 2.0 * med)


def _dcs_phi_schedule(phi0, dcs_phi: float, n_acc, iters: int):
    """Graduated non-convexity: geometric anneal phi0 -> dcs_phi, driven by
    the ACCEPTED-step count (a rejected LM iteration must not burn the
    anneal: with the raw iteration index a few rejections exhausted the
    schedule before any drift was corrected and good closures with
    still-large residuals were switched off)."""
    frac = jnp.clip(1.0 - n_acc / max(iters - 1, 1), 0.0, 1.0)
    return dcs_phi * (phi0 / dcs_phi) ** frac


def _huber_weights(r, info, delta: float):
    """Per-edge robust reweighting factor (Huber on mahalanobis norm)."""
    m = jnp.sqrt(jnp.maximum(jnp.einsum("ei,eij,ej->e", r, info, r), 1e-12))
    return jnp.where(m <= delta, 1.0, delta / m)


def _dcs_weights(r, info, switch_mask, phi):
    """Dynamic covariance scaling on switchable edges — the closed-form
    equivalent of Vertigo's switchable loop-closure constraints (the
    reference's Optimizer/Robust mode, OptimizerG2O.cpp:859 vertigo
    EdgeSE3Switchable; DCS: Agarwal et al., ICRA 2013). An edge whose chi²
    exceeds Φ is smoothly switched off: s = min(1, 2Φ/(Φ+χ²)), applied as
    s² on the information matrix. Odometry edges (switch_mask=False) are
    never scaled."""
    chi2 = jnp.einsum("ei,eij,ej->e", r, info, r)
    s = jnp.minimum(1.0, 2.0 * phi / (phi + chi2))
    return jnp.where(switch_mask, jnp.maximum(s * s, 1e-6), 1.0)


def _assemble_dense(g: PoseGraph, r, Ji, Jj, w, damping):
    N = g.poses.shape[0]
    H = jnp.zeros((N, 6, N, 6))
    b = jnp.zeros((N, 6))
    info_w = g.edges_info * (w * g.edge_valid)[:, None, None]
    JiT_O = jnp.einsum("eki,ekl->eil", Ji, info_w)
    JjT_O = jnp.einsum("eki,ekl->eil", Jj, info_w)
    Hii = jnp.einsum("eil,elj->eij", JiT_O, Ji)
    Hij = jnp.einsum("eil,elj->eij", JiT_O, Jj)
    Hjj = jnp.einsum("eil,elj->eij", JjT_O, Jj)
    bi = jnp.einsum("eil,el->ei", JiT_O, r)
    bj = jnp.einsum("eil,el->ei", JjT_O, r)
    f, t = g.edges_from, g.edges_to
    H = H.at[f, :, f, :].add(Hii)
    H = H.at[f, :, t, :].add(Hij)
    H = H.at[t, :, f, :].add(jnp.swapaxes(Hij, -1, -2))
    H = H.at[t, :, t, :].add(Hjj)
    b = b.at[f].add(bi)
    b = b.at[t].add(bj)
    if g.priors_idx.shape[0] > 0:  # unary GPS/gravity/pose priors
        rp, Hp, bp = _prior_blocks(g, g.poses)
        pi = g.priors_idx
        H = H.at[pi, :, pi, :].add(Hp)
        b = b.at[pi].add(bp)
    H = H.reshape(6 * N, 6 * N)
    b = b.reshape(6 * N)
    # gauge: clamp the root node with a strong prior; free invalid nodes get
    # identity blocks so the system stays SPD
    root_mask = jnp.zeros((N,)).at[g.root].set(1.0)
    fix = (root_mask + (~g.node_valid)).astype(jnp.float32)
    diag_boost = jnp.repeat(fix, 6) * 1e8 + damping
    H = H + jnp.diag(diag_boost + 1e-8)
    return H, b


@partial(jax.jit, static_argnames=("iters", "robust"))
def optimize_dense(g: PoseGraph, iters: int = 20, damping: float = 1e-4,
                   robust: bool = False, huber_delta: float = 1.0,
                   switch_mask: Optional[jnp.ndarray] = None,
                   dcs_phi: float = DCS_PHI_DEFAULT) -> Tuple[PoseGraph, jnp.ndarray]:
    """LM with dense Cholesky — for graphs up to ~500 nodes.

    True Levenberg-Marquardt: scale-invariant damping (λ·diag H) with
    step acceptance — a step that raises chi² (or yields non-finite
    values, e.g. a float32 Cholesky breakdown on a system whose
    information spans 1e-6..1e8) is REJECTED and λ raised, so the solve
    can never diverge from a far init (plain GN with fixed damping
    produced NaN poses on a 500-node two-session merge; the engine then
    discarded the closure).  ``damping`` is the initial λ.

    Returns (optimized graph, final chi2).
    """
    N = g.poses.shape[0]

    def step(carry, _):
        poses, lam, n_acc = carry
        gg = g._replace(poses=poses)
        r, Ji, Jj = jax.vmap(_edge_residual_jac)(
            poses[g.edges_from], poses[g.edges_to], g.edges_meas
        )
        w = _huber_weights(r, g.edges_info, huber_delta) if robust else jnp.ones(r.shape[0])
        phi_k = None
        if switch_mask is not None:
            # graduated non-convexity: anneal Φ down so good closures
            # aren't switched off before drift is corrected
            phi_k = _dcs_phi_schedule(phi0, dcs_phi, n_acc, iters)
            w = w * _dcs_weights(r, g.edges_info, switch_mask, phi_k)
        H, b = _assemble_dense(gg, r, Ji, Jj, w, 0.0)
        dH = jnp.maximum(jnp.diagonal(H), 1e-8)
        Hd = H + jnp.diag(lam * dH)
        dx = -jax.scipy.linalg.cho_solve(jax.scipy.linalg.cho_factor(Hd), b)
        dx = dx.reshape(N, 6)
        dx = jnp.where(g.node_valid[:, None], dx, 0.0)
        # trust region: cap the step to keep log/exp well-behaved
        nrm = jnp.linalg.norm(dx, axis=-1, keepdims=True)
        dx = dx * jnp.minimum(1.0, 1.0 / jnp.maximum(nrm, 1e-9))
        cand = T.retract(poses, dx)
        # accept/reject on the ROBUST objective at this iteration's phi
        cur = _robust_cost(g, poses, robust, huber_delta, switch_mask, phi_k)
        new = _robust_cost(g, cand, robust, huber_delta, switch_mask, phi_k)
        ok = jnp.isfinite(new) & (new <= cur)
        poses = jnp.where(ok, cand, poses)
        lam = jnp.where(ok, jnp.maximum(lam / 3.0, 1e-9),
                        jnp.minimum(lam * 10.0, 1e8))
        return (poses, lam, n_acc + ok.astype(jnp.float32)), None

    phi0 = _dcs_phi0(g, switch_mask, dcs_phi) if switch_mask is not None else None
    (poses, _, _), _ = jax.lax.scan(
        step, (g.poses, jnp.float32(damping), jnp.float32(0.0)), None,
        length=iters)
    out = g._replace(poses=poses)
    return out, graph_chi2(out)


def _hx_product(g: PoseGraph, Ji, Jj, info_w, x, fix_diag):
    """Matrix-free H @ x via edge gather/scatter. x (N,6)."""
    xi = x[g.edges_from]
    xj = x[g.edges_to]
    yi = jnp.einsum("eij,ej->ei", Ji, xi) + jnp.einsum("eij,ej->ei", Jj, xj)
    oy = jnp.einsum("eij,ej->ei", info_w, yi)
    out = jnp.zeros_like(x)
    out = out.at[g.edges_from].add(jnp.einsum("eji,ej->ei", Ji, oy))
    out = out.at[g.edges_to].add(jnp.einsum("eji,ej->ei", Jj, oy))
    damp = fix_diag[:, None] if fix_diag.ndim == 1 else fix_diag
    return out + damp * x


@partial(jax.jit, static_argnames=("iters", "cg_iters", "robust"))
def optimize_pcg(g: PoseGraph, iters: int = 15, cg_iters: int = 60,
                 damping: float = 1e-4, robust: bool = False,
                 huber_delta: float = 1.0,
                 switch_mask: Optional[jnp.ndarray] = None,
                 dcs_phi: float = DCS_PHI_DEFAULT) -> Tuple[PoseGraph, jnp.ndarray]:
    """GN with matrix-free Jacobi-preconditioned CG — scales to large graphs
    and shards cleanly (the Hx product is gather/scatter over the edge
    slab; under `shard_map` edges partition across devices and the scatter
    becomes a psum)."""
    N = g.poses.shape[0]

    def gn_step(poses, phi_k, lam):
        r, Ji, Jj = jax.vmap(_edge_residual_jac)(
            poses[g.edges_from], poses[g.edges_to], g.edges_meas
        )
        w = _huber_weights(r, g.edges_info, huber_delta) if robust else jnp.ones(r.shape[0])
        if switch_mask is not None:
            w = w * _dcs_weights(r, g.edges_info, switch_mask, phi_k)
        info_w = g.edges_info * (w * g.edge_valid)[:, None, None]
        root_mask = jnp.zeros((N,)).at[g.root].set(1.0)
        fix_diag = (root_mask + (~g.node_valid)) * 1e8 + damping

        b = jnp.zeros((N, 6))
        oy = jnp.einsum("eij,ej->ei", info_w, r)
        b = b.at[g.edges_from].add(jnp.einsum("eji,ej->ei", Ji, oy))
        b = b.at[g.edges_to].add(jnp.einsum("eji,ej->ei", Jj, oy))

        has_priors = g.priors_idx.shape[0] > 0
        if has_priors:
            rp, Hp, bp = _prior_blocks(g._replace(poses=poses), poses)
            b = b.at[g.priors_idx].add(bp)
        b = -b

        # Jacobi preconditioner diag(H)
        di = jnp.einsum("eki,ekl,eli->ei", Ji, info_w, Ji)
        dj = jnp.einsum("eki,ekl,eli->ei", Jj, info_w, Jj)
        diag = jnp.zeros((N, 6)).at[g.edges_from].add(di).at[g.edges_to].add(dj)
        if has_priors:
            diag = diag.at[g.priors_idx].add(
                jnp.diagonal(Hp, axis1=-2, axis2=-1))
        # LM: scale-invariant damping on the GN diagonal (λ·diag H) on top
        # of the gauge/invalid clamps
        damp6 = fix_diag[:, None] + lam * jnp.maximum(diag, 1e-8)
        diag = diag + damp6 + 1e-8
        Minv = 1.0 / diag

        def hx(x):
            y = _hx_product(g, Ji, Jj, info_w, x, damp6)
            if has_priors:
                y = y.at[g.priors_idx].add(
                    jnp.einsum("pij,pj->pi", Hp, x[g.priors_idx]))
            return y

        def cg_body(carry, _):
            x, rr, p, rz = carry
            Ap = hx(p)
            alpha = rz / jnp.maximum(jnp.sum(p * Ap), 1e-12)
            x = x + alpha * p
            rr = rr - alpha * Ap
            z = Minv * rr
            rz_new = jnp.sum(rr * z)
            beta = rz_new / jnp.maximum(rz, 1e-12)
            p = z + beta * p
            return (x, rr, p, rz_new), None

        x0 = jnp.zeros((N, 6))
        z0 = Minv * b
        (dx, _, _, _), _ = jax.lax.scan(
            cg_body, (x0, b, z0, jnp.sum(b * z0)), None, length=cg_iters
        )
        dx = jnp.where(g.node_valid[:, None], dx, 0.0)
        nrm = jnp.linalg.norm(dx, axis=-1, keepdims=True)
        dx = dx * jnp.minimum(1.0, 1.0 / jnp.maximum(nrm, 1e-9))
        return T.retract(poses, dx)

    def step(carry, _):
        # LM step acceptance: a CG step that raises the ROBUST objective
        # or goes non-finite is rejected and λ raised — the solve can
        # never diverge from a far init, and in Optimizer/Robust mode a
        # step that correctly abandons an outlier closure is still
        # accepted (its DCS cost saturates at phi)
        poses, lam, n_acc = carry
        phi_k = None
        if switch_mask is not None:
            phi_k = _dcs_phi_schedule(phi0, dcs_phi, n_acc, iters)
        cand = gn_step(poses, phi_k, lam)
        cur = _robust_cost(g, poses, robust, huber_delta, switch_mask, phi_k)
        new = _robust_cost(g, cand, robust, huber_delta, switch_mask, phi_k)
        ok = jnp.isfinite(new) & (new <= cur)
        poses = jnp.where(ok, cand, poses)
        lam = jnp.where(ok, jnp.maximum(lam / 3.0, 1e-9),
                        jnp.minimum(lam * 10.0, 1e8))
        return (poses, lam, n_acc + ok.astype(jnp.float32)), None

    phi0 = _dcs_phi0(g, switch_mask, dcs_phi) if switch_mask is not None else None
    (poses, _, _), _ = jax.lax.scan(
        step, (g.poses, jnp.float32(damping), jnp.float32(0.0)), None,
        length=iters)
    out = g._replace(poses=poses)
    return out, graph_chi2(out)


def optimize(g: PoseGraph, iters: int = 20, robust: bool = False,
             dense_threshold: int = 400,
             switch_mask: Optional[jnp.ndarray] = None, dcs_phi: float = DCS_PHI_DEFAULT):
    """Strategy dispatch mirroring Optimizer::create: dense Cholesky for
    small graphs, PCG beyond. ``switch_mask`` marks loop-closure edges as
    switchable for DCS robust optimization (Optimizer/Robust ≈ Vertigo)."""
    N = g.poses.shape[0]
    if N <= dense_threshold:
        return optimize_dense(g, iters=iters, robust=robust,
                              switch_mask=switch_mask, dcs_phi=dcs_phi)
    # Jacobi-PCG propagates information ~1 graph hop per CG iteration:
    # on odometry-chain-dominated graphs the inner solve must be allowed
    # ~N iterations or corrections never reach the far end (observed: a
    # 500-node two-session merge stuck at chi²~1e6 with cg_iters=60).
    cg = int(min(max(60, N), 1024))
    return optimize_pcg(g, iters=iters, cg_iters=cg, robust=robust,
                        switch_mask=switch_mask, dcs_phi=dcs_phi)


def optimize_poses_dict(poses, links, root_id=None, iters: int = 12,
                        robust: bool = False):
    """Offline pose-graph solve over python dicts (the tool-side entry the
    reference exposes through ``Optimizer::optimize`` after
    ``getConnectedGraph`` — tools/Report/main.cpp:943, Reprocess, the
    DatabaseViewer refine path).

    ``poses``: {id: (3,4) pose}; ``links``: iterable with
    ``from_id/to_id/type/transform/information`` fields.  Landmark links
    (negative ``to_id``) instantiate the landmark node at ``from ∘ t`` when
    absent, as the reference does (Report/main.cpp:929-941).  Only the
    connected component containing ``root_id`` (default: smallest id) is
    optimized; everything else is returned untouched.  Node/edge slabs are
    padded to pow2 buckets so repeated calls reuse compiled shapes.
    """
    import numpy as np

    from rtabmap_tpu.memory.memory import LINK_LANDMARK, LINK_POSE_PRIOR

    poses = dict(poses)
    edges = []
    seen = set()
    for lk in links:
        if lk.type == LINK_POSE_PRIOR or lk.transform is None:
            continue
        key = (min(lk.from_id, lk.to_id), max(lk.from_id, lk.to_id), lk.type)
        if key in seen or lk.from_id == lk.to_id:
            continue
        seen.add(key)
        if lk.type == LINK_LANDMARK and lk.to_id not in poses \
                and lk.from_id in poses:
            poses[lk.to_id] = np.asarray(
                T.compose(jnp.asarray(poses[lk.from_id], jnp.float32),
                          jnp.asarray(lk.transform, jnp.float32)))
        if lk.from_id in poses and lk.to_id in poses:
            edges.append(lk)
    if not poses:
        return {}
    # connected component containing the root
    adj = {}
    for lk in edges:
        adj.setdefault(lk.from_id, []).append(lk.to_id)
        adj.setdefault(lk.to_id, []).append(lk.from_id)
    root = root_id if root_id in poses else min(poses)
    comp = {root}
    stack = [root]
    while stack:
        for nb in adj.get(stack.pop(), []):
            if nb not in comp:
                comp.add(nb)
                stack.append(nb)
    ids = sorted(i for i in comp if i >= 0) + sorted(i for i in comp if i < 0)
    if len(ids) < 2:
        return poses
    index = {i: k for k, i in enumerate(ids)}
    edges = [lk for lk in edges if lk.from_id in comp and lk.to_id in comp]
    if not edges:
        return poses
    N, E = len(ids), len(edges)
    Np = 1 << max(N - 1, 1).bit_length()
    Ep = 1 << max(E - 1, 1).bit_length()
    P = np.tile(np.eye(3, 4, dtype=np.float32), (Np, 1, 1))
    for i in ids:
        P[index[i]] = np.asarray(poses[i], np.float32)
    ef = np.zeros((Ep,), np.int32)
    et = np.zeros((Ep,), np.int32)
    meas = np.tile(np.eye(3, 4, dtype=np.float32), (Ep, 1, 1))
    info = np.tile(np.eye(6, dtype=np.float32)[None], (Ep, 1, 1))
    for k, lk in enumerate(edges):
        ef[k] = index[lk.from_id]
        et[k] = index[lk.to_id]
        meas[k] = np.asarray(lk.transform, np.float32)
        if lk.information is not None:
            info[k] = np.asarray(lk.information, np.float32)
    g = make_graph(jnp.asarray(P), jnp.asarray(ef), jnp.asarray(et),
                   jnp.asarray(meas), jnp.asarray(info),
                   node_valid=jnp.asarray(np.arange(Np) < N),
                   edge_valid=jnp.asarray(np.arange(Ep) < E),
                   root=index[root])
    out, _chi2 = optimize(g, iters=iters, robust=robust)
    solved = np.asarray(out.poses)
    result = dict(poses)
    for i in ids:
        result[i] = solved[index[i]]
    return result
