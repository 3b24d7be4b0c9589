"""Batched fixed-iteration RANSAC motion solvers (3D-3D and PnP).

Capability parity: the reference's motion estimation
(/root/reference/corelib/src/util3d_motion_estimation.cpp —
``estimateMotion3DTo2D`` PnP-RANSAC at :59/:843 with model refinement and
residual covariance, ``estimateMotion3DTo3D`` Umeyama-RANSAC at :730).
TPU-first design: instead of sequential hypothesize-and-verify with early
exit, ALL hypotheses are solved in one batched pass (vmapped minimal
solver), inliers are counted with masked reductions, and the best model is
refined by iteratively-reweighted Gauss-Newton — no data-dependent control
flow, fully jittable.
"""
from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from rtabmap_tpu.geometry import transform as T
from rtabmap_tpu.geometry import camera as C


class RansacResult(NamedTuple):
    transform: jnp.ndarray   # (3,4) best model (dst <- src)
    inliers: jnp.ndarray     # (K,) bool
    num_inliers: jnp.ndarray # () int32
    success: jnp.ndarray     # () bool
    covariance: jnp.ndarray  # (6,6) pose covariance estimate


# Custom-call-free small linear algebra lives in ops/linalg.py (shared with
# ICP / BA / normals); re-exported here for callers that import from ransac.
from rtabmap_tpu.ops.linalg import (  # noqa: E402
    chol_solve_unrolled, inv3 as _inv3, polar_so3,
)


# ------------------------------------------------------------------ weighted Kabsch


def rigid_from_correspondences(src, dst, w):
    """Weighted least-squares rigid fit dst ≈ R src + t.

    src/dst (...,K,3), w (...,K) nonnegative. Umeyama/Kabsch with the SVD
    replaced by a polar-decomposition Newton iteration (see polar_so3) —
    the optimal rotation for det(H) > 0, custom-call-free on TPU.
    """
    wsum = jnp.maximum(jnp.sum(w, axis=-1, keepdims=True), 1e-9)
    wn = w / wsum
    mu_s = jnp.sum(src * wn[..., None], axis=-2)
    mu_d = jnp.sum(dst * wn[..., None], axis=-2)
    sc = src - mu_s[..., None, :]
    dc = dst - mu_d[..., None, :]
    H = jnp.einsum("...ki,...kj,...k->...ij", sc, dc, wn)
    # R = polar factor of M = H^T (dst = R src: cross-cov H = src^T dst).
    # Planar point sets (2D scans, 3-point minimal samples) make M rank-2,
    # where the plain polar iteration diverges; complete the missing
    # direction with the null-space pair u3 v3^T, signed so det(R) = +1 —
    # this reproduces the Kabsch SVD solution exactly (R = U diag(1,1,s) V^T)
    # without the EighTpu custom call.
    from rtabmap_tpu.ops.linalg import eigvec_min_sym3

    M = jnp.swapaxes(H, -1, -2)
    MtM = jnp.einsum("...ki,...kj->...ij", M, M)
    MMt = jnp.einsum("...ik,...jk->...ij", M, M)
    lam_v, v3 = eigvec_min_sym3(MtM)   # src-side null direction
    lam_u, u3 = eigvec_min_sym3(MMt)   # dst-side null direction
    tr = jnp.trace(MtM, axis1=-2, axis2=-1)
    deficient = lam_v < 1e-6 * tr + 1e-20
    gamma = jnp.where(deficient, 0.5 * jnp.sqrt(jnp.maximum(tr, 1e-30)), 0.0)
    outer = u3[..., :, None] * v3[..., None, :]
    sign = jnp.sign(jnp.linalg.det(M + gamma[..., None, None] * outer))
    sign = jnp.where(sign == 0, 1.0, sign)
    Maug = M + (sign * gamma)[..., None, None] * outer
    R = polar_so3(Maug)
    t = mu_d - jnp.einsum("...ij,...j->...i", R, mu_s)
    return T.from_rt(R, t)


def _augment_minimal_3pt(s3, d3):
    """Append a virtual 4th correspondence — the plane normal (cross
    product of the two centered edge vectors) — to 3-point minimal samples
    (..., 3, 3). Centered 3-point sets span a plane, so their Kabsch
    cross-covariance is rank-2 and the polar iteration in
    rigid_from_correspondences needs the normal to pin the out-of-plane
    direction (the SVD-based solver got it implicitly)."""

    def aug(p):
        c = p.mean(axis=-2, keepdims=True)
        e = p - c
        n = jnp.cross(e[..., 1, :] - e[..., 0, :], e[..., 2, :] - e[..., 0, :])
        scale = jnp.linalg.norm(e, axis=(-2, -1), keepdims=False)[..., None]
        n = n / (jnp.linalg.norm(n, axis=-1, keepdims=True) + 1e-12) * scale
        return jnp.concatenate([p, c[..., 0, :][..., None, :] + n[..., None, :]],
                               axis=-2)

    return aug(s3), aug(d3)


def _sample_indices(key, valid, n_hyp: int, n_pts: int):
    """(n_hyp, n_pts) indices drawn from valid slots (repeats possible —
    degenerate samples simply produce zero-inlier models).

    Draws n_hyp*n_pts raw uints and maps them onto the compacted valid-slot
    table — categorical() would synthesize a (n_hyp, n_pts, K) Gumbel
    field, and that threefry volume was the measured per-hypothesis cost
    of the whole RANSAC stage on TPU."""
    order = jnp.argsort(~valid)  # stable: valid slots first
    nv = jnp.maximum(jnp.sum(valid), 1)
    r = jax.random.randint(key, (n_hyp, n_pts), 0, 1 << 30)
    return order[r % nv]


# ------------------------------------------------------------------ 3D -> 3D


def ransac_rigid(src, dst, valid, key, iters: int = 256, threshold: float = 0.1,
                 min_inliers: int = 6, refine_rounds: int = 3) -> RansacResult:
    """3D-3D RANSAC: find T with dst ≈ T(src). All distances in meters."""
    K = src.shape[0]
    idx = _sample_indices(key, valid, iters, 3)
    s3, d3 = _augment_minimal_3pt(src[idx], dst[idx])
    w3 = jnp.ones(s3.shape[:-1], src.dtype)
    models = rigid_from_correspondences(s3, d3, w3)  # (iters,3,4)
    pred = T.apply(models, jnp.broadcast_to(src, (iters, K, 3)))
    err = jnp.linalg.norm(pred - dst[None], axis=-1)
    inl = (err < threshold) & valid[None, :]
    counts = jnp.sum(inl, axis=-1)
    best = jnp.argmax(counts)
    model = models[best]

    # IRLS refinement on (soft) inliers of the best model
    def refine_body(_, m):
        pred = T.apply(m[None], src[None])[0]
        err = jnp.linalg.norm(pred - dst, axis=-1)
        w = jnp.where(valid & (err < threshold), 1.0, 0.0)
        return rigid_from_correspondences(src, dst, w)

    model = jax.lax.fori_loop(0, refine_rounds, refine_body, model)
    pred = T.apply(model[None], src[None])[0]
    err = jnp.linalg.norm(pred - dst, axis=-1)
    inliers = valid & (err < threshold)
    n = jnp.sum(inliers)
    success = n >= min_inliers
    # covariance: isotropic from residual variance (reference scales by
    # max residual variance too — Memory.cpp covariance conventions)
    var = jnp.sum(jnp.where(inliers, err * err, 0.0)) / jnp.maximum(n - 3, 1)
    cov = jnp.eye(6) * jnp.maximum(var, 1e-8)
    return RansacResult(model, inliers, n.astype(jnp.int32), success, cov)


# ------------------------------------------------------------------ PnP


def _dlt_pnp(pts3d, xn):
    """6+ point DLT: solve P (3x4) from 3D points and normalized image coords.

    pts3d (...,N,3), xn (...,N,2). Returns (...,3,4) with R orthonormalized
    and cheirality-corrected.
    """
    N = pts3d.shape[-2]
    X = jnp.concatenate([pts3d, jnp.ones((*pts3d.shape[:-1], 1), pts3d.dtype)], axis=-1)
    z = jnp.zeros_like(X)
    u = xn[..., 0:1]
    v = xn[..., 1:2]
    r1 = jnp.concatenate([X, z, -u * X], axis=-1)   # (...,N,12)
    r2 = jnp.concatenate([z, X, -v * X], axis=-1)
    A = jnp.concatenate([r1, r2], axis=-2)          # (...,2N,12)
    # min ||A p||: smallest eigenvector of A^T A. One batched 12x12
    # Cholesky + a fixed number of inverse-iteration solves beats both the
    # tall SVD and eigh on TPU (measured: eigh was the PnP stage's hot op);
    # lambda_min << lambda_2 for RANSAC minimal samples, so convergence is
    # one-two iterations — garbage hypotheses are RANSAC-filtered anyway.
    AtA = jnp.einsum("...ni,...nj->...ij", A, A)
    tr = jnp.trace(AtA, axis1=-2, axis2=-1)
    eye = jnp.eye(12, dtype=AtA.dtype)
    Areg = AtA + (1e-9 * tr + 1e-12)[..., None, None] * eye
    p = jnp.ones((*AtA.shape[:-2], 12), AtA.dtype)
    for _ in range(4):
        p = chol_solve_unrolled(Areg, p)
        p = p / jnp.maximum(jnp.linalg.norm(p, axis=-1, keepdims=True), 1e-30)
    P = p.reshape((*p.shape[:-1], 3, 4))
    R = P[..., :3]
    # P = s*[R|t] up to an unknown signed scale s; det(sR) = s^3, so the
    # signed cube root recovers s including its sign (resolves the
    # projective sign ambiguity without a cheirality vote).
    d = jnp.linalg.det(R)
    scale = jnp.sign(d) * jnp.abs(d) ** (1.0 / 3.0)
    scale = jnp.where(jnp.abs(scale) < 1e-12, 1e-12, scale)
    Rn = R / scale[..., None, None]
    t = P[..., 3] / scale[..., None]
    # project onto SO(3) (noise makes Rn only approximately orthonormal)
    Rn = polar_so3(Rn)
    return T.from_rt(Rn, t)


def _reproj_residuals(Tcw, pts3d, xn):
    """Normalized-plane reprojection residuals (...,N,2) for camera pose Tcw
    (world->camera)."""
    pc = jnp.einsum("...ij,...nj->...ni", T.rotation(Tcw), pts3d) + T.translation(Tcw)[..., None, :]
    z = jnp.where(jnp.abs(pc[..., 2]) > 1e-6, pc[..., 2], 1e-6)
    proj = pc[..., :2] / z[..., None]
    return proj - xn, pc[..., 2]


def pnp_gn(pts3d, xn, w, Tcw0, iters: int = 8, damping: float = 1e-4):
    """Weighted Gauss-Newton PnP refinement on the normalized plane.

    pts3d (N,3) world points, xn (N,2) normalized obs, w (N,) weights,
    Tcw0 (3,4) initial world->camera. Returns (Tcw, JtJ).
    Jacobian wrt left-multiplied twist on Tcw.
    """

    def body(_, Tcw):
        res, depth = _reproj_residuals(Tcw, pts3d, xn)
        pc = jnp.einsum("ij,nj->ni", T.rotation(Tcw), pts3d) + T.translation(Tcw)[None, :]
        x, y, z = pc[..., 0], pc[..., 1], jnp.where(jnp.abs(pc[..., 2]) > 1e-6, pc[..., 2], 1e-6)
        iz = 1.0 / z
        iz2 = iz * iz
        # d(proj)/d(twist) for left perturbation exp(xi) * Tcw: point moves
        # dp = drho + dphi x pc  ->  standard 2x6 jacobian
        zeros = jnp.zeros_like(x)
        Ju = jnp.stack([iz, zeros, -x * iz2, -x * y * iz2, 1.0 + x * x * iz2, -y * iz], axis=-1)
        Jv = jnp.stack([zeros, iz, -y * iz2, -(1.0 + y * y * iz2), x * y * iz2, x * iz], axis=-1)
        J = jnp.stack([Ju, Jv], axis=-2)  # (N,2,6)
        ww = w * (depth > 0)
        JtJ = jnp.einsum("nri,nrj,n->ij", J, J, ww)
        Jtr = jnp.einsum("nri,nr,n->i", J, res, ww)
        H = JtJ + damping * jnp.eye(6)
        dx = -chol_solve_unrolled(H, Jtr)
        return T.retract_left(Tcw, dx)

    Tcw = jax.lax.fori_loop(0, iters, body, Tcw0)
    res, depth = _reproj_residuals(Tcw, pts3d, xn)
    return Tcw, res, depth


def ransac_pnp(pts3d, uv, valid, cam: C.CameraModel, key,
               iters: int = 256, reproj_px: float = 4.0,
               min_inliers: int = 20, guess: Optional[jnp.ndarray] = None,
               pts3d_query: Optional[jnp.ndarray] = None,
               refine_iters: int = 8) -> RansacResult:
    """PnP-RANSAC: camera pose from world points + pixel observations.

    Returns the camera pose as the motion ``T_wc`` (camera-in-world,
    i.e. the inverse of the world->camera extrinsic), matching the
    reference's convention of returning the frame pose.

    Hypotheses: batched 6-point DLT, plus — when the query frame has its own
    3D for the observed keypoints (RGB-D / stereo, ``pts3d_query`` (K,3) in
    the query camera frame) — batched 3-point Kabsch hypotheses, which stay
    well-posed on planar scenes where DLT degenerates. ``guess`` (3,4
    camera-in-world) joins the pool. The inlier metric is always
    reprojection error; the winner is refined with masked Gauss-Newton and
    covariance comes from the GN normal equations scaled by residual
    variance.
    """
    Kp = pts3d.shape[0]
    fx = cam.fx
    thr_n = reproj_px / fx  # normalized-plane threshold
    xn = jnp.stack([(uv[..., 0] - cam.cx) / cam.fx, (uv[..., 1] - cam.cy) / cam.fy], axis=-1)

    if pts3d_query is not None:
        n_dlt = iters // 2
        idx = _sample_indices(key, valid, n_dlt, 6)
        models_dlt = _dlt_pnp(pts3d[idx], xn[idx])
        k2 = jax.random.fold_in(key, 1)
        idx3 = _sample_indices(k2, valid, iters - n_dlt, 3)
        s3, d3 = _augment_minimal_3pt(pts3d[idx3], pts3d_query[idx3])
        w3 = jnp.ones(s3.shape[:-1], pts3d.dtype)
        # world -> query-camera rigid fit
        models_kab = rigid_from_correspondences(s3, d3, w3)
        models = jnp.concatenate([models_dlt, models_kab], axis=0)
    else:
        idx = _sample_indices(key, valid, iters, 6)
        models = _dlt_pnp(pts3d[idx], xn[idx])  # (iters,3,4) world->camera
    if guess is not None:
        models = jnp.concatenate([models, T.inverse(guess)[None]], axis=0)
    res, depth = jax.vmap(lambda M: _reproj_residuals(M, pts3d, xn))(models)
    err = jnp.linalg.norm(res, axis=-1)
    inl = (err < thr_n) & valid[None, :] & (depth > 0)
    counts = jnp.sum(inl, axis=-1)
    best = jnp.argmax(counts)
    Tcw = models[best]

    # robust refinement: 2 rounds of (hard-inlier GN)
    def round_body(_, Tcw):
        res, depth = _reproj_residuals(Tcw, pts3d, xn)
        err = jnp.linalg.norm(res, axis=-1)
        w = jnp.where(valid & (err < thr_n) & (depth > 0), 1.0, 0.0)
        Tcw, _, _ = pnp_gn(pts3d, xn, w, Tcw, iters=refine_iters)
        return Tcw

    Tcw = jax.lax.fori_loop(0, 2, round_body, Tcw)
    res, depth = _reproj_residuals(Tcw, pts3d, xn)
    err = jnp.linalg.norm(res, axis=-1)
    inliers = valid & (err < thr_n) & (depth > 0)
    n = jnp.sum(inliers)
    success = n >= min_inliers

    # Covariance: the reference's robust 3D-disagreement convention
    # (util3d_motion_estimation.cpp:157-231): per-inlier squared distance
    # between A's object point and B's 3D observation mapped into A's
    # frame; linear variance = 2.1981 x lower-quartile, angular variance
    # from the angle between the two 3D directions. This deliberately
    # loose covariance reflects systematic depth error, unlike the
    # (over-tight) GN information matrix.
    T_wc = T.inverse(Tcw)
    if pts3d_query is not None:
        has_q = jnp.any(pts3d_query != 0.0, axis=-1)
        mapped = T.apply(T_wc[None], pts3d_query[None])[0]  # B pts in A frame
        cov_valid = inliers & has_q
        d2 = jnp.sum((pts3d - mapped) ** 2, axis=-1)
        v1 = pts3d
        v2 = mapped
        cosang = jnp.sum(v1 * v2, -1) / jnp.maximum(
            jnp.linalg.norm(v1, axis=-1) * jnp.linalg.norm(v2, axis=-1), 1e-9)
        ang = jnp.arccos(jnp.clip(cosang, -1.0, 1.0))
        nv = jnp.maximum(jnp.sum(cov_valid), 1)
        q_idx = nv // 4
        d2_sorted = jnp.sort(jnp.where(cov_valid, d2, jnp.inf))
        ang_sorted = jnp.sort(jnp.where(cov_valid, ang, jnp.inf))
        lin_var = 2.1981 * jnp.take(d2_sorted, q_idx)
        ang_var = 2.1981 * jnp.take(ang_sorted, q_idx)
        lin_var = jnp.where(jnp.isfinite(lin_var), jnp.maximum(lin_var, 1e-8), 1.0)
        ang_var = jnp.where(jnp.isfinite(ang_var), jnp.maximum(ang_var, 1e-8), 1.0)
    else:
        # no query 3D: identity scaled by RMS reprojection error in pixels
        # (util3d_motion_estimation.cpp:259-270)
        px_err2 = jnp.sum(jnp.where(inliers[:, None], res * res, 0.0)) * (fx * fx)
        rms = jnp.sqrt(px_err2 / jnp.maximum(n, 1))
        lin_var = ang_var = jnp.maximum(jnp.sqrt(rms), 1e-8)
    cov = jnp.diag(jnp.concatenate([jnp.full((3,), lin_var), jnp.full((3,), ang_var)]))
    return RansacResult(T_wc, inliers, n.astype(jnp.int32), success, cov)


def fit_plane_ransac(pts, key, iters: int = 128, threshold: float = 0.02):
    """Dominant-plane RANSAC over an (N,3) cloud — batched 3-point
    hypotheses, masked inlier count (reference: ExtractObject's PCL
    SACMODEL_PLANE stage). Returns (normal (3,), d, inlier mask (N,))
    with plane n·x + d = 0."""
    pts = jnp.asarray(pts, jnp.float32)
    n_pts = pts.shape[0]
    keys = jax.random.split(key, 1)[0]
    idx = jax.random.randint(keys, (iters, 3), 0, n_pts)
    a, b, c = pts[idx[:, 0]], pts[idx[:, 1]], pts[idx[:, 2]]
    nrm = jnp.cross(b - a, c - a)
    nn = jnp.linalg.norm(nrm, axis=-1, keepdims=True)
    nrm = nrm / jnp.maximum(nn, 1e-12)
    d = -jnp.sum(nrm * a, axis=-1)
    dist = jnp.abs(pts @ nrm.T + d[None, :])         # (N, iters)
    counts = (dist < threshold).sum(0) * (nn[:, 0] > 1e-9)
    best = jnp.argmax(counts)
    n_best, d_best = nrm[best], d[best]
    inl = jnp.abs(pts @ n_best + d_best) < threshold
    # least-squares refit on inliers
    w = inl.astype(jnp.float32)
    mu = jnp.sum(pts * w[:, None], 0) / jnp.maximum(w.sum(), 1.0)
    X = (pts - mu) * w[:, None]
    _, _, vt = jnp.linalg.svd(X, full_matrices=False)
    n_ref = vt[-1]
    d_ref = -jnp.dot(n_ref, mu)
    inl = jnp.abs(pts @ n_ref + d_ref) < threshold
    return np.asarray(n_ref), float(d_ref), np.asarray(inl)
