"""Epipolar geometry: fundamental-matrix RANSAC + hypothesis verification.

Capability parity: the reference's ``EpipolarGeometry``
(/root/reference/corelib/src/EpipolarGeometry.cpp:65 ``check`` — verify a
loop-closure hypothesis by estimating F from word correspondences and
counting inliers — and ``findFFromWords``). Batched 8-point solves over
RANSAC subsets, Sampson-distance inlier test.
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from rtabmap_tpu.ops.ransac import _sample_indices


def _eight_point(x1, x2):
    """Normalized 8-point F estimate. x1,x2 (...,8,2). Returns (...,3,3)."""

    def normalize(x):
        mu = jnp.mean(x, axis=-2, keepdims=True)
        s = jnp.sqrt(2.0) / jnp.maximum(
            jnp.mean(jnp.linalg.norm(x - mu, axis=-1), axis=-1, keepdims=True), 1e-9)
        Tm = jnp.zeros((*x.shape[:-2], 3, 3))
        Tm = Tm.at[..., 0, 0].set(s[..., 0]).at[..., 1, 1].set(s[..., 0]).at[..., 2, 2].set(1.0)
        Tm = Tm.at[..., 0, 2].set(-s[..., 0] * mu[..., 0, 0]).at[..., 1, 2].set(-s[..., 0] * mu[..., 0, 1])
        xn = (x - mu) * s[..., None]
        return xn, Tm

    x1n, T1 = normalize(x1)
    x2n, T2 = normalize(x2)
    u1, v1 = x1n[..., 0], x1n[..., 1]
    u2, v2 = x2n[..., 0], x2n[..., 1]
    ones = jnp.ones_like(u1)
    A = jnp.stack([u2 * u1, u2 * v1, u2, v2 * u1, v2 * v1, v2, u1, v1, ones], axis=-1)
    # null vector of A: inverse iteration on AtA with the unrolled Cholesky
    # (the batched 9-column SVD lowered to ms-scale TPU custom calls)
    from rtabmap_tpu.ops.linalg import chol_solve_unrolled, eigvec_min_sym3

    AtA = jnp.einsum("...ni,...nj->...ij", A, A)
    tr = jnp.trace(AtA, axis1=-2, axis2=-1)
    # shift keeps the f32 Cholesky well-conditioned (lambda_min = 1e-5 tr);
    # the null vector still dominates inverse iteration since lambda_2 ~ tr
    Areg = AtA + (1e-5 * tr + 1e-12)[..., None, None] * jnp.eye(9)
    f = jnp.ones((*AtA.shape[:-2], 9), A.dtype)
    for _ in range(6):
        f = chol_solve_unrolled(Areg, f)
        f = f / jnp.maximum(jnp.linalg.norm(f, axis=-1, keepdims=True), 1e-30)
    F = f.reshape((*A.shape[:-2], 3, 3))
    # enforce rank 2: subtract the smallest singular triplet
    # F' = F - s3 u3 v3^T with u3/v3 the null directions of FF^T / F^TF
    _, v3 = eigvec_min_sym3(jnp.einsum("...ki,...kj->...ij", F, F))
    _, u3 = eigvec_min_sym3(jnp.einsum("...ik,...jk->...ij", F, F))
    s3 = jnp.einsum("...i,...ij,...j->...", u3, F, v3)
    F = F - s3[..., None, None] * u3[..., :, None] * v3[..., None, :]
    return jnp.swapaxes(T2, -1, -2) @ F @ T1


def sampson_distance(F, x1, x2):
    """Sampson epipolar distance. F (...,3,3), x1/x2 (...,N,2)."""
    ones = jnp.ones((*x1.shape[:-1], 1))
    p1 = jnp.concatenate([x1, ones], axis=-1)
    p2 = jnp.concatenate([x2, ones], axis=-1)
    Fx1 = jnp.einsum("...ij,...nj->...ni", F, p1)
    Ftx2 = jnp.einsum("...ji,...nj->...ni", F, p2)
    num = jnp.einsum("...ni,...ni->...n", p2, Fx1) ** 2
    den = Fx1[..., 0] ** 2 + Fx1[..., 1] ** 2 + Ftx2[..., 0] ** 2 + Ftx2[..., 1] ** 2
    return num / jnp.maximum(den, 1e-12)


@partial(jax.jit, static_argnames=("iters",))
def ransac_fundamental(x1, x2, valid, key, iters: int = 128,
                       threshold_px: float = 3.0) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Batched F-RANSAC. Returns (F (3,3), inlier mask (N,))."""
    idx = _sample_indices(key, valid, iters, 8)
    Fs = _eight_point(x1[idx], x2[idx])
    d = jax.vmap(lambda F: sampson_distance(F, x1, x2))(Fs)
    inl = (d < threshold_px ** 2) & valid[None]
    counts = jnp.sum(inl, axis=-1)
    best = jnp.argmax(counts)
    F = Fs[best]
    inliers = valid & (sampson_distance(F, x1, x2) < threshold_px ** 2)
    return F, inliers


# --------------------------------------------------------- calibrated (mono)


def essential_from_pairs(x1n, x2n):
    """8-point essential estimate from normalized image coords (...,8,2):
    the F solve projected onto the essential manifold (singular values
    (1,1,0)). Batched over leading dims for RANSAC hypothesis fan-out."""
    u1, v1 = x1n[..., 0], x1n[..., 1]
    u2, v2 = x2n[..., 0], x2n[..., 1]
    ones = jnp.ones_like(u1)
    A = jnp.stack([u2 * u1, u2 * v1, u2, v2 * u1, v2 * v1, v2, u1, v1, ones], axis=-1)
    _, _, Vt = jnp.linalg.svd(A, full_matrices=True)
    E = Vt[..., -1, :].reshape((*A.shape[:-2], 3, 3))
    U, S, Vt2 = jnp.linalg.svd(E)
    Sm = jnp.stack([jnp.ones_like(S[..., 0]), jnp.ones_like(S[..., 0]),
                    jnp.zeros_like(S[..., 0])], axis=-1)
    return (U * Sm[..., None, :]) @ Vt2


def essential_refit(x1n, x2n, w):
    """Weighted least-squares E over ALL correspondences (w (N,) weights,
    typically the inlier mask) — the iterated refit that turns a minimal
    8-point hypothesis into a consensus estimate."""
    u1, v1 = x1n[..., 0], x1n[..., 1]
    u2, v2 = x2n[..., 0], x2n[..., 1]
    ones = jnp.ones_like(u1)
    A = w[..., None] * jnp.stack(
        [u2 * u1, u2 * v1, u2, v2 * u1, v2 * v1, v2, u1, v1, ones], axis=-1)
    _, _, Vt = jnp.linalg.svd(A, full_matrices=False)
    E = Vt[..., -1, :].reshape((*A.shape[:-2], 3, 3))
    U, S, Vt2 = jnp.linalg.svd(E)
    Sm = jnp.stack([jnp.ones_like(S[..., 0]), jnp.ones_like(S[..., 0]),
                    jnp.zeros_like(S[..., 0])], axis=-1)
    return (U * Sm[..., None, :]) @ Vt2


_W = jnp.array([[0.0, -1.0, 0.0], [1.0, 0.0, 0.0], [0.0, 0.0, 1.0]])


def decompose_essential(E):
    """E -> (R_a, R_b, t) candidate factors (t unit norm; 4 combos ±t)."""
    U, _, Vt = jnp.linalg.svd(E)
    # force rotations (det +1) by flipping the last column/row sign
    dU = jnp.sign(jnp.linalg.det(U))
    dV = jnp.sign(jnp.linalg.det(Vt))
    U = U.at[..., :, 2].multiply(dU[..., None])
    Vt = Vt.at[..., 2, :].multiply(dV[..., None])
    Ra = U @ _W @ Vt
    Rb = U @ _W.T @ Vt
    t = U[..., :, 2]
    return Ra, Rb, t


def triangulate_midpoint(R, t, x1n, x2n):
    """Midpoint triangulation, cam1 at origin, X2 = R X1 + t.

    x1n/x2n (N,2) normalized coords. Returns (X (N,3) in cam1, z1, z2).
    """
    d1 = jnp.concatenate([x1n, jnp.ones((*x1n.shape[:-1], 1))], axis=-1)
    d2c1 = jnp.einsum("ji,nj->ni",
                      R, jnp.concatenate([x2n, jnp.ones((*x2n.shape[:-1], 1))], axis=-1))
    c2 = -jnp.einsum("ji,j->i", R, t)
    a = jnp.sum(d1 * d1, axis=-1)
    b = jnp.sum(d1 * d2c1, axis=-1)
    c = jnp.sum(d2c1 * d2c1, axis=-1)
    e1 = jnp.sum(c2[None] * d1, axis=-1)
    e2 = jnp.sum(c2[None] * d2c1, axis=-1)
    det = a * c - b * b
    s = (c * e1 - b * e2) / jnp.where(jnp.abs(det) > 1e-12, det, 1e-12)
    r = (b * e1 - a * e2) / jnp.where(jnp.abs(det) > 1e-12, det, 1e-12)
    X = 0.5 * (s[..., None] * d1 + c2[None] + r[..., None] * d2c1)
    z1 = X[..., 2]
    z2 = (jnp.einsum("ij,nj->ni", R, X) + t[None])[..., 2]
    return X, z1, z2


@partial(jax.jit, static_argnames=("iters",))
def ransac_essential(x1n, x2n, valid, key, iters: int = 192,
                     threshold: float = 5e-3):
    """Calibrated two-view relative pose from normalized correspondences.

    Batched 8-point E hypotheses -> Sampson gate -> decompose the winner ->
    cheirality vote over the 4 (R, ±t) candidates (reference:
    OdometryMono.cpp bootstrap via cv::findEssentialMat/recoverPose —
    re-designed as a fixed-shape hypothesis fan-out).

    Returns (T21 (3,4) with unit-norm translation, inliers (N,),
    pts3d (N,3) midpoint triangulation in cam1, pts_ok (N,)).
    """
    idx = _sample_indices(key, valid, iters, 8)
    Es = essential_from_pairs(x1n[idx], x2n[idx])
    d = jax.vmap(lambda E: sampson_distance(E, x1n, x2n))(Es)
    inl = (d < threshold ** 2) & valid[None]
    best = jnp.argmax(jnp.sum(inl, axis=-1))
    E = Es[best]
    inliers = valid & (sampson_distance(E, x1n, x2n) < threshold ** 2)
    # iterated consensus refit: minimal-sample E is noise-limited; two
    # least-squares refits over the inlier set cut the rotation error of the
    # recovered pose severalfold on low-focal imagery
    for _ in range(2):
        E = essential_refit(x1n, x2n, inliers.astype(jnp.float32))
        inliers = valid & (sampson_distance(E, x1n, x2n) < threshold ** 2)

    Ra, Rb, t = decompose_essential(E)

    def score(R, tt):
        X, z1, z2 = triangulate_midpoint(R, tt, x1n, x2n)
        ok = inliers & (z1 > 1e-3) & (z2 > 1e-3)
        return jnp.sum(ok), X, ok

    cands = [(Ra, t), (Ra, -t), (Rb, t), (Rb, -t)]
    counts = jnp.stack([score(R, tt)[0] for R, tt in cands])
    winner = jnp.argmax(counts)
    Rs = jnp.stack([c[0] for c in cands])
    ts = jnp.stack([c[1] for c in cands])
    R_best, t_best = Rs[winner], ts[winner]
    X, z1, z2 = triangulate_midpoint(R_best, t_best, x1n, x2n)
    pts_ok = inliers & (z1 > 1e-3) & (z2 > 1e-3)
    T21 = jnp.concatenate([R_best, t_best[:, None]], axis=1)
    return T21, inliers, X, pts_ok


# ------------------------------------------------------------- homography


def homography_from_pairs(x1, x2, w=None):
    """DLT homography from (...,M,2) normalized-coord pairs (M>=4), optional
    per-row weights (...,M) for consensus refits. Returns (...,3,3) with
    x2 ~ H x1."""
    x, y = x1[..., 0], x1[..., 1]
    u, v = x2[..., 0], x2[..., 1]
    z = jnp.zeros_like(x)
    o = jnp.ones_like(x)
    r1 = jnp.stack([-x, -y, -o, z, z, z, u * x, u * y, u], axis=-1)
    r2 = jnp.stack([z, z, z, -x, -y, -o, v * x, v * y, v], axis=-1)
    A = jnp.concatenate([r1, r2], axis=-2)  # (...,2M,9)
    if w is not None:
        A = A * jnp.concatenate([w, w], axis=-1)[..., None]
    _, _, Vt = jnp.linalg.svd(A, full_matrices=False)
    return Vt[..., -1, :].reshape((*A.shape[:-2], 3, 3))


def transfer_error(H, x1, x2):
    """Symmetric transfer error ||x2 - Hx1||^2 + ||x1 - H^-1 x2||^2."""
    def fwd(Hm, a, b):
        p = jnp.concatenate([a, jnp.ones((*a.shape[:-1], 1))], axis=-1)
        q = jnp.einsum("...ij,...nj->...ni", Hm, p)
        qn = q[..., :2] / jnp.where(jnp.abs(q[..., 2:]) > 1e-9, q[..., 2:], 1e-9)
        return jnp.sum((qn - b) ** 2, axis=-1)

    return fwd(H, x1, x2) + fwd(jnp.linalg.inv(H), x2, x1)


@partial(jax.jit, static_argnames=("iters",))
def ransac_homography(x1, x2, valid, key, iters: int = 192,
                      threshold: float = 5e-3):
    """Batched 4-point H-RANSAC + 2 consensus refits.

    Returns (H (3,3), inliers (N,))."""
    idx = _sample_indices(key, valid, iters, 4)
    Hs = homography_from_pairs(x1[idx], x2[idx])
    d = jax.vmap(lambda H: transfer_error(H, x1, x2))(Hs)
    thr2 = 2.0 * threshold ** 2  # symmetric error budget
    inl = (d < thr2) & valid[None]
    best = jnp.argmax(jnp.sum(inl, axis=-1))
    H = Hs[best]
    inliers = valid & (transfer_error(H, x1, x2) < thr2)
    for _ in range(2):
        H = homography_from_pairs(x1, x2, inliers.astype(jnp.float32))
        inliers = valid & (transfer_error(H, x1, x2) < thr2)
    return H, inliers


def decompose_homography(H, x1, x2, inliers):
    """Faugeras SVD decomposition of a calibrated homography into the four
    (R, t, n) motion candidates (Ma/Soatto Alg. 5.2), with the projective
    sign fixed so inlier points satisfy x2^T H x1 > 0.

    Returns (Rs (4,3,3), ts (4,3), ns (4,3)); t is scaled by 1/d (plane
    distance) — unit-free, like the essential-matrix translation.
    """
    # sign fix
    p1 = jnp.concatenate([x1, jnp.ones((*x1.shape[:-1], 1))], axis=-1)
    p2 = jnp.concatenate([x2, jnp.ones((*x2.shape[:-1], 1))], axis=-1)
    s = jnp.einsum("ni,ij,nj->n", p2, H, p1)
    sign = jnp.where(jnp.sum(jnp.where(inliers, jnp.sign(s), 0.0)) >= 0, 1.0, -1.0)
    H = H * sign
    # scale so sigma2(H) == 1
    sv = jnp.linalg.svd(H, compute_uv=False)
    H = H / jnp.maximum(sv[1], 1e-12)

    _, S2, Vt = jnp.linalg.svd(H.T @ H)
    V = Vt.T
    # force right-handed V
    V = V * jnp.sign(jnp.linalg.det(V))
    s1, s3 = S2[0], S2[2]  # singular values of H^T H (sigma^2), s2 == 1
    a = jnp.sqrt(jnp.maximum(1.0 - s3, 0.0))
    b = jnp.sqrt(jnp.maximum(s1 - 1.0, 0.0))
    nrm = jnp.maximum(jnp.sqrt(jnp.maximum(s1 - s3, 0.0)), 1e-12)
    v1, v2, v3 = V[:, 0], V[:, 1], V[:, 2]
    u1 = (a * v1 + b * v3) / nrm
    u2 = (a * v1 - b * v3) / nrm

    def sol(u):
        U = jnp.stack([v2, u, jnp.cross(v2, u)], axis=1)
        W = jnp.stack([H @ v2, H @ u, jnp.cross(H @ v2, H @ u)], axis=1)
        R = W @ U.T
        n = jnp.cross(v2, u)
        t = (H - R) @ n
        return R, t, n

    R1, t1, n1 = sol(u1)
    R2, t2, n2 = sol(u2)
    Rs = jnp.stack([R1, R1, R2, R2])
    ts = jnp.stack([t1, -t1, t2, -t2])
    ns = jnp.stack([n1, -n1, n2, -n2])
    return Rs, ts, ns


def pose_from_homography(H, x1n, x2n, inliers):
    """Pick the physical (R, t) among the four homography factors by
    cheirality vote (+ plane-in-front tie-break), triangulating structure.

    Returns (T21 (3,4), pts3d (N,3) in cam1, pts_ok (N,)).
    """
    Rs, ts, ns = decompose_homography(H, x1n, x2n, inliers)

    def score(R, t, n):
        X, z1, z2 = triangulate_midpoint(R, t, x1n, x2n)
        ok = inliers & (z1 > 1e-3) & (z2 > 1e-3)
        return jnp.sum(ok) + jnp.where(n[2] > 0, 0.5, 0.0), X, ok

    scored = [score(Rs[i], ts[i], ns[i]) for i in range(4)]
    counts = jnp.stack([s[0] for s in scored])
    winner = jnp.argmax(counts)
    R = Rs[winner]
    t = ts[winner]
    X, z1, z2 = triangulate_midpoint(R, t, x1n, x2n)
    ok = inliers & (z1 > 1e-3) & (z2 > 1e-3)
    return jnp.concatenate([R, t[:, None]], axis=1), X, ok


def check_hypothesis(uv_a, uv_b, valid, key, min_pairs: int = 8,
                     threshold_px: float = 3.0, inlier_ratio: float = 0.5):
    """Loop-hypothesis verification (reference: EpipolarGeometry::check —
    accept when enough correspondences satisfy one epipolar geometry)."""
    n = jnp.sum(valid)
    F, inl = ransac_fundamental(uv_a, uv_b, valid, key, threshold_px=threshold_px)
    ok = (n >= min_pairs) & (jnp.sum(inl) >= jnp.maximum(inlier_ratio * n, min_pairs))
    return ok, F, inl
