"""Custom-call-free small linear algebra for TPU hot loops.

jnp.linalg.{svd,eigh,cholesky,solve,inv} on small matrices lower to
LAPACK-ish TPU custom calls (EighTpu, Cholesky, LuDecompositionBlock,
QrDecompositionBlock...) that cost ~milliseconds per launch and cannot
fuse with neighbors. Profiled on the PnP-RANSAC stage, two EighTpu
launches were 20 of its 46 ms. Everything here is unrolled
elementwise/matmul code that XLA fuses into the surrounding kernel;
fixed sizes (3x3, 6x6, 12x12...) are static Python ints.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def inv3(M):
    """Closed-form 3x3 inverse via adjugate (batched)."""
    a, b, c = M[..., 0, 0], M[..., 0, 1], M[..., 0, 2]
    d, e, f = M[..., 1, 0], M[..., 1, 1], M[..., 1, 2]
    g, h, i = M[..., 2, 0], M[..., 2, 1], M[..., 2, 2]
    A = e * i - f * h
    B = -(d * i - f * g)
    Cc = d * h - e * g
    det = a * A + b * B + c * Cc
    det = jnp.where(jnp.abs(det) > 1e-20, det, 1e-20)
    adj = jnp.stack([
        jnp.stack([A, -(b * i - c * h), b * f - c * e], -1),
        jnp.stack([B, a * i - c * g, -(a * f - c * d)], -1),
        jnp.stack([Cc, -(a * h - b * g), a * e - b * d], -1),
    ], -2)
    return adj / det[..., None, None]


def polar_so3(M, iters: int = 6):
    """Nearest-orthogonal factor of a 3x3 matrix by Newton polar iteration
    X <- (X + X^-T)/2. Returns a proper rotation (sign-flipped if
    det < 0 — valid, though not the Kabsch-optimal reflection fix)."""
    nrm = jnp.sqrt(jnp.sum(M * M, axis=(-2, -1), keepdims=True)) + 1e-12
    X = M / nrm
    for _ in range(iters):
        X = 0.5 * (X + jnp.swapaxes(inv3(X), -1, -2))
    s = jnp.sign(jnp.linalg.det(X))
    s = jnp.where(s == 0, 1.0, s)
    return X * s[..., None, None]


def chol_solve_unrolled(A, b, jitter: float = 0.0):
    """SPD solve A x = b for small static n via fully-unrolled Cholesky +
    substitution (batched over leading dims)."""
    n = A.shape[-1]
    if jitter:
        A = A + jitter * jnp.eye(n, dtype=A.dtype)
    L = [[None] * n for _ in range(n)]
    for j in range(n):
        s = A[..., j, j]
        for k in range(j):
            s = s - L[j][k] * L[j][k]
        djj = jnp.sqrt(jnp.maximum(s, 1e-20))
        L[j][j] = djj
        for i in range(j + 1, n):
            s = A[..., i, j]
            for k in range(j):
                s = s - L[i][k] * L[j][k]
            L[i][j] = s / djj
    y = [None] * n
    for i in range(n):
        s = b[..., i]
        for k in range(i):
            s = s - L[i][k] * y[k]
        y[i] = s / L[i][i]
    x = [None] * n
    for i in reversed(range(n)):
        s = y[i]
        for k in range(i + 1, n):
            s = s - L[k][i] * x[k]
        x[i] = s / L[i][i]
    return jnp.stack(x, axis=-1)


def eig_sym3(A):
    """Eigenvalues of symmetric 3x3 (batched), ascending — the analytic
    trigonometric formula (no EighTpu custom call)."""
    a00, a11, a22 = A[..., 0, 0], A[..., 1, 1], A[..., 2, 2]
    a01, a02, a12 = A[..., 0, 1], A[..., 0, 2], A[..., 1, 2]
    p1 = a01 * a01 + a02 * a02 + a12 * a12
    q = (a00 + a11 + a22) / 3.0
    p2 = ((a00 - q) ** 2 + (a11 - q) ** 2 + (a22 - q) ** 2 + 2.0 * p1)
    p = jnp.sqrt(jnp.maximum(p2 / 6.0, 1e-30))
    Bm = (A - q[..., None, None] * jnp.eye(3, dtype=A.dtype)) / p[..., None, None]
    detB = jnp.linalg.det(Bm)
    r = jnp.clip(detB / 2.0, -1.0, 1.0)
    phi = jnp.arccos(r) / 3.0
    two_pi_3 = 2.0943951023931953
    e1 = q + 2.0 * p * jnp.cos(phi)                 # largest
    e3 = q + 2.0 * p * jnp.cos(phi + two_pi_3)      # smallest
    e2 = 3.0 * q - e1 - e3
    # p1 ~ 0: already diagonal
    diag = jnp.sort(jnp.stack([a00, a11, a22], -1), axis=-1)
    analytic = jnp.stack([e3, e2, e1], -1)
    return jnp.where((p1 < 1e-20)[..., None], diag, analytic)


def eigvec_min_sym3(A):
    """(smallest eigenvalue, its unit eigenvector) of symmetric 3x3
    (batched) without custom calls. The eigenvector is the most-stable
    cross product of rows of (A - lambda_min I)."""
    lam = eig_sym3(A)[..., 0]
    M = A - lam[..., None, None] * jnp.eye(3, dtype=A.dtype)
    r0, r1, r2 = M[..., 0, :], M[..., 1, :], M[..., 2, :]
    c01 = jnp.cross(r0, r1)
    c02 = jnp.cross(r0, r2)
    c12 = jnp.cross(r1, r2)
    n01 = jnp.sum(c01 * c01, -1)
    n02 = jnp.sum(c02 * c02, -1)
    n12 = jnp.sum(c12 * c12, -1)
    best = jnp.argmax(jnp.stack([n01, n02, n12], -1), axis=-1)
    v = jnp.where((best == 0)[..., None], c01,
                  jnp.where((best == 1)[..., None], c02, c12))
    nrm = jnp.linalg.norm(v, axis=-1, keepdims=True)
    # fully degenerate (isotropic) neighborhoods: fall back to +z
    fallback = jnp.broadcast_to(jnp.asarray([0.0, 0.0, 1.0], A.dtype), v.shape)
    v = jnp.where(nrm > 1e-15, v / jnp.maximum(nrm, 1e-30), fallback)
    return lam, v
