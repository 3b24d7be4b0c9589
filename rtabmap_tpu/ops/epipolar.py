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
    _, _, Vt = jnp.linalg.svd(A, full_matrices=True)
    F = Vt[..., -1, :].reshape((*A.shape[:-2], 3, 3))
    # enforce rank 2
    U, S, Vt2 = jnp.linalg.svd(F)
    S = S.at[..., 2].set(0.0)
    F = (U * S[..., None, :]) @ Vt2
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


def check_hypothesis(uv_a, uv_b, valid, key, min_pairs: int = 8,
                     threshold_px: float = 3.0, inlier_ratio: float = 0.5):
    """Loop-hypothesis verification (reference: EpipolarGeometry::check —
    accept when enough correspondences satisfy one epipolar geometry)."""
    n = jnp.sum(valid)
    F, inl = ransac_fundamental(uv_a, uv_b, valid, key, threshold_px=threshold_px)
    ok = (n >= min_pairs) & (jnp.sum(inl) >= jnp.maximum(inlier_ratio * n, min_pairs))
    return ok, F, inl
