"""ICP registration: point-to-point and point-to-plane on fixed slabs.

Capability parity: the reference's ``RegistrationIcp``
(/root/reference/corelib/src/RegistrationIcp.cpp:314 — PCL /
libpointmatcher / CCCoreLib strategies, point-to-point or point-to-plane,
voxel pre-filtering, correspondence-ratio gating) — re-designed as one
jittable fixed-iteration loop: correspondences are exact brute-force
nearest neighbours via a blocked distance matmul (MXU), rejection by
max-distance mask, and the 6x6 solve is closed-form per iteration.
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from rtabmap_tpu.geometry import transform as T
from rtabmap_tpu.ops import linalg as L3
from rtabmap_tpu.ops.ransac import rigid_from_correspondences


class IcpResult(NamedTuple):
    transform: jnp.ndarray        # (3,4) dst <- src
    valid: jnp.ndarray            # ()
    correspondence_ratio: jnp.ndarray
    fitness_rmse: jnp.ndarray
    iterations: int = 0


def _nn_blocked(src, dst, dst_valid, block: int = 2048):
    """For each src point: index+dist2 of nearest dst point.

    On TPU with aligned sizes this dispatches to the fused Pallas kernel
    (ops/pallas/nn3d.py) — the lax.scan fallback below carries its running
    best through HBM every block."""
    from rtabmap_tpu.ops.pallas.nn3d import nn3d_ok, pallas_nn3d

    if nn3d_ok(src.shape[0], dst.shape[0]):
        return pallas_nn3d(src.T, dst.T, dst_valid)
    n = dst.shape[0]
    nb = (n + block - 1) // block
    pad = nb * block - n
    dstp = jnp.pad(dst, ((0, pad), (0, 0)))
    vp = jnp.pad(dst_valid, (0, pad))
    s2 = jnp.sum(src * src, axis=-1, keepdims=True)

    def body(carry, bi):
        bd, bidx = carry
        blk = jax.lax.dynamic_slice_in_dim(dstp, bi * block, block, axis=0)
        bv = jax.lax.dynamic_slice_in_dim(vp, bi * block, block, axis=0)
        d2 = s2 - 2.0 * src @ blk.T + jnp.sum(blk * blk, axis=-1)[None, :]
        d2 = jnp.where(bv[None, :], d2, jnp.inf)
        m = jnp.min(d2, axis=1)
        mi = jnp.argmin(d2, axis=1).astype(jnp.int32) + bi * block
        better = m < bd
        return (jnp.where(better, m, bd), jnp.where(better, mi, bidx)), None

    init = (jnp.full((src.shape[0],), jnp.inf), jnp.zeros((src.shape[0],), jnp.int32))
    (d, i), _ = jax.lax.scan(body, init, jnp.arange(nb))
    return d, i


@partial(jax.jit, static_argnames=("iters", "point_to_plane"))
def icp(src, src_valid, dst, dst_valid, guess=None,
        dst_normals: Optional[jnp.ndarray] = None,
        iters: int = 30, max_corr_dist: float = 0.5,
        point_to_plane: bool = False,
        min_corr_ratio: float = 0.2) -> IcpResult:
    """Align src onto dst: returns T with dst ≈ T(src).

    All arrays fixed-size with validity masks; the correspondence search
    and the solve run on device with no host sync per iteration.
    """
    if guess is None:
        guess = T.identity()

    def p2p_step(Tcur):
        moved = T.apply(Tcur[None], src[None])[0]
        d2, idx = _nn_blocked(moved, dst, dst_valid)
        w = (src_valid & (d2 < max_corr_dist ** 2)).astype(jnp.float32)
        delta = rigid_from_correspondences(moved, dst[idx], w)
        return T.compose(delta, Tcur), w, d2

    def p2l_step(Tcur):
        moved = T.apply(Tcur[None], src[None])[0]
        d2, idx = _nn_blocked(moved, dst, dst_valid)
        w = (src_valid & (d2 < max_corr_dist ** 2)).astype(jnp.float32)
        q = dst[idx]
        nrm = dst_normals[idx]
        r = jnp.sum((moved - q) * nrm, axis=-1)          # signed plane dist
        # J_i = [n^T, (p x n)^T] for xi = [rho, phi] (left perturbation)
        J = jnp.concatenate([nrm, jnp.cross(moved, nrm)], axis=-1)  # (N,6)
        H = jnp.einsum("ni,nj,n->ij", J, J, w) + 1e-6 * jnp.eye(6)
        b = jnp.einsum("ni,n,n->i", J, r, w)
        xi = -L3.chol_solve_unrolled(H, b)
        return T.compose(T.se3_exp(xi), Tcur), w, d2

    step = p2l_step if point_to_plane else p2p_step

    def body(i, Tcur):
        Tn, _, _ = step(Tcur)
        return Tn

    Tfinal = jax.lax.fori_loop(0, iters, body, guess)
    # final stats
    moved = T.apply(Tfinal[None], src[None])[0]
    d2, idx = _nn_blocked(moved, dst, dst_valid)
    inl = src_valid & (d2 < max_corr_dist ** 2)
    n_src = jnp.maximum(jnp.sum(src_valid), 1)
    ratio = jnp.sum(inl) / n_src
    # d2 from the blocked expansion can be ~-1e-12 for exact matches
    rmse = jnp.sqrt(jnp.sum(jnp.where(inl, jnp.maximum(d2, 0.0), 0.0))
                    / jnp.maximum(jnp.sum(inl), 1))
    return IcpResult(
        transform=Tfinal,
        valid=ratio >= min_corr_ratio,
        correspondence_ratio=ratio,
        fitness_rmse=rmse,
        iterations=iters,
    )


def register_scans(scan_src, valid_src, scan_dst, valid_dst, guess=None,
                   voxel: float = 0.05, point_to_plane: bool = True,
                   max_corr_dist: float = 0.5, iters: int = 30):
    """Full RegistrationIcp-parity pipeline: voxel filter both scans,
    estimate dst normals (if point-to-plane), run ICP, covariance from
    residuals. Returns (IcpResult, covariance 6x6)."""
    from rtabmap_tpu.ops import cloud as CL

    if voxel > 0:
        valid_src = CL.voxel_filter(scan_src, valid_src, voxel)
        valid_dst = CL.voxel_filter(scan_dst, valid_dst, voxel)
    normals = None
    if point_to_plane:
        normals, _ = CL.estimate_normals(scan_dst, valid_dst, k=8)
    res = icp(scan_src, valid_src, scan_dst, valid_dst, guess=guess,
              dst_normals=normals, iters=iters, max_corr_dist=max_corr_dist,
              point_to_plane=point_to_plane)
    var = jnp.maximum(res.fitness_rmse ** 2, 1e-6)
    cov = jnp.diag(jnp.concatenate([jnp.full((3,), var), jnp.full((3,), var * 0.1)]))
    return res, cov
