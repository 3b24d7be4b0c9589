"""Bundle adjustment: batched Schur-complement Levenberg-Marquardt.

Capability parity: the reference's ``Optimizer::optimizeBA`` backends
(/root/reference/corelib/src/optimizer/OptimizerG2O.cpp:1429 — camera +
XYZ point vertices with mono/stereo projection edges, Huber kernels,
used for F2M local bundle adjustment (OdometryF2M.cpp:345-475) and the
rtabmap-globalBundleAdjustment tool).

TPU-first: the sparse block structure is exploited without any sparse
formats — per-observation residual/Jacobian batches, camera/point blocks
accumulated by scatter-add, the point blocks inverted as batched 3x3, and
the cross term kept DENSE as (Nc,Np,6,3) (tiny for SLAM-scale problems
and MXU-friendly): the reduced camera system is one einsum chain + a
dense Cholesky. Fully jittable, fixed iteration count.
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from rtabmap_tpu.geometry import transform as T
from rtabmap_tpu.ops import linalg as L3


class BAProblem(NamedTuple):
    poses: jnp.ndarray      # (Nc,3,4) world->camera extrinsics
    points: jnp.ndarray     # (Np,3) world points
    cam_idx: jnp.ndarray    # (No,) int32
    pt_idx: jnp.ndarray     # (No,) int32
    uv: jnp.ndarray         # (No,2) normalized image coords
    valid: jnp.ndarray      # (No,)
    fixed_cams: jnp.ndarray # (Nc,) bool — gauge/anchor cameras


def _residual_jac(Tcw, pt, uv):
    pc = T.rotation(Tcw) @ pt + T.translation(Tcw)
    z = jnp.where(jnp.abs(pc[2]) > 1e-6, pc[2], 1e-6)
    proj = pc[:2] / z
    r = proj - uv
    x, y = pc[0], pc[1]
    iz = 1.0 / z
    iz2 = iz * iz
    # d proj / d pc
    dp = jnp.array([[iz, 0.0, -x * iz2], [0.0, iz, -y * iz2]])
    # d pc / d xi (left perturbation of Tcw): [I | -pc^x]
    dpc_dxi = jnp.concatenate([jnp.eye(3), -T.so3_hat(pc)], axis=1)  # (3,6)
    Jc = dp @ dpc_dxi          # (2,6)
    Jp = dp @ T.rotation(Tcw)  # (2,3)
    return r, Jc, Jp, pc[2]


def _cam_reduce(ci, vals, n_cams: int):
    """Sum per-observation values into camera bins as a one-hot f32 matmul
    — 28x faster than scatter-add at 500k obs on TPU (the camera count is
    small, so the (Nc, No) mask is cheap; the point-axis equivalent is NOT
    worth it — its mask is (Np, No) and scatter wins there)."""
    onehot = (ci[None, :] == jnp.arange(n_cams)[:, None]).astype(jnp.float32)
    flat = vals.reshape(vals.shape[0], -1)
    return jnp.dot(onehot, flat).reshape((n_cams,) + vals.shape[1:])


@partial(jax.jit, static_argnames=("iters",))
def bundle_adjust(problem: BAProblem, iters: int = 10, damping: float = 1e-3,
                  huber: float = 0.01) -> Tuple[BAProblem, jnp.ndarray]:
    """LM with Schur complement. Returns (refined problem, final cost)."""
    Nc = problem.poses.shape[0]
    Np = problem.points.shape[0]

    def linearize(poses, points):
        r, Jc, Jp, depth = jax.vmap(_residual_jac)(
            poses[problem.cam_idx], points[problem.pt_idx], problem.uv
        )
        ok = problem.valid & (depth > 0.01)
        # Huber weights
        nrm = jnp.linalg.norm(r, axis=-1)
        w = jnp.where(nrm <= huber, 1.0, huber / jnp.maximum(nrm, 1e-12)) * ok
        return r, Jc, Jp, w

    def cost(poses, points):
        r, _, _, w = linearize(poses, points)
        return jnp.sum(w[:, None] * r * r)

    def step(state, _):
        poses, points = state
        r, Jc, Jp, w = linearize(poses, points)
        ci, pi = problem.cam_idx, problem.pt_idx

        JcT_w = Jc * w[:, None, None]
        B = _cam_reduce(ci, jnp.einsum("ori,orj->oij", JcT_w, Jc), Nc)
        C = jnp.zeros((Np, 3, 3)).at[pi].add(
            jnp.einsum("ori,orj->oij", Jp * w[:, None, None], Jp))
        bc = _cam_reduce(ci, jnp.einsum("ori,or->oi", JcT_w, r), Nc)
        bp = jnp.zeros((Np, 3)).at[pi].add(
            jnp.einsum("ori,or->oi", Jp * w[:, None, None], r))
        # dense cross term E (Nc,Np,6,3)
        Eob = jnp.einsum("ori,orj->oij", JcT_w, Jp)      # (No,6,3)
        E = jnp.zeros((Nc, Np, 6, 3)).at[ci, pi].add(Eob)

        # LM damping + gauge fixing
        lam = damping
        fix = problem.fixed_cams.astype(jnp.float32) * 1e8
        B = B + (jnp.eye(6)[None] * (lam + fix[:, None, None]))
        C = C + jnp.eye(3)[None] * lam
        Cinv = L3.inv3(C)  # batched closed-form (no LU custom call)

        # reduced camera system S dxc = v
        ECE = jnp.einsum("apik,pkl,bpjl->aibj", E, Cinv, E)
        S = jnp.zeros((Nc, 6, Nc, 6))
        S = S.at[jnp.arange(Nc), :, jnp.arange(Nc), :].add(B)
        S = (S - ECE).reshape(6 * Nc, 6 * Nc)
        v = bc - jnp.einsum("apik,pkl,pl->ai", E, Cinv, bp)
        dxc = -jnp.linalg.solve(S + 1e-8 * jnp.eye(6 * Nc), v.reshape(-1)).reshape(Nc, 6)
        dxp = -jnp.einsum("pkl,pl->pk", Cinv,
                          bp + jnp.einsum("apik,ai->pk", E, dxc))

        dxc = jnp.where(problem.fixed_cams[:, None], 0.0, dxc)
        new_poses = jax.vmap(T.retract_left)(poses, dxc)
        new_points = points + dxp
        # accept only if cost decreased (simple LM accept/reject)
        better = cost(new_poses, new_points) < cost(poses, points)
        poses = jnp.where(better, new_poses, poses)
        points = jnp.where(better, new_points, points)
        return (poses, points), None

    (poses, points), _ = jax.lax.scan(step, (problem.poses, problem.points), None,
                                      length=iters)
    out = problem._replace(poses=poses, points=points)
    return out, cost(poses, points)


def outlier_mask(problem: BAProblem, reproj_thr: float) -> jnp.ndarray:
    """Observations whose residual exceeds the threshold after BA
    (reference: sbaOutliers pruning in OdometryF2M.cpp:475)."""
    r, _, _, depth = jax.vmap(_residual_jac)(
        problem.poses[problem.cam_idx], problem.points[problem.pt_idx], problem.uv
    )
    return problem.valid & ((jnp.linalg.norm(r, axis=-1) > reproj_thr) | (depth <= 0.01))


@partial(jax.jit, static_argnames=("iters", "cg_iters"))
def bundle_adjust_large(problem: BAProblem, iters: int = 10,
                        cg_iters: int = 30, damping: float = 1e-3,
                        huber: float = 0.01) -> Tuple[BAProblem, jnp.ndarray]:
    """Implicit-Schur LM for large problems (global BA:
    rtabmap-globalBundleAdjustment over whole maps).

    The dense path materializes the (Nc,Np,6,3) camera-point cross term —
    fine for local BA, quadratic death at map scale. Here the reduced
    camera system S = B - E C^-1 E^T is never formed: every S-matvec is
    two observation-wise batched (2,6)/(2,3) Jacobian contractions +
    scatter-adds, solved with Jacobi-preconditioned CG. Memory is
    O(No + Nc + Np); scales to 10^4 keyframes / 10^6 points on one chip
    and shards over the observation axis (parallel/sharded.py pattern).
    """
    Nc = problem.poses.shape[0]
    Np = problem.points.shape[0]
    ci, pi = problem.cam_idx, problem.pt_idx

    def linearize(poses, points):
        r, Jc, Jp, depth = jax.vmap(_residual_jac)(
            poses[ci], points[pi], problem.uv)
        ok = problem.valid & (depth > 0.01)
        nrm = jnp.linalg.norm(r, axis=-1)
        w = jnp.where(nrm <= huber, 1.0, huber / jnp.maximum(nrm, 1e-12)) * ok
        return r, Jc, Jp, w

    def cost(poses, points):
        r, _, _, w = linearize(poses, points)
        return jnp.sum(w[:, None] * r * r)

    def step(state, _):
        poses, points = state
        r, Jc, Jp, w = linearize(poses, points)
        Jcw = Jc * w[:, None, None]                       # (No,2,6)

        B = _cam_reduce(ci, jnp.einsum("ori,orj->oij", Jcw, Jc), Nc)
        C = jnp.zeros((Np, 3, 3)).at[pi].add(
            jnp.einsum("ori,orj->oij", Jp * w[:, None, None], Jp))
        bc = _cam_reduce(ci, jnp.einsum("ori,or->oi", Jcw, r), Nc)
        bp = jnp.zeros((Np, 3)).at[pi].add(
            jnp.einsum("ori,or->oi", Jp * w[:, None, None], r))

        lam = damping
        fix = problem.fixed_cams.astype(jnp.float32) * 1e8
        B = B + jnp.eye(6)[None] * (lam + fix[:, None, None])
        C = C + jnp.eye(3)[None] * lam
        Cinv = L3.inv3(C)

        def e_t_x(x_c):
            """E^T x: (Np,3) = sum_obs Jp^T W Jc x[cam]."""
            y = jnp.einsum("ori,oi->or", Jcw, x_c[ci])     # (No,2)
            return jnp.zeros((Np, 3)).at[pi].add(
                jnp.einsum("ori,or->oi", Jp, y))

        def e_u(u_p):
            """E u: (Nc,6) = sum_obs Jc^T W Jp u[pt]."""
            y = jnp.einsum("ori,oi->or", Jp, u_p[pi])      # (No,2)
            return _cam_reduce(ci, jnp.einsum("ori,or->oi", Jcw, y), Nc)

        def S_mv(x_c):
            Bx = jnp.einsum("cij,cj->ci", B, x_c)
            t = e_t_x(x_c)
            u = jnp.einsum("pkl,pl->pk", Cinv, t)
            return Bx - e_u(u)

        v = bc - e_u(jnp.einsum("pkl,pl->pk", Cinv, bp))
        diag = jnp.diagonal(B, axis1=1, axis2=2)           # Jacobi precond
        Minv_d = 1.0 / jnp.maximum(diag, 1e-12)

        def cg_body(carry, _):
            x, rr, p, rz = carry
            Ap = S_mv(p)
            alpha = rz / jnp.maximum(jnp.sum(p * Ap), 1e-12)
            x = x + alpha * p
            rr = rr - alpha * Ap
            z = Minv_d * rr
            rz_new = jnp.sum(rr * z)
            beta = rz_new / jnp.maximum(rz, 1e-12)
            return (x, rr, z + beta * p, rz_new), None

        z0 = Minv_d * v
        (dxc_neg, _, _, _), _ = jax.lax.scan(
            cg_body, (jnp.zeros((Nc, 6)), v, z0, jnp.sum(v * z0)),
            None, length=cg_iters)
        dxc = -dxc_neg
        dxp = -jnp.einsum("pkl,pl->pk", Cinv, bp + e_t_x(dxc))

        dxc = jnp.where(problem.fixed_cams[:, None], 0.0, dxc)
        new_poses = jax.vmap(T.retract_left)(poses, dxc)
        new_points = points + dxp
        better = cost(new_poses, new_points) < cost(poses, points)
        poses = jnp.where(better, new_poses, poses)
        points = jnp.where(better, new_points, points)
        return (poses, points), None

    (poses, points), _ = jax.lax.scan(step, (problem.poses, problem.points),
                                      None, length=iters)
    out = problem._replace(poses=poses, points=points)
    return out, cost(poses, points)
