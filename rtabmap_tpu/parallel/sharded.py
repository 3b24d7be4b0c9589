"""Multi-chip sharding: vocabulary search, likelihood, and pose-graph solves
over a `jax.sharding.Mesh`.

The reference is single-process (SURVEY.md §2.3/§5.8 — no distributed
backend exists in RTAB-Map; scaling beyond one machine is out of its
scope). This module is the TPU-native scaling story that replaces it:

- ``vocab`` axis: the visual-word descriptor slab is sharded across chips;
  2-NN quantization runs shard-local on the MXU and the global top-2 is
  reduced with one gather (loop-closure search scales linearly with
  chips).
- ``node`` axis: WM node slabs shard across chips; tf-idf likelihood is
  embarrassingly parallel over nodes.
- ``edge`` axis: the pose-graph PCG Hx product shards over the edge slab;
  scatter-adds into the (replicated) pose vector become psums — the
  blocked-Schur/CG pattern from the scaling playbook.

Everything uses `shard_map` + explicit PartitionSpecs so XLA inserts ICI
collectives; the same code runs on a virtual CPU mesh for tests.
"""
from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

def shard_map(f, mesh, in_specs, out_specs):
    """jax.shard_map with replication checking off (our reductions make
    outputs replicated, which the static checker cannot infer)."""
    return jax.shard_map(f, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
                         check_vma=False)

from rtabmap_tpu.ops.features import DESC_DIM


def make_mesh(n_devices: Optional[int] = None, axis: str = "shard") -> Mesh:
    devs = jax.devices()
    n = n_devices or len(devs)
    return Mesh(np.array(devs[:n]), (axis,))


# ------------------------------------------------------------- vocabulary 2NN


def sharded_knn2(mesh: Mesh, query, slab, slab_valid, axis: str = "shard"):
    """Exact global 2-NN of query (Q,D) against a word slab sharded over
    ``axis``. Returns (dists (Q,2), global indices (Q,2)).

    Per-shard matmul top-2 (MXU) -> all_gather of 2 candidates/shard ->
    final top-2. Communication: Q x 2 x n_shards scalars, negligible next
    to the matmul.
    """
    n_shards = mesh.shape[axis]
    W = slab.shape[0]
    shard_w = W // n_shards

    def local(query, slab_l, valid_l):
        sim = jnp.dot(query.astype(jnp.bfloat16), slab_l.astype(jnp.bfloat16).T,
                      preferred_element_type=jnp.float32)
        dist = jnp.where(valid_l[None, :], (DESC_DIM - sim) * 0.5, 1e9)
        nd, ni = jax.lax.top_k(-dist, 2)
        my = jax.lax.axis_index(axis)
        gi = ni + my * shard_w
        # gather candidates from every shard
        all_d = jax.lax.all_gather(-nd, axis)   # (S,Q,2)
        all_i = jax.lax.all_gather(gi, axis)
        all_d = jnp.moveaxis(all_d, 0, 1).reshape(query.shape[0], -1)
        all_i = jnp.moveaxis(all_i, 0, 1).reshape(query.shape[0], -1)
        nd2, sel = jax.lax.top_k(-all_d, 2)
        return -nd2, jnp.take_along_axis(all_i, sel, axis=1)

    fn = shard_map(
        local, mesh=mesh,
        in_specs=(P(), P(axis, None), P(axis)),
        out_specs=(P(), P()),
    )
    return fn(query, slab, slab_valid)


# ---------------------------------------------------------------- likelihood


def sharded_tfidf(mesh: Mesh, query_words, node_words, node_valid, word_nw,
                  n_places, vocab_cap: int, axis: str = "shard"):
    """tf-idf likelihood with the node slab sharded over ``axis``.
    Output is the full (N,) likelihood (gathered)."""

    def local(qw, nwords, nvalid, nw_arr):
        from rtabmap_tpu.vocab.dictionary import tfidf_likelihood

        lik = tfidf_likelihood(qw, nwords, nvalid, nw_arr, n_places, vocab_cap)
        return lik

    fn = shard_map(
        local, mesh=mesh,
        in_specs=(P(), P(axis, None), P(axis), P()),
        out_specs=P(axis),
    )
    return fn(query_words, node_words, node_valid, word_nw)


# ------------------------------------------------------------ pose-graph PCG


def sharded_pcg_step(mesh: Mesh, poses, edges_from, edges_to, edges_meas,
                     edges_info, edge_valid, root: int, damping: float = 1e-4,
                     cg_iters: int = 32, axis: str = "shard"):
    """One distributed Gauss-Newton step: edges sharded, poses replicated;
    every edge-scatter becomes a psum over the mesh axis."""
    from rtabmap_tpu.optim.pose_graph import _edge_residual_jac
    from rtabmap_tpu.geometry import transform as T

    N = poses.shape[0]

    def local(poses, ef, et, meas, info, ev):
        r, Ji, Jj = jax.vmap(_edge_residual_jac)(poses[ef], poses[et], meas)
        info_w = info * ev[:, None, None]
        root_mask = jnp.zeros((N,)).at[root].set(1.0)
        fix_diag = root_mask * 1e8 + damping

        def scatter(val_i, val_j):
            out = jnp.zeros((N, 6))
            out = out.at[ef].add(val_i).at[et].add(val_j)
            return jax.lax.psum(out, axis)

        oy = jnp.einsum("eij,ej->ei", info_w, r)
        b = -scatter(jnp.einsum("eji,ej->ei", Ji, oy), jnp.einsum("eji,ej->ei", Jj, oy))

        di = jnp.einsum("eki,ekl,eli->ei", Ji, info_w, Ji)
        dj = jnp.einsum("eki,ekl,eli->ei", Jj, info_w, Jj)
        diag = scatter(di, dj) + fix_diag[:, None] + 1e-8
        Minv = 1.0 / diag

        def hx(x):
            yi = jnp.einsum("eij,ej->ei", Ji, x[ef]) + jnp.einsum("eij,ej->ei", Jj, x[et])
            oy = jnp.einsum("eij,ej->ei", info_w, yi)
            return scatter(jnp.einsum("eji,ej->ei", Ji, oy),
                           jnp.einsum("eji,ej->ei", Jj, oy)) + fix_diag[:, None] * x

        def cg_body(carry, _):
            x, rr, p, rz = carry
            Ap = hx(p)
            alpha = rz / jnp.maximum(jnp.sum(p * Ap), 1e-12)
            x = x + alpha * p
            rr = rr - alpha * Ap
            z = Minv * rr
            rz_new = jnp.sum(rr * z)
            beta = rz_new / jnp.maximum(rz, 1e-12)
            return (x, rr, z + beta * p, rz_new), None

        z0 = Minv * b
        (dx, _, _, _), _ = jax.lax.scan(cg_body, (jnp.zeros((N, 6)), b, z0, jnp.sum(b * z0)),
                                        None, length=cg_iters)
        nrm = jnp.linalg.norm(dx, axis=-1, keepdims=True)
        dx = dx * jnp.minimum(1.0, 1.0 / jnp.maximum(nrm, 1e-9))
        return T.retract(poses, dx)

    fn = shard_map(
        local, mesh=mesh,
        in_specs=(P(), P(axis), P(axis), P(axis, None, None),
                  P(axis, None, None), P(axis)),
        out_specs=P(),
    )
    return fn(poses, edges_from, edges_to, edges_meas, edges_info, edge_valid)


# ------------------------------------------------------------ distributed BA


def sharded_ba_step(mesh: Mesh, poses, points, cam_idx, pt_idx, uv, valid,
                    fixed_cams, damping: float = 1e-3, huber: float = 0.01,
                    axis: str = "shard"):
    """One distributed Schur-complement LM/GN bundle-adjustment step with the
    OBSERVATION slab sharded over the mesh axis (poses/points replicated).

    The reference's ``Optimizer::optimizeBA`` backends (OptimizerG2O.cpp:1429)
    are single-machine sparse solvers; here the per-observation
    residual/Jacobian work — the O(No) part that dominates large BA — runs
    shard-local and the camera/point normal-equation blocks are psum-reduced
    over ICI. The reduced camera system (small: 6·Nc) is solved replicated on
    every chip. Same math as ``optim.ba.bundle_adjust``'s inner step.

    Returns (new_poses (Nc,3,4), new_points (Np,3)).
    """
    from rtabmap_tpu.geometry import transform as T
    from rtabmap_tpu.ops import linalg as L3
    from rtabmap_tpu.optim.ba import _residual_jac

    Nc = poses.shape[0]
    Np = points.shape[0]

    def local(poses, points, ci, pi, uv, ok):
        r, Jc, Jp, depth = jax.vmap(_residual_jac)(poses[ci], points[pi], uv)
        nrm = jnp.linalg.norm(r, axis=-1)
        w = (jnp.where(nrm <= huber, 1.0, huber / jnp.maximum(nrm, 1e-12))
             * (ok & (depth > 0.01)))
        JcT_w = Jc * w[:, None, None]
        Jp_w = Jp * w[:, None, None]

        def red(x):
            return jax.lax.psum(x, axis)

        B = red(jnp.zeros((Nc, 6, 6)).at[ci].add(jnp.einsum("ori,orj->oij", JcT_w, Jc)))
        C = red(jnp.zeros((Np, 3, 3)).at[pi].add(jnp.einsum("ori,orj->oij", Jp_w, Jp)))
        bc = red(jnp.zeros((Nc, 6)).at[ci].add(jnp.einsum("ori,or->oi", JcT_w, r)))
        bp = red(jnp.zeros((Np, 3)).at[pi].add(jnp.einsum("ori,or->oi", Jp_w, r)))
        E = red(jnp.zeros((Nc, Np, 6, 3)).at[ci, pi].add(
            jnp.einsum("ori,orj->oij", JcT_w, Jp)))

        fix = fixed_cams.astype(jnp.float32) * 1e8
        B = B + jnp.eye(6)[None] * (damping + fix[:, None, None])
        C = C + jnp.eye(3)[None] * damping
        Cinv = L3.inv3(C)

        ECE = jnp.einsum("apik,pkl,bpjl->aibj", E, Cinv, E)
        S = jnp.zeros((Nc, 6, Nc, 6))
        S = S.at[jnp.arange(Nc), :, jnp.arange(Nc), :].add(B)
        S = (S - ECE).reshape(6 * Nc, 6 * Nc)
        v = bc - jnp.einsum("apik,pkl,pl->ai", E, Cinv, bp)
        dxc = -jnp.linalg.solve(S + 1e-8 * jnp.eye(6 * Nc),
                                v.reshape(-1)).reshape(Nc, 6)
        dxp = -jnp.einsum("pkl,pl->pk", Cinv,
                          bp + jnp.einsum("apik,ai->pk", E, dxc))
        dxc = jnp.where(fixed_cams[:, None], 0.0, dxc)
        return jax.vmap(T.retract_left)(poses, dxc), points + dxp

    fn = shard_map(
        local, mesh=mesh,
        in_specs=(P(), P(), P(axis), P(axis), P(axis, None), P(axis)),
        out_specs=(P(), P()),
    )
    return fn(poses, points, cam_idx, pt_idx, uv, valid)


# -------------------------------------------------------- data-parallel VO


def sharded_vo_step(mesh: Mesh, grays_a, depths_a, grays_b, depths_b, keys,
                    cam, max_kp: int = 384, axis: str = "shard"):
    """Data-parallel visual-odometry fleet: a batch of frame pairs (one per
    stream — multi-robot / multi-camera serving) sharded over the mesh.

    The reference has no multi-stream story at all (one process, one
    camera); this is the deployment shape the TPU build adds: each chip
    runs the identical jitted VO step on its shard of the stream batch —
    pure DP, no collectives in the step itself.

    Returns (poses (B,3,4), n_inliers (B,)).
    """
    from rtabmap_tpu.core.frame import extract_features
    from rtabmap_tpu.ops import matching as M
    from rtabmap_tpu.ops import ransac as R

    def one(gray_a, depth_a, gray_b, depth_b, key):
        a = extract_features(gray_a, depth_a, cam, max_kp)
        b = extract_features(gray_b, depth_b, cam, max_kp)
        m_ba, m_ab = M.match_nndr_bidir(b.desc, b.valid, a.desc,
                                        a.valid & a.valid3d)
        mutual = M.cross_check(m_ba, m_ab)
        res = R.ransac_pnp(a.pts3d[m_ba.idx], b.uv, mutual, cam, key,
                           iters=192, reproj_px=3.0,
                           pts3d_query=jnp.where(b.valid3d[:, None], b.pts3d, 0.0))
        return res.transform, res.num_inliers

    def local(ga, da, gb, db, ks):
        return jax.vmap(one)(ga, da, gb, db, ks)

    fn = shard_map(
        local, mesh=mesh,
        in_specs=(P(axis), P(axis), P(axis), P(axis), P(axis)),
        out_specs=(P(axis), P(axis)),
    )
    return fn(grays_a, depths_a, grays_b, depths_b, keys)


# ---------------------------------------------------- sharded WM/LTM store


def sharded_ba_large_step(mesh: Mesh, poses, points, cam_idx, pt_idx, uv,
                          valid, fixed_cams, damping: float = 1e-3,
                          huber: float = 0.01, cg_iters: int = 20,
                          axis: str = "shard"):
    """Distributed map-scale BA step: observation axis sharded, implicit
    Schur-CG (no dense cross term — the multi-chip form of
    ``optim.ba.bundle_adjust_large``). Every E/E^T matvec inside CG is a
    shard-local Jacobian contraction + one psum; memory per chip is
    O(No/n_shards + Nc + Np)."""
    from rtabmap_tpu.geometry import transform as T
    from rtabmap_tpu.ops import linalg as L3
    from rtabmap_tpu.optim.ba import _residual_jac

    Nc = poses.shape[0]
    Np = points.shape[0]

    def local(poses, points, ci, pi, uv, ok):
        r, Jc, Jp, depth = jax.vmap(_residual_jac)(poses[ci], points[pi], uv)
        nrm = jnp.linalg.norm(r, axis=-1)
        w = (jnp.where(nrm <= huber, 1.0, huber / jnp.maximum(nrm, 1e-12))
             * (ok & (depth > 0.01)))
        Jcw = Jc * w[:, None, None]
        Jpw = Jp * w[:, None, None]

        def red(x):
            return jax.lax.psum(x, axis)

        from rtabmap_tpu.optim.ba import _cam_reduce

        B = red(_cam_reduce(ci, jnp.einsum("ori,orj->oij", Jcw, Jc), Nc))
        C = red(jnp.zeros((Np, 3, 3)).at[pi].add(
            jnp.einsum("ori,orj->oij", Jpw, Jp)))
        bc = red(_cam_reduce(ci, jnp.einsum("ori,or->oi", Jcw, r), Nc))
        bp = red(jnp.zeros((Np, 3)).at[pi].add(
            jnp.einsum("ori,or->oi", Jpw, r)))

        fix = fixed_cams.astype(jnp.float32) * 1e8
        B = B + jnp.eye(6)[None] * (damping + fix[:, None, None])
        C = C + jnp.eye(3)[None] * damping
        Cinv = L3.inv3(C)

        def e_t_x(x_c):
            y = jnp.einsum("ori,oi->or", Jcw, x_c[ci])
            return red(jnp.zeros((Np, 3)).at[pi].add(
                jnp.einsum("ori,or->oi", Jp, y)))

        def e_u(u_p):
            y = jnp.einsum("ori,oi->or", Jp, u_p[pi])
            return red(_cam_reduce(ci, jnp.einsum("ori,or->oi", Jcw, y), Nc))

        def S_mv(x_c):
            Bx = jnp.einsum("cij,cj->ci", B, x_c)
            u = jnp.einsum("pkl,pl->pk", Cinv, e_t_x(x_c))
            return Bx - e_u(u)

        v = bc - e_u(jnp.einsum("pkl,pl->pk", Cinv, bp))
        Minv_d = 1.0 / jnp.maximum(jnp.diagonal(B, axis1=1, axis2=2), 1e-12)

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
        dxc = jnp.where(fixed_cams[:, None], 0.0, dxc)
        return jax.vmap(T.retract_left)(poses, dxc), points + dxp

    fn = shard_map(
        local, mesh=mesh,
        in_specs=(P(), P(), P(axis), P(axis), P(axis, None), P(axis)),
        out_specs=(P(), P()),
    )
    return fn(poses, points, cam_idx, pt_idx, uv, valid)
