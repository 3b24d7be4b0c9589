"""SE(3) / SO(3) batched geometry ops, TPU-first.

Capability parity target: ``Transform`` in the reference
(/root/reference/corelib/include/rtabmap/core/Transform.h:41,
corelib/src/Transform.cpp) — rigid transforms with compose/inverse,
quaternion/Euler conversions, interpolation — but designed as pure
functions over batched arrays instead of a pointer-based class, so every
op vmaps/jits and runs on the VPU.

Representation: a pose is a ``(..., 3, 4)`` float array ``[R | t]``
(same memory layout as the reference's 3x4) — batch dims lead.
Tangent vectors are ``(..., 6)`` with convention ``[rho(3), phi(3)]``
(translation first, rotation last — matches the reference's
(x,y,z,roll,pitch,yaw) ordering at the linearization point).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

_EPS = 1e-9


def identity(batch_shape=(), dtype=jnp.float32):
    eye = jnp.concatenate(
        [jnp.eye(3, dtype=dtype), jnp.zeros((3, 1), dtype=dtype)], axis=-1
    )
    return jnp.broadcast_to(eye, (*batch_shape, 3, 4))


def from_rt(R, t):
    """Build pose(s) from rotation (...,3,3) and translation (...,3)."""
    return jnp.concatenate([R, t[..., None]], axis=-1)


def rotation(T):
    return T[..., :3, :3]


def translation(T):
    return T[..., :3, 3]


def compose(A, B):
    """A @ B for 3x4 rigid transforms (batched)."""
    Ra, ta = rotation(A), translation(A)
    Rb, tb = rotation(B), translation(B)
    R = Ra @ Rb
    t = jnp.einsum("...ij,...j->...i", Ra, tb) + ta
    return from_rt(R, t)


def inverse(T):
    R, t = rotation(T), translation(T)
    Rt = jnp.swapaxes(R, -1, -2)
    return from_rt(Rt, -jnp.einsum("...ij,...j->...i", Rt, t))


def apply(T, pts):
    """Transform points: T (...,3,4) applied to pts (...,N,3) -> (...,N,3)."""
    R, t = rotation(T), translation(T)
    return jnp.einsum("...ij,...nj->...ni", R, pts) + t[..., None, :]


def relative(A, B):
    """A^-1 @ B — the motion taking frame A to frame B."""
    return compose(inverse(A), B)


# ----------------------------------------------------------------------------- SO(3)


def so3_hat(phi):
    """(...,3) -> (...,3,3) skew-symmetric."""
    x, y, z = phi[..., 0], phi[..., 1], phi[..., 2]
    zero = jnp.zeros_like(x)
    return jnp.stack(
        [
            jnp.stack([zero, -z, y], axis=-1),
            jnp.stack([z, zero, -x], axis=-1),
            jnp.stack([-y, x, zero], axis=-1),
        ],
        axis=-2,
    )


def so3_exp(phi):
    """Rodrigues: (...,3) -> (...,3,3). Safe at phi=0 via Taylor blending."""
    theta2 = jnp.sum(phi * phi, axis=-1)
    theta = jnp.sqrt(jnp.maximum(theta2, _EPS))
    small = theta2 < 1e-8
    # sin(t)/t and (1-cos t)/t^2, with Taylor fallbacks
    a = jnp.where(small, 1.0 - theta2 / 6.0, jnp.sin(theta) / theta)
    b = jnp.where(small, 0.5 - theta2 / 24.0, (1.0 - jnp.cos(theta)) / theta2)
    K = so3_hat(phi)
    I = jnp.broadcast_to(jnp.eye(3, dtype=phi.dtype), K.shape)
    return I + a[..., None, None] * K + b[..., None, None] * (K @ K)


def so3_log(R):
    """(...,3,3) -> (...,3). Handles angles near 0 and near pi.

    AD-safe: every branch is evaluated on guarded inputs so jacfwd/jacrev
    stay finite even at exact identity (needed by the pose-graph
    optimizer's vmapped edge Jacobians).
    """
    trace = R[..., 0, 0] + R[..., 1, 1] + R[..., 2, 2]
    cos_t = jnp.clip((trace - 1.0) * 0.5, -1.0, 1.0)
    vee = jnp.stack(
        [
            R[..., 2, 1] - R[..., 1, 2],
            R[..., 0, 2] - R[..., 2, 0],
            R[..., 1, 0] - R[..., 0, 1],
        ],
        axis=-1,
    )
    # theta via atan2(sin, cos): |vee| = 2 sin(theta); the max() floor keeps
    # sqrt differentiable at identity (derivative clamps to 0, not inf)
    sin_sq = jnp.sum(vee * vee, axis=-1) * 0.25
    sin_t = jnp.sqrt(jnp.maximum(sin_sq, 1e-24))
    theta = jnp.arctan2(sin_t, cos_t)
    small = theta < 1e-4
    # generic scale with a guarded denominator (safe value where unselected)
    sin_safe = jnp.where(small, 1.0, sin_t)
    scale = jnp.where(small, 0.5 + theta * theta / 12.0, theta / (2.0 * sin_safe))
    generic = scale[..., None] * vee
    # near pi: axis from diagonal of (R + I)/2, guarded divisions/sqrts
    near_pi = theta > jnp.pi - 1e-3
    B = (R + jnp.swapaxes(R, -1, -2)) * 0.5
    diag = jnp.stack([B[..., 0, 0], B[..., 1, 1], B[..., 2, 2]], axis=-1)
    denom = jnp.where(near_pi, 1.0 - cos_t, 1.0)[..., None]
    axis_sq = jnp.clip((diag - cos_t[..., None]) / denom, 0.0, None)
    axis = jnp.sqrt(jnp.maximum(axis_sq, 1e-24))
    sgn = jnp.where(vee >= 0, 1.0, -1.0)
    axis = axis * sgn
    axis = axis / jnp.maximum(jnp.linalg.norm(axis, axis=-1, keepdims=True), _EPS)
    return jnp.where(near_pi[..., None], axis * theta[..., None], generic)


def _so3_left_jacobian(phi):
    """V such that exp_se3 translation = V @ rho."""
    theta2 = jnp.sum(phi * phi, axis=-1)
    theta = jnp.sqrt(jnp.maximum(theta2, _EPS))
    small = theta2 < 1e-8
    b = jnp.where(small, 0.5 - theta2 / 24.0, (1.0 - jnp.cos(theta)) / theta2)
    c = jnp.where(
        small, 1.0 / 6.0 - theta2 / 120.0, (theta - jnp.sin(theta)) / (theta2 * theta)
    )
    K = so3_hat(phi)
    I = jnp.broadcast_to(jnp.eye(3, dtype=phi.dtype), K.shape)
    return I + b[..., None, None] * K + c[..., None, None] * (K @ K)


def _so3_left_jacobian_inv(phi):
    theta2 = jnp.sum(phi * phi, axis=-1)
    theta = jnp.sqrt(jnp.maximum(theta2, _EPS))
    small = theta2 < 1e-8
    half = theta * 0.5
    cot_term = jnp.where(
        small,
        1.0 / 12.0 + theta2 / 720.0,
        (1.0 - half * jnp.cos(half) / jnp.maximum(jnp.sin(half), _EPS)) / jnp.maximum(theta2, _EPS),
    )
    K = so3_hat(phi)
    I = jnp.broadcast_to(jnp.eye(3, dtype=phi.dtype), K.shape)
    return I - 0.5 * K + cot_term[..., None, None] * (K @ K)


# ----------------------------------------------------------------------------- SE(3)


def se3_exp(xi):
    """(...,6) [rho, phi] -> (...,3,4)."""
    rho, phi = xi[..., :3], xi[..., 3:]
    R = so3_exp(phi)
    V = _so3_left_jacobian(phi)
    t = jnp.einsum("...ij,...j->...i", V, rho)
    return from_rt(R, t)


def se3_log(T):
    """(...,3,4) -> (...,6) [rho, phi]."""
    R, t = rotation(T), translation(T)
    phi = so3_log(R)
    Vinv = _so3_left_jacobian_inv(phi)
    rho = jnp.einsum("...ij,...j->...i", Vinv, t)
    return jnp.concatenate([rho, phi], axis=-1)


def retract(T, xi):
    """Right-multiplicative retraction: T * exp(xi)."""
    return compose(T, se3_exp(xi))


def retract_left(T, xi):
    """Left-multiplicative retraction: exp(xi) * T."""
    return compose(se3_exp(xi), T)


# ----------------------------------------------------------------------------- quaternions / euler


def to_quaternion(T):
    """(...,3,4) -> (...,4) quaternion [x,y,z,w] (reference convention)."""
    R = rotation(T)
    m00, m01, m02 = R[..., 0, 0], R[..., 0, 1], R[..., 0, 2]
    m10, m11, m12 = R[..., 1, 0], R[..., 1, 1], R[..., 1, 2]
    m20, m21, m22 = R[..., 2, 0], R[..., 2, 1], R[..., 2, 2]
    tr = m00 + m11 + m22
    # four candidate constructions; pick the numerically largest pivot
    qw0 = jnp.sqrt(jnp.maximum(1.0 + tr, _EPS)) * 0.5
    s0 = 0.25 / jnp.maximum(qw0, _EPS)
    c0 = jnp.stack([(m21 - m12) * s0, (m02 - m20) * s0, (m10 - m01) * s0, qw0], -1)

    qx1 = jnp.sqrt(jnp.maximum(1.0 + m00 - m11 - m22, _EPS)) * 0.5
    s1 = 0.25 / jnp.maximum(qx1, _EPS)
    c1 = jnp.stack([qx1, (m01 + m10) * s1, (m02 + m20) * s1, (m21 - m12) * s1], -1)

    qy2 = jnp.sqrt(jnp.maximum(1.0 - m00 + m11 - m22, _EPS)) * 0.5
    s2 = 0.25 / jnp.maximum(qy2, _EPS)
    c2 = jnp.stack([(m01 + m10) * s2, qy2, (m12 + m21) * s2, (m02 - m20) * s2], -1)

    qz3 = jnp.sqrt(jnp.maximum(1.0 - m00 - m11 + m22, _EPS)) * 0.5
    s3 = 0.25 / jnp.maximum(qz3, _EPS)
    c3 = jnp.stack([(m02 + m20) * s3, (m12 + m21) * s3, qz3, (m10 - m01) * s3], -1)

    pivots = jnp.stack([tr, m00 - m11 - m22, m11 - m00 - m22, m22 - m00 - m11], -1)
    idx = jnp.argmax(pivots, axis=-1)
    cands = jnp.stack([c0, c1, c2, c3], axis=-2)  # (...,4cand,4)
    q = jnp.take_along_axis(cands, idx[..., None, None].astype(jnp.int32), axis=-2)[
        ..., 0, :
    ]
    return q / jnp.maximum(jnp.linalg.norm(q, axis=-1, keepdims=True), _EPS)


def from_quaternion(q, t=None):
    """quaternion [x,y,z,w] (+ optional translation) -> (...,3,4)."""
    q = q / jnp.maximum(jnp.linalg.norm(q, axis=-1, keepdims=True), _EPS)
    x, y, z, w = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    R = jnp.stack(
        [
            jnp.stack([1 - 2 * (y * y + z * z), 2 * (x * y - z * w), 2 * (x * z + y * w)], -1),
            jnp.stack([2 * (x * y + z * w), 1 - 2 * (x * x + z * z), 2 * (y * z - x * w)], -1),
            jnp.stack([2 * (x * z - y * w), 2 * (y * z + x * w), 1 - 2 * (x * x + y * y)], -1),
        ],
        axis=-2,
    )
    if t is None:
        t = jnp.zeros((*q.shape[:-1], 3), dtype=q.dtype)
    return from_rt(R, t)


def from_xyzrpy(xyzrpy):
    """(...,6) [x,y,z,roll,pitch,yaw] -> (...,3,4). ZYX euler (reference order)."""
    x, y, z = xyzrpy[..., 0], xyzrpy[..., 1], xyzrpy[..., 2]
    r, p, yw = xyzrpy[..., 3], xyzrpy[..., 4], xyzrpy[..., 5]
    cr, sr = jnp.cos(r), jnp.sin(r)
    cp, sp = jnp.cos(p), jnp.sin(p)
    cy, sy = jnp.cos(yw), jnp.sin(yw)
    R = jnp.stack(
        [
            jnp.stack([cy * cp, cy * sp * sr - sy * cr, cy * sp * cr + sy * sr], -1),
            jnp.stack([sy * cp, sy * sp * sr + cy * cr, sy * sp * cr - cy * sr], -1),
            jnp.stack([-sp, cp * sr, cp * cr], -1),
        ],
        axis=-2,
    )
    return from_rt(R, jnp.stack([x, y, z], axis=-1))


def to_xyzrpy(T):
    R, t = rotation(T), translation(T)
    sp = -R[..., 2, 0]
    p = jnp.arcsin(jnp.clip(sp, -1.0, 1.0))
    r = jnp.arctan2(R[..., 2, 1], R[..., 2, 2])
    yw = jnp.arctan2(R[..., 1, 0], R[..., 0, 0])
    return jnp.concatenate([t, jnp.stack([r, p, yw], axis=-1)], axis=-1)


def interpolate(A, B, alpha):
    """Pose slerp+lerp: A..B at fraction alpha (broadcastable)."""
    dT = relative(A, B)
    xi = se3_log(dT)
    return compose(A, se3_exp(xi * jnp.asarray(alpha)[..., None]))


def orthonormalize(T):
    """Re-project rotation onto SO(3) via SVD (batched)."""
    R, t = rotation(T), translation(T)
    U, _, Vt = jnp.linalg.svd(R)
    det = jnp.linalg.det(U @ Vt)
    D = jnp.concatenate(
        [jnp.ones((*det.shape, 2)), det[..., None]], axis=-1
    )
    Rn = (U * D[..., None, :]) @ Vt
    return from_rt(Rn.astype(T.dtype), t)


def translation_norm(T):
    return jnp.linalg.norm(translation(T), axis=-1)


def rotation_angle(T):
    """Geodesic rotation angle in radians.

    atan2(|vee|/2, (tr-1)/2) instead of arccos — float32-accurate at small
    angles (arccos loses ~4e-4 rad near identity, which would swamp the
    pose-graph error-gate ratios against mrad-level link stddevs).
    """
    R = T[..., :3, :3]
    tr = R[..., 0, 0] + R[..., 1, 1] + R[..., 2, 2]
    vee = jnp.stack(
        [
            R[..., 2, 1] - R[..., 1, 2],
            R[..., 0, 2] - R[..., 2, 0],
            R[..., 1, 0] - R[..., 0, 1],
        ],
        axis=-1,
    )
    sin_t = 0.5 * jnp.linalg.norm(vee, axis=-1)
    cos_t = jnp.clip((tr - 1.0) * 0.5, -1.0, 1.0)
    return jnp.arctan2(sin_t, cos_t)


def is_identity(T, tol=1e-6):
    return jnp.logical_and(translation_norm(T) < tol, rotation_angle(T) < tol)


def to_matrix4(T):
    """(...,3,4) -> (...,4,4) homogeneous."""
    bottom = jnp.broadcast_to(
        jnp.array([0.0, 0.0, 0.0, 1.0], dtype=T.dtype), (*T.shape[:-2], 1, 4)
    )
    return jnp.concatenate([T, bottom], axis=-2)


# ------------------------------------------------------------------ host side
# Numpy equivalents for SINGLE (3,4) poses on the host. Per-tick scalar pose
# bookkeeping (statistics decomposition, proximity gating) must not pay a
# device dispatch each — through a tunneled TPU every dispatch costs a
# round trip, and XLA wins nothing on a lone 3x4 matrix.

def np_compose(A, B):
    import numpy as np

    A = np.asarray(A, np.float64)
    B = np.asarray(B, np.float64)
    out = np.empty((3, 4))
    out[:, :3] = A[:, :3] @ B[:, :3]
    out[:, 3] = A[:, :3] @ B[:, 3] + A[:, 3]
    return out


def np_inverse(A):
    import numpy as np

    A = np.asarray(A, np.float64)
    out = np.empty((3, 4))
    out[:, :3] = A[:, :3].T
    out[:, 3] = -A[:, :3].T @ A[:, 3]
    return out


def np_relative(A, B):
    """inverse(A) ∘ B for single (3,4) host poses."""
    return np_compose(np_inverse(A), B)


def np_translation_norm(A):
    import numpy as np

    return float(np.linalg.norm(np.asarray(A)[:3, 3]))


def np_rotation_angle(A):
    """Same atan2 formulation as `rotation_angle` (float-accurate)."""
    import numpy as np

    R = np.asarray(A, np.float64)[:3, :3]
    tr = R[0, 0] + R[1, 1] + R[2, 2]
    vee = np.array([R[2, 1] - R[1, 2], R[0, 2] - R[2, 0], R[1, 0] - R[0, 1]])
    return float(np.arctan2(0.5 * np.linalg.norm(vee),
                            np.clip((tr - 1.0) * 0.5, -1.0, 1.0)))


def np_to_xyzrpy(A):
    """Same Euler convention as `to_xyzrpy`."""
    import numpy as np

    A = np.asarray(A, np.float64)
    R, t = A[:3, :3], A[:3, 3]
    p = np.arcsin(np.clip(-R[2, 0], -1.0, 1.0))
    r = np.arctan2(R[2, 1], R[2, 2])
    yw = np.arctan2(R[1, 0], R[0, 0])
    return np.array([t[0], t[1], t[2], r, p, yw])
