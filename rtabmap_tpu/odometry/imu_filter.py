"""IMU orientation filters: Madgwick + complementary AHRS.

Capability parity: the reference's imufilter module
(/root/reference/corelib/src/imufilter/ — MadgwickFilter.cpp,
ComplementaryFilter.cpp, consumed by IMUThread / SensorCaptureThread for
gravity alignment of odometry). Implemented as pure scan-able update
functions (quaternion [x,y,z,w] state) so a whole IMU batch integrates in
one `lax.scan`.
"""
from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp


def _quat_mul(a, b):
    ax, ay, az, aw = a[..., 0], a[..., 1], a[..., 2], a[..., 3]
    bx, by, bz, bw = b[..., 0], b[..., 1], b[..., 2], b[..., 3]
    return jnp.stack([
        aw * bx + ax * bw + ay * bz - az * by,
        aw * by - ax * bz + ay * bw + az * bx,
        aw * bz + ax * by - ay * bx + az * bw,
        aw * bw - ax * bx - ay * by - az * bz,
    ], axis=-1)


def _normalize(q):
    return q / jnp.maximum(jnp.linalg.norm(q, axis=-1, keepdims=True), 1e-12)


def madgwick_update(q, gyro, accel, dt, beta: float = 0.1):
    """One Madgwick IMU update (gyro rad/s, accel m/s^2, dt s)."""
    # gyro quaternion derivative
    omega = jnp.concatenate([gyro, jnp.zeros_like(gyro[..., :1])], axis=-1)
    q_dot = 0.5 * _quat_mul(q, omega)

    # gradient descent step on the gravity objective
    a = accel / jnp.maximum(jnp.linalg.norm(accel, axis=-1, keepdims=True), 1e-9)
    qx, qy, qz, qw = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    # objective f = R(q)^T g - a  with g = (0,0,1)
    f = jnp.stack([
        2 * (qx * qz - qw * qy) - a[..., 0],
        2 * (qw * qx + qy * qz) - a[..., 1],
        2 * (0.5 - qx * qx - qy * qy) - a[..., 2],
    ], axis=-1)
    # J[i,:] = [df1/dqi, df2/dqi, df3/dqi], i in state order [x,y,z,w]
    zero = jnp.zeros_like(qx)
    J = jnp.stack([
        jnp.stack([2 * qz, 2 * qw, -4 * qx], -1),   # d/dx
        jnp.stack([-2 * qw, 2 * qz, -4 * qy], -1),  # d/dy
        jnp.stack([2 * qx, 2 * qy, zero], -1),      # d/dz
        jnp.stack([-2 * qy, 2 * qx, zero], -1),     # d/dw
    ], axis=-2)
    grad = jnp.einsum("...ij,...j->...i", J, f)  # (...,4) order [x,y,z,w]
    grad = _normalize(grad)
    q_new = q + (q_dot - beta * grad) * dt
    return _normalize(q_new)


def complementary_update(q, gyro, accel, dt, alpha: float = 0.02):
    """Complementary filter: gyro integration + small accel tilt correction."""
    omega = jnp.concatenate([gyro, jnp.zeros_like(gyro[..., :1])], axis=-1)
    q_pred = _normalize(q + 0.5 * _quat_mul(q, omega) * dt)
    # accel-implied gravity direction in body frame
    a = accel / jnp.maximum(jnp.linalg.norm(accel, axis=-1, keepdims=True), 1e-9)
    qx, qy, qz, qw = q_pred[..., 0], q_pred[..., 1], q_pred[..., 2], q_pred[..., 3]
    g_body = jnp.stack([
        2 * (qx * qz - qw * qy),
        2 * (qw * qx + qy * qz),
        qw * qw - qx * qx - qy * qy + qz * qz,
    ], axis=-1)
    # small rotation taking g_body toward a
    axis = jnp.cross(g_body, a)
    corr = jnp.concatenate([alpha * 0.5 * axis, jnp.ones_like(a[..., :1])], axis=-1)
    return _normalize(_quat_mul(q_pred, _normalize(corr)))


@partial(jax.jit, static_argnames=("method",))
def integrate_imu(gyro_seq, accel_seq, dt_seq, q0=None, method: str = "madgwick",
                  beta: float = 0.1, alpha: float = 0.02):
    """Scan a whole IMU sequence: (N,3),(N,3),(N,) -> (N,4) quaternions."""
    if q0 is None:
        q0 = jnp.array([0.0, 0.0, 0.0, 1.0])
    upd = madgwick_update if method == "madgwick" else complementary_update

    def body(q, inp):
        g, a, dt = inp
        if method == "madgwick":
            qn = madgwick_update(q, g, a, dt, beta)
        else:
            qn = complementary_update(q, g, a, dt, alpha)
        return qn, qn

    _, qs = jax.lax.scan(body, q0, (gyro_seq, accel_seq, dt_seq))
    return qs


def gravity_aligned_correction(q):
    """Roll/pitch-only rotation from the estimated orientation (yaw removed)
    — what the reference applies to align odometry with gravity."""
    from rtabmap_tpu.geometry import transform as T

    P = T.from_quaternion(q)
    rpy = T.to_xyzrpy(P)
    rp_only = rpy.at[..., 5].set(0.0).at[..., :3].set(0.0)
    return T.from_xyzrpy(rp_only)


@jax.jit
def apply_gravity_alignment(pose, imu_quat):
    """Replace the pose's roll/pitch with the IMU's while keeping yaw and
    translation (reference: Odometry::process gravity alignment,
    Odometry.cpp:311 region — the AHRS filter owns roll/pitch, vision
    owns yaw + translation)."""
    from rtabmap_tpu.geometry import transform as T

    rpy = T.to_xyzrpy(pose)
    rpy_imu = T.to_xyzrpy(T.from_quaternion(imu_quat))
    merged = rpy.at[..., 3].set(rpy_imu[..., 3]).at[..., 4].set(rpy_imu[..., 4])
    return T.from_xyzrpy(merged)
