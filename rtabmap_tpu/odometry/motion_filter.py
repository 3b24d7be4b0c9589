"""Constant-velocity Kalman filter on 6-DoF pose + particle filter option.

Capability parity: the reference's odometry motion filtering
(/root/reference/corelib/src/Odometry.cpp:1052 ``initKalmanFilter``,
:1145 predict, :1231 update — constant-velocity model over
[x y z r p y, vx..], used for the registration guess and smoothing; and
the per-axis particle filters at Odometry.cpp:191-204).

State: [p(3), rpy(3), v(6)] — 12-dim linear KF (the reference linearizes
the same way). Jittable pure functions over (x, P).
"""
from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp


class KalmanState(NamedTuple):
    x: jnp.ndarray  # (12,)
    P: jnp.ndarray  # (12,12)


def init_kalman(process_noise: float = 0.001) -> KalmanState:
    return KalmanState(x=jnp.zeros((12,)), P=jnp.eye(12) * 1.0)


def kalman_predict(state: KalmanState, dt: float, q: float = 0.001) -> KalmanState:
    F = jnp.eye(12)
    F = F.at[:6, 6:].set(jnp.eye(6) * dt)
    # piecewise-constant-acceleration process noise
    q11 = q * dt ** 3 / 3.0
    q12 = q * dt ** 2 / 2.0
    q22 = q * dt
    Q = jnp.zeros((12, 12))
    Q = Q.at[:6, :6].set(jnp.eye(6) * q11)
    Q = Q.at[:6, 6:].set(jnp.eye(6) * q12)
    Q = Q.at[6:, :6].set(jnp.eye(6) * q12)
    Q = Q.at[6:, 6:].set(jnp.eye(6) * q22)
    x = F @ state.x
    P = F @ state.P @ F.T + Q
    return KalmanState(x, P)


def kalman_update(state: KalmanState, meas_pose6, meas_cov6) -> KalmanState:
    """Measurement = absolute pose (x y z r p y)."""
    H = jnp.zeros((6, 12)).at[:, :6].set(jnp.eye(6))
    # wrap angular innovation to [-pi, pi]
    innov = meas_pose6 - H @ state.x
    ang = innov[3:]
    ang = jnp.arctan2(jnp.sin(ang), jnp.cos(ang))
    innov = innov.at[3:].set(ang)
    S = H @ state.P @ H.T + meas_cov6
    K = state.P @ H.T @ jnp.linalg.inv(S)
    x = state.x + K @ innov
    P = (jnp.eye(12) - K @ H) @ state.P
    return KalmanState(x, P)


def predicted_pose(state: KalmanState):
    from rtabmap_tpu.geometry import transform as T

    return T.from_xyzrpy(state.x[:6])


def predicted_velocity(state: KalmanState):
    return state.x[6:]


# ------------------------------------------------------------ particle filter


class ParticleState(NamedTuple):
    particles: jnp.ndarray  # (P, D) one filter per measured axis
    weights: jnp.ndarray    # (P,)


def init_particles(key, n: int = 400, dim: int = 6, sigma: float = 0.1) -> ParticleState:
    return ParticleState(
        particles=sigma * jax.random.normal(key, (n, dim)),
        weights=jnp.full((n,), 1.0 / n),
    )


def particle_step(state: ParticleState, meas, key, noise: float = 0.01,
                  lambda_meas: float = 100.0) -> Tuple[ParticleState, jnp.ndarray]:
    """Predict (random walk), weight by Gaussian likelihood around the
    measurement, systematic resample; returns (state, filtered estimate)."""
    k1, k2 = jax.random.split(key)
    n = state.particles.shape[0]
    parts = state.particles + noise * jax.random.normal(k1, state.particles.shape)
    d2 = jnp.sum((parts - meas[None, :]) ** 2, axis=-1)
    w = jnp.exp(-0.5 * lambda_meas * d2)
    w = w / jnp.maximum(jnp.sum(w), 1e-30)
    est = jnp.sum(parts * w[:, None], axis=0)
    # systematic resampling
    positions = (jnp.arange(n) + jax.random.uniform(k2)) / n
    cum = jnp.cumsum(w)
    idx = jnp.searchsorted(cum, positions)
    parts = parts[jnp.clip(idx, 0, n - 1)]
    return ParticleState(parts, jnp.full((n,), 1.0 / n)), est
