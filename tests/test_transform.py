import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rtabmap_tpu.geometry import transform as T


def rand_xi(key, n, scale=1.0):
    return jax.random.normal(key, (n, 6)) * jnp.array([1, 1, 1, 0.5, 0.5, 0.5]) * scale


def test_compose_inverse_identity():
    key = jax.random.PRNGKey(0)
    P = T.se3_exp(rand_xi(key, 16))
    I = T.compose(P, T.inverse(P))
    np.testing.assert_allclose(np.asarray(I), np.asarray(T.identity((16,))), atol=1e-5)


def test_exp_log_roundtrip():
    key = jax.random.PRNGKey(1)
    xi = rand_xi(key, 64)
    back = T.se3_log(T.se3_exp(xi))
    np.testing.assert_allclose(np.asarray(back), np.asarray(xi), atol=1e-4)


def test_log_near_zero_and_pi():
    xi = jnp.array([[0.0, 0, 0, 0, 0, 0], [0.1, -0.2, 0.3, 1e-8, 0, 0]])
    back = T.se3_log(T.se3_exp(xi))
    np.testing.assert_allclose(np.asarray(back), np.asarray(xi), atol=1e-5)
    # rotation near pi about z
    phi = jnp.array([[0.0, 0.0, np.pi - 1e-4]])
    R = T.so3_exp(phi)
    back = T.so3_log(R)
    np.testing.assert_allclose(np.asarray(back), np.asarray(phi), atol=1e-3)


def test_apply_points():
    P = T.from_xyzrpy(jnp.array([1.0, 2.0, 3.0, 0.0, 0.0, np.pi / 2]))
    pts = jnp.array([[[1.0, 0.0, 0.0]]])
    out = T.apply(P[None], pts)
    np.testing.assert_allclose(np.asarray(out[0, 0]), [1.0, 3.0, 3.0], atol=1e-5)


def test_quaternion_roundtrip():
    key = jax.random.PRNGKey(2)
    P = T.se3_exp(rand_xi(key, 32, scale=2.0))
    q = T.to_quaternion(P)
    P2 = T.from_quaternion(q, T.translation(P))
    np.testing.assert_allclose(np.asarray(P2), np.asarray(P), atol=1e-4)


def test_xyzrpy_roundtrip():
    v = jnp.array([[0.3, -1.0, 2.0, 0.2, -0.4, 1.1]])
    np.testing.assert_allclose(
        np.asarray(T.to_xyzrpy(T.from_xyzrpy(v))), np.asarray(v), atol=1e-5
    )


def test_interpolate_endpoints():
    key = jax.random.PRNGKey(3)
    A = T.se3_exp(rand_xi(key, 1))[0]
    B = T.se3_exp(rand_xi(jax.random.PRNGKey(4), 1))[0]
    np.testing.assert_allclose(np.asarray(T.interpolate(A, B, 0.0)), np.asarray(A), atol=1e-5)
    np.testing.assert_allclose(np.asarray(T.interpolate(A, B, 1.0)), np.asarray(B), atol=1e-4)


def test_jit_and_vmap():
    f = jax.jit(lambda a, b: T.se3_log(T.relative(a, b)))
    key = jax.random.PRNGKey(5)
    A = T.se3_exp(rand_xi(key, 8))
    out = f(A, A)
    np.testing.assert_allclose(np.asarray(out), 0.0, atol=1e-5)


def test_orthonormalize():
    P = T.identity()
    noisy = P.at[:3, :3].add(0.01)
    fixed = T.orthonormalize(noisy)
    R = np.asarray(T.rotation(fixed))
    np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-5)
    assert np.linalg.det(R) > 0
