"""Pallas TPU kernels, exercised in interpreter mode on CPU."""
import jax.numpy as jnp
import numpy as np

from rtabmap_tpu.ops.matching import knn_blocked
from rtabmap_tpu.ops.pallas.vocab_knn import pallas_knn2


def _signs(rng, n, d=256):
    return (rng.integers(0, 2, (n, d)) * 2 - 1).astype(np.int8)


def test_pallas_knn2_matches_blocked_exact():
    rng = np.random.default_rng(0)
    Q, W = 128, 2048
    q = jnp.asarray(_signs(rng, Q))
    s = jnp.asarray(_signs(rng, W))
    valid = np.ones(W, bool)
    valid[50:300] = False
    dr, ir = knn_blocked(q, s, k=2, block=512, base_valid=jnp.asarray(valid))
    dp, ip = pallas_knn2(q, s, jnp.asarray(valid), block=512, interpret=True)
    np.testing.assert_allclose(np.asarray(dr), np.asarray(dp))
    # rank-0 index must agree wherever it isn't a distance tie with rank-1
    # (rank-1 indices can tie with the unseen 3rd neighbor; distances above
    # already pin their correctness)
    strict = np.asarray(dr)[:, 0] < np.asarray(dr)[:, 1]
    assert np.all(np.asarray(ir)[strict, 0] == np.asarray(ip)[strict, 0])


def test_pallas_knn2_all_invalid_slab():
    rng = np.random.default_rng(1)
    q = jnp.asarray(_signs(rng, 128))
    s = jnp.asarray(_signs(rng, 1024))
    dp, _ = pallas_knn2(q, s, jnp.zeros(1024, bool), block=512, interpret=True)
    assert np.all(np.asarray(dp) > 1e8)  # "no neighbor" sentinel survives


def test_pallas_knn2_single_block():
    rng = np.random.default_rng(2)
    q = jnp.asarray(_signs(rng, 128))
    s = jnp.asarray(_signs(rng, 512))
    dr, ir = knn_blocked(q, s, k=2, block=512)
    dp, ip = pallas_knn2(q, s, jnp.ones(512, bool), block=512, interpret=True)
    np.testing.assert_allclose(np.asarray(dr), np.asarray(dp))


def test_pallas_nn3d_matches_blocked():
    from rtabmap_tpu.ops.icp import _nn_blocked
    from rtabmap_tpu.ops.pallas.nn3d import pallas_nn3d

    rng = np.random.default_rng(3)
    Q, N = 512, 2048
    src = jnp.asarray(rng.normal(size=(Q, 3)).astype(np.float32))
    dst = jnp.asarray(rng.normal(size=(N, 3)).astype(np.float32))
    valid = np.ones(N, bool)
    valid[100:500] = False
    dr, ir = _nn_blocked(src, dst, jnp.asarray(valid))
    dp, ip = pallas_nn3d(src.T, dst.T, jnp.asarray(valid), interpret=True)
    # kernel uses the direct (q-b)^2 form; the fallback's s2-2sb+b2 form
    # cancels catastrophically, so compare loosely and check indices
    np.testing.assert_allclose(np.asarray(dr), np.asarray(dp), rtol=1e-4, atol=1e-5)
    same = np.asarray(ir) == np.asarray(ip)
    assert same.mean() > 0.99  # near-ties may differ


def test_pallas_nn3d_all_invalid():
    from rtabmap_tpu.ops.pallas.nn3d import pallas_nn3d

    rng = np.random.default_rng(4)
    src = jnp.asarray(rng.normal(size=(128, 3)).astype(np.float32))
    dst = jnp.asarray(rng.normal(size=(512, 3)).astype(np.float32))
    dp, _ = pallas_nn3d(src.T, dst.T, jnp.zeros(512, bool), qblock=128,
                        dblock=512, interpret=True)
    assert np.all(np.isinf(np.asarray(dp)))
