"""Equivalence tests for the TPU-specific reformulations of memory ops.

Every per-keypoint memory access in the hot path is expressed as a one-hot
matmul (MXU) instead of point gathers / dynamic slices (which serialize to
scalar loads on TPU). These tests pin each reformulation to its naive
reference form so perf work can't drift numerics.
"""
import jax
import jax.numpy as jnp
import numpy as np

from rtabmap_tpu.ops import features as F
from rtabmap_tpu.ops import image as im
from rtabmap_tpu.ops import matching as M


def _rand_img(rng, h=60, w=80):
    return jnp.asarray(rng.rand(h, w), jnp.float32)


def test_bilinear_sample_mm_matches_gather_form():
    rng = np.random.RandomState(0)
    img = _rand_img(rng)
    uv = jnp.asarray(rng.rand(50, 2) * np.array([79.0, 59.0]), jnp.float32)
    a = im.bilinear_sample(img, uv)
    b = im.bilinear_sample_mm(img, uv)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_bilinear_sample_mm_out_of_bounds_pad():
    rng = np.random.RandomState(1)
    img = _rand_img(rng)
    uv = jnp.asarray([[-2.0, 5.0], [5.0, -2.0], [100.0, 5.0], [3.5, 4.5]],
                     jnp.float32)
    out = im.bilinear_sample_mm(img, uv, pad_value=-7.0)
    assert np.asarray(out[:3] == -7.0).all()
    assert float(out[3]) != -7.0


def test_extract_patches_matches_direct_slicing():
    rng = np.random.RandomState(2)
    img = _rand_img(rng, 120, 160)
    K, P = 20, 32
    uv = jnp.asarray(rng.rand(K, 2) * np.array([120.0, 80.0]) + 20.0,
                     jnp.float32)
    patches = np.asarray(F.extract_patches(img, uv, patch=P))
    imn = np.asarray(img)
    c = P // 2
    for k in range(K):
        u0 = int(np.clip(round(float(uv[k, 0])) - c, 0, 160 - P))
        v0 = int(np.clip(round(float(uv[k, 1])) - c, 0, 120 - P))
        ref = imn[v0:v0 + P, u0:u0 + P]
        # bf16 pass-through: values match to bf16 resolution
        np.testing.assert_allclose(patches[k], ref, atol=4e-3)


def test_sep_conv_band_matmul_matches_direct_convolution():
    rng = np.random.RandomState(3)
    img = _rand_img(rng, 40, 50)
    k = np.array([0.1, 0.2, 0.4, 0.2, 0.1], np.float32)
    out = np.asarray(im._sep_conv(img, k, k))
    # direct zero-padded correlation
    r = len(k) // 2
    x = np.asarray(img)
    pad = np.pad(x, ((0, 0), (r, r)))
    horiz = sum(k[j] * pad[:, j:j + x.shape[1]] for j in range(len(k)))
    pad2 = np.pad(horiz, ((r, r), (0, 0)))
    ref = sum(k[j] * pad2[j:j + x.shape[0], :] for j in range(len(k)))
    np.testing.assert_allclose(out, ref, atol=1e-5)


def test_subpixel_refinement_matches_gather_form():
    rng = np.random.RandomState(4)
    score = _rand_img(rng, 64, 64)
    K = 16
    uv = jnp.asarray(rng.randint(2, 60, (K, 2)), jnp.float32)
    kps = F.Keypoints(uv=uv, response=jnp.ones((K,)), angle=jnp.zeros((K,)),
                      octave=jnp.zeros((K,), jnp.int32),
                      valid=jnp.ones((K,), bool))
    out = F.refine_subpixel(score, kps)
    s = np.asarray(score)
    for k in range(4):
        u, v = int(uv[k, 0]), int(uv[k, 1])
        dx = 0.5 * (s[v, u + 1] - s[v, u - 1])
        dxx = s[v, u + 1] + s[v, u - 1] - 2 * s[v, u]
        off_u = np.clip(-dx / dxx, -0.6, 0.6) if abs(dxx) > 1e-12 else 0.0
        np.testing.assert_allclose(float(out.uv[k, 0]) - u, off_u, atol=1e-4)


def test_match_nndr_bidir_matches_two_calls():
    rng = np.random.RandomState(5)
    Ka, Kb, D = 40, 50, 256
    da = jnp.asarray(np.where(rng.rand(Ka, D) > 0.5, 1, -1), jnp.int8)
    db = jnp.asarray(np.where(rng.rand(Kb, D) > 0.5, 1, -1), jnp.int8)
    # plant exact correspondences
    db = db.at[:20].set(da[:20])
    va = jnp.arange(Ka) < 35
    vb = jnp.arange(Kb) < 45
    m_ab, m_ba = M.match_nndr_bidir(da, va, db, vb)
    r_ab = M.match_nndr(da, va, db, vb)
    r_ba = M.match_nndr(db, vb, da, va)
    for got, ref in ((m_ab, r_ab), (m_ba, r_ba)):
        np.testing.assert_array_equal(np.asarray(got.idx), np.asarray(ref.idx))
        np.testing.assert_allclose(np.asarray(got.dist), np.asarray(ref.dist))
        np.testing.assert_array_equal(np.asarray(got.valid), np.asarray(ref.valid))


def test_match_mutual_nndr_planted_correspondences():
    rng = np.random.RandomState(6)
    K, D = 64, 256
    da = jnp.asarray(np.where(rng.rand(K, D) > 0.5, 1, -1), jnp.int8)
    perm = rng.permutation(K)
    db = da[jnp.asarray(perm)]
    v = jnp.ones((K,), bool)
    m = M.match_mutual_nndr(da, v, db, v)
    inv = np.empty(K, np.int64)
    inv[perm] = np.arange(K)
    assert np.asarray(m.valid).all()
    np.testing.assert_array_equal(np.asarray(m.idx), inv)
