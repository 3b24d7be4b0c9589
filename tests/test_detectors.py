"""Detector-strategy registry: every response map feeds the same pipeline."""
import jax.numpy as jnp
import numpy as np
import pytest

from rtabmap_tpu.ops import features as F


@pytest.fixture(scope="module")
def img():
    rng = np.random.default_rng(0)
    base = rng.random((120, 160)).astype(np.float32) * 0.1
    # checkerboard corners: strong response for every detector family
    base[40:80:8, 40:120] += 0.8
    base[40:80, 40:120:8] += 0.8
    return jnp.asarray(base)


@pytest.mark.parametrize("det", ["gftt", "harris", "dog", "fast"])
def test_detector_strategies(det, img):
    kps, desc = F.detect_and_describe(img, 128, detector=det)
    v = np.asarray(kps.valid)
    assert v.sum() > 8, det
    assert desc.shape == (128, F.DESC_DIM)
    d = np.asarray(desc)
    assert set(np.unique(d[v])) <= {-1, 1}


def test_harris_dog_prefer_structure(img):
    # responses should peak inside the checkerboard region, not the noise
    for fn in (F.harris_response, F.dog_response):
        r = np.asarray(fn(img))
        assert r[40:80, 40:120].max() > 5 * abs(r[:30, :30]).max()


def test_sift_descriptor_rotation_invariance():
    """SIFT-family float descriptor: same physical point matches across a
    large in-plane rotation via L2 NNDR (reference float-descriptor slots
    of Feature2D)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from PIL import Image

    from rtabmap_tpu.ops import features as F
    from rtabmap_tpu.ops import image as IM
    from rtabmap_tpu.ops import matching as M

    img = np.asarray(Image.open("/root/reference/data/samples/1.jpg").convert("L"),
                     np.float32) / 255.0
    img = img[::2, ::2]
    rot = np.asarray(Image.fromarray((img * 255).astype(np.uint8)).rotate(30),
                     np.float32) / 255.0

    def extract(gray):
        g = jnp.asarray(gray)
        kps, _ = F.detect_and_describe(g, 256)
        blur = IM.gaussian_blur(g, 1.5)
        desc = F.describe_sift(blur, kps)
        return kps, desc

    k1, d1 = extract(img)
    k2, d2 = extract(rot)
    assert d1.shape[1] == F.SIFT_DIM
    norms = np.linalg.norm(np.asarray(d1), axis=1)
    assert np.all((norms[np.asarray(k1.valid)] > 0.9)
                  & (norms[np.asarray(k1.valid)] < 1.1))
    m1, m2 = M.match_nndr_bidir(d1, k1.valid, d2, k2.valid, nndr=0.8,
                                metric="l2")
    mutual = np.asarray(M.cross_check(m1, m2))
    got = int(mutual.sum())
    assert got >= 25, f"only {got} mutual SIFT matches across 30deg rotation"
    # matched points should correspond geometrically under the rotation
    H, W = img.shape
    c = np.array([W / 2 - 0.5, H / 2 - 0.5])
    th = np.deg2rad(30)
    R = np.array([[np.cos(th), np.sin(th)], [-np.sin(th), np.cos(th)]])
    uv1 = np.asarray(k1.uv)[mutual]
    uv2 = np.asarray(k2.uv)[np.asarray(m1.idx)[mutual]]
    pred = (uv1 - c) @ R.T + c
    err = np.linalg.norm(pred - uv2, axis=1)
    assert np.median(err) < 3.0, f"median geom err {np.median(err):.1f}px"
