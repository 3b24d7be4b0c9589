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
