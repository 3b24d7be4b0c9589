"""SuperPoint flax model: shapes, jit extract, persistence round-trip."""
import jax
import jax.numpy as jnp
import numpy as np

from rtabmap_tpu.models.superpoint import (
    CELL, SuperPoint, SuperPointNet, score_map_from_logits,
)


def _image(h=64, w=96, seed=0):
    rng = np.random.default_rng(seed)
    img = rng.random((h, w)).astype(np.float32)
    # put a strong corner pattern so the (random-weight) net has structure
    img[20:28, 30:38] = 1.0
    return jnp.asarray(img)


def test_net_shapes():
    net = SuperPointNet()
    x = jnp.zeros((1, 64, 96, 1))
    params = net.init(jax.random.PRNGKey(0), x)["params"]
    logits, desc = net.apply({"params": params}, x)
    assert logits.shape == (1, 8, 12, CELL * CELL + 1)
    assert desc.shape == (1, 8, 12, 256)
    score = score_map_from_logits(logits)
    assert score.shape == (1, 64, 96)
    # softmax prob map is bounded
    assert float(jnp.max(score)) <= 1.0 and float(jnp.min(score)) >= 0.0


def test_extract_end_to_end():
    sp = SuperPoint(seed=0)
    kps, desc, descf = sp.extract(_image(), max_kp=128, conf_threshold=0.0)
    assert kps.uv.shape == (128, 2)
    assert desc.shape == (128, 256) and desc.dtype == jnp.int8
    v = np.asarray(kps.valid)
    assert v.any()
    # valid slots carry ±1 signs, invalid are zeroed
    d = np.asarray(desc)
    assert set(np.unique(d[v])) <= {-1, 1}
    if (~v).any():
        assert np.all(d[~v] == 0)
    # float descriptors unit-norm
    n = np.linalg.norm(np.asarray(descf)[v], axis=-1)
    np.testing.assert_allclose(n, 1.0, atol=1e-4)
    # in-bounds coordinates
    uv = np.asarray(kps.uv)[v]
    assert uv[:, 0].min() >= 0 and uv[:, 0].max() < 96
    assert uv[:, 1].min() >= 0 and uv[:, 1].max() < 64


def test_descriptor_repeatability_same_image():
    sp = SuperPoint(seed=1)
    k1, d1, _ = sp.extract(_image(), max_kp=64, conf_threshold=0.0)
    k2, d2, _ = sp.extract(_image(), max_kp=64, conf_threshold=0.0)
    np.testing.assert_array_equal(np.asarray(d1), np.asarray(d2))
    np.testing.assert_allclose(np.asarray(k1.uv), np.asarray(k2.uv))


def test_params_save_load_roundtrip(tmp_path):
    sp = SuperPoint(seed=2)
    p = str(tmp_path / "sp.npz")
    sp.save_params(p)
    sp2 = SuperPoint.load_params(p)
    img = _image(seed=3)
    _, d1, _ = sp.extract(img, max_kp=32, conf_threshold=0.0)
    _, d2, _ = sp2.extract(img, max_kp=32, conf_threshold=0.0)
    np.testing.assert_array_equal(np.asarray(d1), np.asarray(d2))
