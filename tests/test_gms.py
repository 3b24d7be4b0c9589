"""GMS grid-motion-statistics match filtering."""
import jax.numpy as jnp
import numpy as np

from rtabmap_tpu.ops.matching import gms_filter


def test_gms_keeps_coherent_rejects_random():
    rng = np.random.default_rng(0)
    H, W = 240, 320
    n_good, n_bad = 150, 40
    uv_a_good = rng.uniform([10, 10], [W - 10, H - 10], (n_good, 2)).astype(np.float32)
    uv_b_good = uv_a_good + np.array([8.0, -3.0], np.float32)  # coherent motion
    uv_a_bad = rng.uniform([10, 10], [W - 10, H - 10], (n_bad, 2)).astype(np.float32)
    uv_b_bad = rng.uniform([10, 10], [W - 10, H - 10], (n_bad, 2)).astype(np.float32)
    uv_a = jnp.asarray(np.concatenate([uv_a_good, uv_a_bad]))
    uv_b = jnp.asarray(np.concatenate([uv_b_good, uv_b_bad]))
    valid = jnp.ones((n_good + n_bad,), bool)
    keep = np.asarray(gms_filter(uv_a, uv_b, valid, (H, W), (H, W)))
    good_rate = keep[:n_good].mean()
    bad_rate = keep[n_good:].mean()
    assert good_rate > 0.7, good_rate
    assert bad_rate < 0.25, bad_rate


def test_gms_respects_valid_mask():
    uv = jnp.zeros((10, 2))
    keep = np.asarray(gms_filter(uv, uv, jnp.zeros(10, bool), (100, 100), (100, 100)))
    assert not keep.any()
