"""util2d extras: bilateral, hole fill, depth registration, fusion."""
import jax.numpy as jnp
import numpy as np

from rtabmap_tpu.geometry import camera as C
from rtabmap_tpu.ops import image as im


def test_bilateral_preserves_edges_smooths_noise():
    rng = np.random.default_rng(0)
    depth = np.full((40, 40), 2.0, np.float32)
    depth[:, 20:] = 4.0  # depth edge
    noisy = depth + rng.normal(0, 0.02, depth.shape).astype(np.float32)
    out = np.asarray(im.bilateral_filter(jnp.asarray(noisy)))
    # noise reduced
    assert np.std(out[5:15, 5:15]) < 0.5 * np.std(noisy[5:15, 5:15])
    # edge not blurred across
    assert abs(out[10, 19] - 2.0) < 0.1 and abs(out[10, 21] - 4.0) < 0.1
    # zeros stay zero
    noisy[3, 3] = 0.0
    out2 = np.asarray(im.bilateral_filter(jnp.asarray(noisy)))
    assert out2[3, 3] == 0.0


def test_fill_depth_holes():
    depth = np.full((20, 20), 3.0, np.float32)
    depth[10, 10] = 0.0          # small hole -> filled
    depth[0:6, 0:6] = 0.0        # big hole -> mostly stays
    out = np.asarray(im.fill_depth_holes(jnp.asarray(depth)))
    assert abs(out[10, 10] - 3.0) < 1e-3
    assert out[2, 2] == 0.0


def test_register_depth_identity_and_shift():
    cam = C.CameraModel.make(50.0, 50.0, 19.5, 14.5, 40, 30)
    depth = np.zeros((30, 40), np.float32)
    depth[10:20, 15:25] = 2.0
    Tid = np.eye(3, 4, dtype=np.float32)
    out = np.asarray(im.register_depth(jnp.asarray(depth), cam, cam, Tid))
    np.testing.assert_allclose(out[12, 18], 2.0, atol=1e-5)
    assert out[2, 2] == 0.0
    # translate the rgb camera 0.2m along +x: depth shifts left in image
    Ts = np.eye(3, 4, dtype=np.float32)
    Ts[0, 3] = -0.2
    out2 = np.asarray(im.register_depth(jnp.asarray(depth), cam, cam, Ts))
    # expected pixel shift = fx * tx / z = 50*0.2/2 = 5
    assert out2[12, 13] == 2.0 and out2[12, 24] == 0.0


def test_exposure_fusion_and_autocontrast():
    dark = np.full((16, 16), 0.1, np.float32)
    bright = np.full((16, 16), 0.9, np.float32)
    mid = np.full((16, 16), 0.5, np.float32)
    mid[8, 8] = 0.7  # some structure
    fused = np.asarray(im.exposure_fusion(jnp.stack([jnp.asarray(dark),
                                                     jnp.asarray(bright),
                                                     jnp.asarray(mid)])))
    assert fused.shape == (16, 16)
    assert 0.0 <= fused.min() and fused.max() <= 1.0
    stretched = np.asarray(im.brightness_contrast_auto(jnp.asarray(
        np.linspace(0.4, 0.6, 256).reshape(16, 16).astype(np.float32))))
    assert stretched.max() > 0.95 and stretched.min() < 0.05
