"""Pyramidal KLT tracking."""
import jax
import jax.numpy as jnp
import numpy as np

from rtabmap_tpu.datasets import synthetic as S
from rtabmap_tpu.geometry import camera as C
from rtabmap_tpu.ops import features as F
from rtabmap_tpu.ops.flow import klt_track


def test_klt_tracks_known_shift():
    rng = np.random.default_rng(0)
    base = rng.random((120, 160)).astype(np.float32)
    base = np.asarray(jax.jit(lambda g: __import__("rtabmap_tpu.ops.image",
        fromlist=["gaussian_blur"]).gaussian_blur(g, 1.0))(jnp.asarray(base)))
    shift = 4
    nxt = np.roll(base, shift, axis=1)
    kps, _ = F.detect_and_describe(jnp.asarray(base), 128)
    uv2, ok = klt_track(jnp.asarray(base), jnp.asarray(nxt), kps.uv, kps.valid)
    okn = np.asarray(ok)
    assert okn.sum() > 30
    d = np.asarray(uv2 - kps.uv)[okn]
    np.testing.assert_allclose(np.median(d[:, 0]), shift, atol=0.3)
    np.testing.assert_allclose(np.median(d[:, 1]), 0.0, atol=0.3)


def test_klt_on_rendered_motion():
    cam = C.CameraModel.make(160.0, 160.0, 79.5, 59.5, 160, 120)
    poses = S.loop_trajectory(96)[:2]
    grays, _ = S.render_sequence(poses, cam)
    kps, _ = F.detect_and_describe(grays[0], 128)
    uv2, ok = klt_track(grays[0], grays[1], kps.uv, kps.valid)
    okn = np.asarray(ok)
    assert okn.sum() > 40
    flow = np.linalg.norm(np.asarray(uv2 - kps.uv)[okn], axis=1)
    assert 1.0 < np.median(flow) < 40.0
