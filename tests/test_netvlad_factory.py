"""NetVLAD global descriptors, retrieval index, odometry factory."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rtabmap_tpu.geometry import camera as C
from rtabmap_tpu.models.netvlad import (
    GlobalDescriptorIndex, NetVLAD, kmeans_codebook, vlad,
)
from rtabmap_tpu.odometry import available_strategies, create_odometry
from rtabmap_tpu.utils.params import Parameters


def _clustered_desc(key, n_per, centers):
    ds = []
    for i, c in enumerate(centers):
        k = jax.random.fold_in(key, i)
        ds.append(c + 0.1 * jax.random.normal(k, (n_per, c.shape[0])))
    return jnp.concatenate(ds)


def test_kmeans_recovers_clusters():
    key = jax.random.PRNGKey(0)
    centers = jnp.eye(4) * 3.0  # 4 well-separated centers in 4-D
    desc = _clustered_desc(key, 50, centers)
    cb = kmeans_codebook(desc, jnp.ones(200, bool), key, n_clusters=4, iters=15)
    # every true center has a codeword within 0.2
    d = jnp.linalg.norm(centers[:, None] - cb[None], axis=-1)
    assert float(jnp.max(jnp.min(d, axis=1))) < 0.2


def test_vlad_similarity_structure():
    key = jax.random.PRNGKey(1)
    centers = jax.random.normal(key, (8, 16))
    nv = NetVLAD(n_clusters=8)
    nv.fit(_clustered_desc(key, 40, centers), jnp.ones(320, bool))
    # two frames from the same scene (same cluster mix) vs a different mix
    a1 = _clustered_desc(jax.random.PRNGKey(2), 30, centers[:4])
    a2 = _clustered_desc(jax.random.PRNGKey(3), 30, centers[:4])
    b = _clustered_desc(jax.random.PRNGKey(4), 30, centers[4:])
    va1 = nv.extract(a1, jnp.ones(120, bool))
    va2 = nv.extract(a2, jnp.ones(120, bool))
    vb = nv.extract(b, jnp.ones(120, bool))
    np.testing.assert_allclose(float(jnp.linalg.norm(va1)), 1.0, atol=1e-5)
    assert float(va1 @ va2) > float(va1 @ vb) + 0.2


def test_global_descriptor_index():
    rng = np.random.default_rng(0)
    idx = GlobalDescriptorIndex(dim=32, capacity=64)
    vecs = {}
    for nid in range(10):
        v = rng.normal(size=32)
        v /= np.linalg.norm(v)
        vecs[nid] = v
        idx.add(nid, v)
    ids, scores = idx.query(vecs[7], k=3)
    assert ids[0] == 7 and scores[0] > 0.99
    ids2, _ = idx.query(vecs[7], k=3, exclude_ids=[7])
    assert 7 not in ids2


def test_odometry_factory():
    cam = C.CameraModel.make(100.0, 100.0, 50.0, 50.0, 100, 100)
    assert "f2m" in available_strategies() and "vins" in available_strategies()
    odom = create_odometry(cam, strategy="f2f")
    assert odom.__class__.__name__ == "OdometryF2F"
    odom2 = create_odometry(cam, Parameters({"Odom/Strategy": 1}))
    assert odom2.__class__.__name__ == "OdometryF2F"
    with pytest.raises(RuntimeError, match="external"):
        create_odometry(cam, strategy="vins")
