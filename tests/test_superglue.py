"""Attentional matcher (SuperGlue-class, the PyMatcher slot)."""
import jax
import jax.numpy as jnp
import numpy as np

from rtabmap_tpu.models.superglue import SuperGlueMatcher, log_sinkhorn


def test_sinkhorn_doubly_stochastic():
    rng = np.random.RandomState(0)
    Ka, Kb = 12, 9
    s = jnp.asarray(rng.randn(Ka, Kb).astype(np.float32))
    va = jnp.ones((Ka,), bool).at[10].set(False)
    vb = jnp.ones((Kb,), bool)
    lp = log_sinkhorn(s, jnp.float32(0.5), va, vb, iters=60)
    P = np.exp(np.asarray(lp))
    # row marginals: each valid keypoint carries mass ~1 (matched+dustbin)
    rows = P[:-1].sum(axis=1)
    assert np.allclose(rows[np.asarray(va)], 1.0, atol=1e-2)
    assert rows[10] < 1e-6  # invalid keypoint carries no mass
    cols = P[:, :-1].sum(axis=0)
    assert np.allclose(cols[np.asarray(vb)], 1.0, atol=1e-2)


def test_matcher_recovers_permutation():
    """With strongly distinctive descriptors even random-init attention
    passes them through: the Sinkhorn assignment must recover the true
    permutation (the architecture-level sanity check for the PyMatcher
    slot; pretrained weights load via load_params)."""
    rng = np.random.RandomState(1)
    K, D = 24, 64
    desc_a = rng.randn(K, D).astype(np.float32) * 4.0
    perm = rng.permutation(K)
    desc_b = desc_a[perm] + 0.05 * rng.randn(K, D).astype(np.float32)
    uv_a = rng.rand(K, 2).astype(np.float32) * 100
    uv_b = uv_a[perm]
    sc = np.ones(K, np.float32)
    m = SuperGlueMatcher(dim=64, layers=2, seed=3)
    idx, ok, conf = m.match(jnp.asarray(desc_a), jnp.asarray(uv_a),
                            jnp.asarray(sc), jnp.ones(K, bool),
                            jnp.asarray(desc_b), jnp.asarray(uv_b),
                            jnp.asarray(sc), jnp.ones(K, bool),
                            image_wh=(100.0, 100.0), threshold=0.05)
    idx, ok = np.asarray(idx), np.asarray(ok)
    correct = (idx[ok] == np.argsort(perm)[np.arange(K)[ok]]).mean() if ok.any() else 0
    # random-weight attention mixes features, so demand a solid majority,
    # not perfection
    assert ok.sum() >= K // 2, f"only {ok.sum()} matches"
    assert correct > 0.8, f"only {correct:.0%} of matches correct"


def test_params_roundtrip(tmp_path):
    m = SuperGlueMatcher(dim=32, layers=1, seed=0)
    m.params = m.init_params(jax.random.PRNGKey(0), k=8, desc_dim=16)
    p = str(tmp_path / "sg.npz")
    m.save_params(p)
    m2 = SuperGlueMatcher.load_params(p, dim=32, layers=1)
    a = jax.tree_util.tree_leaves(m.params)
    b = jax.tree_util.tree_leaves(m2.params)
    assert all(np.allclose(x, y) for x, y in zip(a, b))
