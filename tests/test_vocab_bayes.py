"""Vocabulary quantization + tf-idf likelihood + Bayes filter behavior."""
import jax
import jax.numpy as jnp
import numpy as np

from rtabmap_tpu.vocab.dictionary import (
    VWDictionary, tfidf_likelihood, adjust_likelihood,
)
from rtabmap_tpu.bayes import filter as BF


def rand_desc(key, n):
    return jnp.where(jax.random.bernoulli(key, 0.5, (n, 256)), 1, -1).astype(jnp.int8)


def test_quantize_creates_and_matches_words():
    d = VWDictionary(capacity=1024)
    key = jax.random.PRNGKey(0)
    desc = rand_desc(key, 100)
    valid = jnp.ones((100,), bool)
    ids1, new1 = d.quantize(desc, valid)
    assert d.n_words == 100  # random descriptors are all distinctive
    assert (ids1 >= 0).all()
    # re-quantizing identical descriptors must match the same words
    ids2, new2 = d.quantize(desc, valid)
    assert new2.sum() == 0
    np.testing.assert_array_equal(ids1, ids2)


def test_quantize_respects_validity_and_capacity():
    d = VWDictionary(capacity=50)
    key = jax.random.PRNGKey(1)
    desc = rand_desc(key, 80)
    valid = jnp.arange(80) < 60
    ids, new = d.quantize(desc, valid)
    assert d.n_words == 50  # capacity-clamped
    assert (ids[60:] == -1).all()


def test_tfidf_likelihood_favors_matching_node():
    W = 512
    K = 8
    N = 4
    # node 0 shares all words with query; node 1 shares half; node 2 none
    node_words = np.full((N, K), -1, np.int32)
    node_words[0, :8] = np.arange(8)
    node_words[1, :8] = [0, 1, 2, 3, 100, 101, 102, 103]
    node_words[2, :8] = np.arange(200, 208)
    node_valid = np.array([True, True, True, False])
    query = np.arange(8, dtype=np.int32)
    word_nw = np.zeros((W,), np.float32)
    for j in range(3):
        for w in node_words[j]:
            if w >= 0:
                word_nw[w] += 1
    lik = tfidf_likelihood(
        jnp.asarray(query), jnp.asarray(node_words), jnp.asarray(node_valid),
        jnp.asarray(word_nw), jnp.float32(3.0), W,
    )
    lik = np.asarray(lik)
    assert lik[0] > lik[1] > 0
    assert lik[2] == 0.0
    assert lik[3] == 0.0  # invalid node


def test_adjust_likelihood_matches_reference_formula():
    lik = jnp.array([1.0, 1.1, 0.9, 5.0, 1.05, 0.0])
    valid = jnp.ones((6,), bool)
    adj, virt = adjust_likelihood(lik, valid)
    vals = np.array([1.0, 1.1, 0.9, 5.0, 1.05])
    mean, std = vals.mean(), vals.std(ddof=1)
    expected_peak = (5.0 - (std - 1e-4)) / mean
    np.testing.assert_allclose(float(adj[3]), expected_peak, rtol=1e-4)
    assert float(adj[0]) == 1.0  # below mean+std -> 1
    np.testing.assert_allclose(float(virt), mean / std + 1.0, rtol=1e-4)


def test_bayes_posterior_converges_on_repeated_evidence():
    N = 16
    bf = BF.BayesFilter(N)
    # chain graph 0-1-2-...-9 (10 valid nodes)
    links = [(i, i + 1) for i in range(9)]
    nbr_idx, nbr_margin = BF.build_neighbor_table(links, N, depth=4, max_neighbors=9)
    node_valid = jnp.arange(N) < 10
    lik = jnp.ones((N,)).at[7].set(4.0) * node_valid
    virt = jnp.float32(1.5)
    masses = []
    for _ in range(4):
        post = bf.update(lik, virt, jnp.asarray(nbr_idx), jnp.asarray(nbr_margin), node_valid)
        p = np.asarray(post)
        masses.append(p[6] + p[7] + p[8])
    post = p
    # real-node argmax is the evidence peak; hypothesis mass grows each tick
    assert post[:10].argmax() == 7
    assert masses[-1] > masses[0]
    # reference accept rule: hypothesis neighborhood mass above LoopThr=0.11
    assert masses[-1] > 0.11
    np.testing.assert_allclose(post.sum(), 1.0, atol=1e-5)
    # neighbors of 7 get diffused mass: more than far nodes
    assert post[6] > post[2] and post[8] > post[2]


def test_bayes_no_evidence_keeps_virtual_place():
    N = 8
    bf = BF.BayesFilter(N)
    nbr_idx, nbr_margin = BF.build_neighbor_table([(0, 1), (1, 2)], N, 3, 7)
    node_valid = jnp.arange(N) < 3
    lik = jnp.ones((N,)) * node_valid
    post = bf.update(lik, jnp.float32(2.0), jnp.asarray(nbr_idx), jnp.asarray(nbr_margin), node_valid)
    post = np.asarray(post)
    # uniform likelihood + high virtual score -> virtual place dominates
    assert post[N] > post[:N].max()
