"""tf-idf likelihood against the published 2010 Matlab golden oracle.

Reference: /root/reference/archive/2010-LoopClosure/Tests/
TestComputeLikelihood.m — loads the real 090306-3 database dump
(83 signatures + 4554-word dictionary), refreshes the virtual place with
updateCommonSignature.m, computes computeLikelihood.m for the last
signature and asserts the published golden vector (floor(x*1000)).
Here the SAME data drives rtabmap_tpu's fused `tfidf_likelihood` kernel
(vocab/dictionary.py) — proving the TPU reformulation reproduces the
2010 algorithm exactly. adjustLikelihood.m's cases are covered against
`adjust_likelihood`.
"""
import os

import numpy as np
import pytest

ARCHIVE = "/root/reference/archive/2010-LoopClosure"
TESTS = os.path.join(ARCHIVE, "Tests")

pytestmark = pytest.mark.skipif(
    not os.path.isdir(TESTS), reason="reference archive not present")

# TestComputeLikelihood.m embedded goldens -------------------------------
# memory(end,:) after load (data-integrity check): id 82 + its word refs
GOLDEN_LAST_SIGN_HEAD = [82, 9, 24, 27, 37, 39, 40, 45, 46, 64, 64, 67]
# floor(likelihood*1000) for all 83 places (virtual place first)
GOLDEN_LIK_X1000 = [
    109, 157, 263, 203, 87, 66, 78, 49, 60, 40, 47, 43, 43, 55, 102, 102,
    147, 0, 38, 61, 64, 74, 69, 103, 39, 20, 44, 33, 14, 14, 20, 12, 18,
    8, 59, 19, 41, 26, 45, 117, 124, 173, 223, 74, 0, 10, 17, 53, 33, 24,
    33, 43, 52, 68, 119, 124, 146, 159, 28, 68, 59, 115, 71, 95, 37, 18,
    16, 49, 9, 28, 20, 9, 15, 11, 10, 35, 45, 73, 18, 92, 167, 219, 1222,
]


def _load_rows(path):
    rows = []
    with open(path) as f:
        next(f)  # header
        for line in f:
            line = line.strip()
            if line:
                rows.append([int(v) for v in line.split()])
    return rows


def _update_common_signature(mem, dct):
    """Faithful port of updateCommonSignature.m (1-based quirks kept)."""
    cs_id = mem[0][0]
    # clear references to the virtual place in the dictionary
    by_word = {row[0]: row for row in dct}
    for w in mem[0][1:]:
        row = by_word.get(w)
        if row is not None:
            for j in range(len(row)):
                if row[j] == cs_id:
                    row[j] = 0
    cs = [cs_id]
    mem_size = len(mem) - 1
    total_active = sum(sum(1 for v in row[1:] if v != 0) for row in dct)
    nb = total_active // mem_size if mem_size > 0 else 0
    if nb > 0:
        lst = sorted((sum(1 for v in row[1:] if v != 0), row[0])
                     for row in dct)
        words_added = 0
        for i in range(len(lst) - 1, -1, -1):
            if i != len(lst) - 1 and len(cs) > 1 and lst[i][0] > 0:
                ratio = lst[i + 1][0] // lst[i][0]
                ln = len(cs)
                done = False
                for _j in range(2, ratio + 1):
                    for k in range(1, ln):  # matlab CS(2:len)
                        cs.append(cs[k])
                        words_added += 1
                        if words_added >= nb:
                            done = True
                            break
                    if done:
                        break
            if words_added < nb:
                cs.append(lst[i][1])
                words_added += 1
            if words_added >= nb:
                break
        cs = cs + [0] * (len(mem[0]) - len(cs))
        # updateDictionary.m: append cs_id ref per (possibly duplicated)
        # word of the new virtual place
        for w in cs[1:]:
            if w == 0:
                continue
            row = by_word.get(w)
            if row is None:
                dct.append([w, cs_id])
                by_word[w] = dct[-1]
            else:
                for j in range(len(row)):
                    if j > 0 and row[j] == 0:
                        row[j] = cs_id
                        break
                else:
                    row.append(cs_id)
        mem[0] = cs
    return mem, dct


@pytest.fixture(scope="module")
def oracle_data():
    mem = _load_rows(os.path.join(TESTS, "090306-3_db-Signatures.txt"))
    dct = _load_rows(os.path.join(TESTS, "090306-3_db-Dictionary.txt"))
    mem, dct = _update_common_signature(mem, dct)
    return mem, dct


def test_data_matches_matlab_integrity_check(oracle_data):
    mem, _ = oracle_data
    assert mem[-1][: len(GOLDEN_LAST_SIGN_HEAD)] == GOLDEN_LAST_SIGN_HEAD
    assert len(mem) == len(GOLDEN_LIK_X1000)


def test_tfidf_kernel_reproduces_2010_golden(oracle_data):
    """The fused TPU tf-idf kernel on the real 2009 data must reproduce
    computeLikelihood.m's published golden (within f32 rounding of the
    floor(x*1000) quantization)."""
    import jax.numpy as jnp

    from rtabmap_tpu.vocab.dictionary import tfidf_likelihood

    mem, dct = oracle_data
    N = len(mem)
    K = max(sum(1 for v in row[1:] if v != 0) for row in mem)
    node_words = np.full((N, K), -1, np.int32)
    for j, row in enumerate(mem):
        ws = [v for v in row[1:] if v != 0]
        node_words[j, : len(ws)] = ws
    W = max(row[0] for row in dct) + 1
    word_nw = np.zeros((W,), np.float32)
    for row in dct:
        word_nw[row[0]] = len({v for v in row[1:] if v != 0})
    query = node_words[-1]
    lik = np.asarray(tfidf_likelihood(
        jnp.asarray(query), jnp.asarray(node_words),
        jnp.ones((N,), bool), jnp.asarray(word_nw),
        jnp.float32(N), W))
    golden = np.asarray(GOLDEN_LIK_X1000, np.float64)
    # matlab floor(x*1000) = g  =>  x*1000 in [g, g+1); allow f32 slack
    scaled = lik * 1000.0
    assert np.all(scaled >= golden - 0.02), \
        (scaled - golden).min()
    assert np.all(scaled <= golden + 1.02), \
        (scaled - golden).max()
    # exact floor match for the overwhelming majority of entries
    exact = np.floor(scaled).astype(int) == golden.astype(int)
    assert exact.mean() >= 0.95, exact.mean()


def test_adjust_likelihood_matches_matlab_cases():
    """adjustLikelihood.m semantics: zeros -> all ones; the [.3 .4 .2 .9]
    case -> floor(x*1000) == [1000, 1000, 1000, 1309]."""
    import jax.numpy as jnp

    from rtabmap_tpu.vocab.dictionary import adjust_likelihood

    valid = jnp.ones((4,), bool)
    adj, _vp = adjust_likelihood(jnp.zeros((4,)), valid)
    np.testing.assert_allclose(np.asarray(adj), 1.0)

    lik = jnp.asarray([0.3, 0.4, 0.2, 0.9], jnp.float32)
    adj, _vp = adjust_likelihood(lik, valid)
    got = np.floor(np.asarray(adj, np.float64) * 1000).astype(int)
    np.testing.assert_array_equal(got, [1000, 1000, 1000, 1309])
