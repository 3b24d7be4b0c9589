"""Golden-oracle test of the Bayes filter against the reference's archived
Matlab test (the same oracle the C++ corelib tests used):
/root/reference/archive/2010-LoopClosure/Tests/TestBayesFilter.m with
/root/reference/archive/2010-LoopClosure/Bayes/generatePrediction.m.

Scenario: places are created one per iteration in a linear chain,
likelihood is flat (1 everywhere), the posterior starts on the virtual
place. The Matlab golden is floor(1000 * posterior) over 10 iterations.
"""
import numpy as np

from rtabmap_tpu.bayes.filter import BayesFilter, build_neighbor_table

# predictionNP=0.9 (virtual place prior), predictionLC from the .m file
PREDICTION_LC = [0.1, 0.24, 0.18, 0.18, 0.1, 0.1, 0.04, 0.04, 0.01, 0.01]
VP_PRIOR = 0.9

# floor(1000*posterior), rows = iterations, columns = [vp, place1..place9]
# (verbatim golden matrix from TestBayesFilter.m)
GOLDEN = np.array([
    [1000, 0, 0, 0, 0, 0, 0, 0, 0, 0],
    [900, 99, 0, 0, 0, 0, 0, 0, 0, 0],
    [820, 117, 62, 0, 0, 0, 0, 0, 0, 0],
    [756, 111, 82, 50, 0, 0, 0, 0, 0, 0],
    [704, 103, 84, 67, 40, 0, 0, 0, 0, 0],
    [663, 96, 82, 69, 54, 32, 0, 0, 0, 0],
    [631, 90, 79, 69, 58, 44, 26, 0, 0, 0],
    [604, 84, 76, 68, 58, 48, 36, 21, 0, 0],
    [583, 79, 73, 66, 58, 49, 40, 30, 17, 0],
    [567, 74, 69, 64, 58, 50, 41, 33, 25, 14],
], np.float64)


def _matlab_generate_prediction(np_pred, lc, m):
    """Line-for-line port of generatePrediction.m (the oracle itself)."""
    P = np.zeros((m + 1, m + 1))
    P[0, 0] = np_pred
    if m > 0:
        P[0, 1:] = (1.0 - np_pred) / m
    for i in range(1, m + 1):
        y = np.zeros(m + 1)
        y[0] = lc[0]
        y[1:] = (1.0 - sum(lc)) / m
        prob_added = lc[1]
        y[i] += lc[1]
        n = i
        for k in range(2, len(lc), 2):       # backward neighbors
            n -= 1
            if n >= 1:
                y[n] += lc[k]
                prob_added += lc[k]
            else:
                break
        n = i
        for k in range(3, len(lc), 2):       # forward neighbors
            n += 1
            if n <= m:
                y[n] += lc[k]
                prob_added += lc[k]
            else:
                break
        total_lc = sum(lc[1:])
        if prob_added < total_lc:
            y[i] += total_lc - prob_added    # truncated mass -> loop id
        P[i] = y
    return P


def _matlab_posterior_sequence(n_iter):
    """Run the Matlab recursion exactly; returns (n_iter, n_iter+1)."""
    prior = np.array([1.0])
    out = []
    for i in range(n_iter):
        m = i  # number of places after adding the i-th (0-based: i places
        # exist BEFORE this iteration's new place... matlab: length-1)
        likelihood = np.ones(i + 1)
        P = _matlab_generate_prediction(VP_PRIOR, PREDICTION_LC, i)
        prior = np.concatenate([prior, [0.0]]) if i > 0 else prior
        prior = likelihood * (P.T @ prior)
        prior = prior / prior.sum()
        out.append(prior.copy())
    return out


def test_matlab_oracle_reproduces_golden():
    """Sanity: the ported Matlab recursion reproduces the hardcoded golden
    matrix under floor(1000*x). Several entries sit EXACTLY on floor
    boundaries (exact-fraction arithmetic gives e.g. 117.0 and 63.0 at
    iteration 3), so float64 floor can differ by one count — compare the
    floored encoding within +-1."""
    seq = _matlab_posterior_sequence(10)
    for i, p in enumerate(seq):
        got = np.floor(np.asarray(p) * 1000.0)
        assert np.abs(got - GOLDEN[i, : i + 1]).max() <= 1, (i, got)


def test_bayes_filter_matches_matlab_golden():
    """Our TPU Bayes filter run on the same scenario must reproduce the
    golden posteriors (tolerance 2e-3: one floor-quantization step of the
    golden encoding)."""
    cap = 16
    bf = BayesFilter(cap, prediction_lc=PREDICTION_LC,
                     virtual_place_prior=VP_PRIOR)
    links = []
    for it in range(10):
        # Matlab convention: the place created at iteration i enters the
        # prediction only at i+1 (m = length(likelihood)-1), so at
        # 0-based iteration `it` the filter sees `it` places
        n_places = it
        if it >= 2:
            links.append((it - 2, it - 1))  # chain neighbor
        depth = len(PREDICTION_LC) - 2
        nbr_idx, nbr_margin = build_neighbor_table(
            links, cap, depth=min(depth, 8),
            max_neighbors=2 * min(depth, 8) + 1)
        valid = np.zeros(cap, bool)
        valid[:n_places] = True
        lik = np.zeros(cap, np.float32)
        lik[:n_places] = 1.0
        import jax.numpy as jnp

        post = np.asarray(bf.update(jnp.asarray(lik), jnp.float32(1.0),
                                    jnp.asarray(nbr_idx),
                                    jnp.asarray(nbr_margin),
                                    jnp.asarray(valid)))
        golden = GOLDEN[it] / 1000.0
        # ours: [places..., virtual]; golden: [virtual, places...]
        got = np.concatenate([[post[-1]], post[:n_places]])
        want = golden[: n_places + 1]
        np.testing.assert_allclose(got, want, atol=2e-3,
                                   err_msg=f"iteration {it}")
