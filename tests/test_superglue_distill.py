"""In-repo attentional-matcher training (models/train_superglue.py): the
synthetic codebook-ambiguous assignment problems genuinely defeat plain
NNDR, a few steps reduce the loss, and the SHIPPED trained weights beat
the NNDR baseline by a wide margin by using spatial consistency."""
import os

import jax
import numpy as np
import pytest

from rtabmap_tpu.models import train_superglue as TG
from rtabmap_tpu.models.superglue import SuperGlueMatcher

WEIGHTS = TG.WEIGHTS_PATH


def test_problems_are_descriptor_ambiguous():
    """NNDR alone must NOT solve the synthetic problems (K keypoints over
    N_PROTO prototypes with fresh per-view noise)."""
    da, ua, sa, va, db_, ub, sb, vb, gt = TG.make_problem(
        jax.random.PRNGKey(0))
    sim = np.asarray(da) @ np.asarray(db_).T
    nn = sim.argmax(1)
    gt_np = np.asarray(gt)
    matched = gt_np < TG.K
    assert matched.sum() >= 20
    nn_recall = float((nn[matched] == gt_np[matched]).mean())
    assert nn_recall < 0.7, nn_recall


@pytest.mark.slow
def test_few_steps_reduce_loss():
    m = SuperGlueMatcher(seed=2)
    params = m.init_params(jax.random.PRNGKey(0), k=TG.K, desc_dim=TG.DESC)
    tx = TG._make_tx()
    opt = tx.init(params)
    l0 = float(TG.loss_fn(params, jax.random.PRNGKey(5), 2))
    params, opt, hist = TG.train_chunk(params, opt, jax.random.PRNGKey(6),
                                       batch=2, inner=8)
    assert np.isfinite(np.asarray(hist)).all()
    l1 = float(TG.loss_fn(params, jax.random.PRNGKey(5), 2))
    assert l1 < l0, (l0, l1)


@pytest.mark.skipif(not os.path.exists(WEIGHTS),
                    reason="trained matcher weights not present")
def test_trained_matcher_beats_nndr():
    """Round 5: the shipped weights train on a MIXED objective — real
    SuperPoint features from the 84 reference sample images with
    homography supervision + these synthetic codebook problems (see
    train_superglue.train_real). The deployment bar moved to the
    real-image gates (test_learned_stack.py: 73+ matches on a revisit
    pair vs ~2 on a far pair); this synthetic eval keeps the
    spatial-reasoning margin over NNDR (measured r5: precision 0.544,
    recall 0.752 vs NNDR 0.212)."""
    m = SuperGlueMatcher.distilled()
    prec, rec, nn_base = TG.evaluate(m.params, jax.random.PRNGKey(321),
                                     n=16)
    assert nn_base < 0.7, nn_base          # the task stays ambiguous
    assert rec > nn_base + 0.2, (rec, nn_base)
    assert prec >= 0.45, prec
