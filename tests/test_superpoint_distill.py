"""In-repo SuperPoint distillation (models/train_superpoint.py): the
synthetic-geometry data generator is label-consistent, a few optimizer
steps reduce the loss, and the SHIPPED distilled weights (when present)
detect synthetic corners and match descriptors across homographies far
above chance — the egress-blocked substitute for the reference's
pretrained superpoint_v1.pt (SuperPoint.cc:342)."""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rtabmap_tpu.models import train_superpoint as TS
from rtabmap_tpu.models.superpoint import CELL, SuperPoint

WEIGHTS = TS.WEIGHTS_PATH


def test_synthetic_pair_is_label_consistent():
    img1, lbl1, img2, lbl2, Hm = TS.make_pair(jax.random.PRNGKey(5))
    assert img1.shape == (TS.H, TS.W)
    assert float(img1.min()) >= 0.0 and float(img1.max()) <= 1.0
    lab = np.asarray(lbl1)
    assert lab.shape == (TS.HC, TS.WC)
    rr, cc = np.where(lab < 64)
    assert len(rr) >= 4, "no corner labels generated"
    # each labelled corner decodes to a pixel inside its cell
    x = cc * CELL + lab[rr, cc] % CELL
    y = rr * CELL + lab[rr, cc] // CELL
    assert (x < TS.W).all() and (y < TS.H).all()
    # warped view: its corner labels decode to H-transformed positions
    lab2 = np.asarray(lbl2)
    assert (lab2 < 64).sum() >= 1
    # warp consistency: a bright/dark step at a corner in view1 appears at
    # H(corner) in view2 (sample a labelled corner, compare patches)
    Hm = np.asarray(Hm)
    p = np.array([x[0], y[0], 1.0])
    q = Hm @ p
    q = q[:2] / q[2]
    if 4 <= q[0] < TS.W - 4 and 4 <= q[1] < TS.H - 4:
        v1 = float(np.asarray(img1)[int(y[0]), int(x[0])])
        v2 = float(np.asarray(img2)[int(round(q[1])), int(round(q[0]))])
        assert abs(v1 - v2) < 0.35  # bilinear + blur tolerance


@pytest.mark.slow
def test_few_steps_reduce_loss():
    import optax  # noqa: F401  (trainer dependency)

    sp = SuperPoint(seed=1)
    tx = TS._make_tx()
    opt = tx.init(sp.params)
    loss0, _ = TS.loss_fn(sp.params, jax.random.PRNGKey(2), 2, 1.0)
    params, opt, hist = TS.train_chunk(sp.params, opt,
                                       jax.random.PRNGKey(3),
                                       batch=2, inner=6)
    h = np.asarray(hist)
    assert np.isfinite(h).all(), h
    loss1, _ = TS.loss_fn(params, jax.random.PRNGKey(2), 2, 1.0)
    assert float(loss1) < float(loss0), (float(loss0), float(loss1))


@pytest.mark.skipif(not os.path.exists(WEIGHTS),
                    reason="distilled weights not trained yet")
def test_distilled_weights_detect_and_match():
    sp = SuperPoint.distilled()
    rec, match = TS.evaluate(sp.params, jax.random.PRNGKey(123), n=8)
    # untrained nets measure ~0.2-0.4 recall / ~0.01 match on this eval
    assert rec >= 0.6, rec
    # round 5: weights are fine-tuned on REAL sample-image homography
    # pairs (train_superpoint.finetune_real) — synthetic desc match eases
    # 0.37 -> 0.295 while the real-image learned operating point jumps
    # 34 -> 88.6% recall @ 100% precision (test_real_samples.py)
    assert match >= 0.25, match

    # end-to-end extract() on a synthetic image returns valid keypoints
    # near true corners
    img1, lbl1, *_ = TS.make_pair(jax.random.PRNGKey(7))
    # only ~14 true corners exist per synthetic image — ask for the top
    # few so the precision check measures the detector, not the tail
    kps, desc, descf = sp.extract(jnp.asarray(img1), max_kp=16)
    assert int(kps.valid.sum()) >= 4
    lab = np.asarray(lbl1)
    rr, cc = np.where(lab < 64)
    tx = cc * CELL + lab[rr, cc] % CELL
    ty = rr * CELL + lab[rr, cc] // CELL
    uv = np.asarray(kps.uv)[np.asarray(kps.valid)]
    d = np.linalg.norm(uv[:, None, :] - np.stack([tx, ty], 1)[None], axis=2)
    frac_near = float((d.min(1) < 5.0).mean())
    # r5 real-image fine-tune: the top-16 response on a SYNTHETIC polygon
    # image now mixes in some real-texture-like peaks (measured 0.44,
    # was 0.56) while synthetic corner RECALL stays 0.971 and the real
    # samples operating point jumps 34 -> 84% recall @ 100% precision
    assert frac_near >= 0.35, frac_near
