"""In-repo training of the attentional matcher (the PyMatcher slot).

The reference's SuperGlue runs from a downloaded checkpoint
(/root/reference/corelib/src/python/rtabmap_superglue.py); with zero
egress the matcher is TRAINED here on synthetic assignment problems that
specifically require spatial reasoning — the regime where plain NNDR
fails and an attentional matcher earns its keep:

- keypoints in view A at random positions; view B = a homography warp of
  an inlier subset (+1 px jitter) plus outlier keypoints;
- descriptors are drawn from a SMALL prototype codebook (repetitive
  texture): many keypoints share near-identical descriptors, so
  nearest-neighbour matching is ambiguous BY CONSTRUCTION and only the
  globally-consistent spatial arrangement disambiguates;
- supervision is the known assignment; the loss is the SuperGlue paper's
  negative log-likelihood of the ground-truth matches (+ dustbin rows
  for unmatched keypoints) under the log-Sinkhorn transport.

Run:  python -m rtabmap_tpu.models.train_superglue [steps] [out.npz]
Weights ship in rtabmap_tpu/models/weights/superglue_distilled.npz and
load via ``SuperGlueMatcher.distilled()``.
"""
from __future__ import annotations

import os
import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from rtabmap_tpu.models.superglue import (
    SuperGlueMatcher, SuperGlueNet, log_sinkhorn,
)

K = 64            # keypoints per view
DESC = 256
N_PROTO = 16      # descriptor codebook size (ambiguity driver)
W_IMG, H_IMG = 320.0, 240.0
INLIER_FRAC = 0.75
WEIGHTS_PATH = os.path.join(os.path.dirname(__file__), "weights",
                            "superglue_distilled.npz")


def make_problem(key):
    """One synthetic assignment problem.

    Returns (desc_a, uv_a, sc_a, va, desc_b, uv_b, sc_b, vb,
    gt (K,) int32 — index into B or K for dustbin)."""
    ks = jax.random.split(key, 9)
    protos = jax.random.normal(ks[0], (N_PROTO, DESC))
    protos = protos / jnp.linalg.norm(protos, axis=-1, keepdims=True)
    assign = jax.random.randint(ks[1], (K,), 0, N_PROTO)
    noise = 0.15 * jax.random.normal(ks[2], (K, DESC))
    desc_a = protos[assign] + noise
    desc_a = desc_a / jnp.linalg.norm(desc_a, axis=-1, keepdims=True)
    uv_a = jax.random.uniform(ks[3], (K, 2)) * jnp.array([W_IMG, H_IMG])

    # affine-ish homography (same family as the SuperPoint trainer)
    p = jax.random.uniform(ks[4], (6,), minval=-1.0, maxval=1.0)
    Hm = jnp.array([[1.0 + 0.1 * p[0], 0.1 * p[1], 20.0 * p[2]],
                    [0.1 * p[3], 1.0 + 0.1 * p[4], 20.0 * p[5]],
                    [0.0, 0.0, 1.0]])
    uv_h = jnp.concatenate([uv_a, jnp.ones((K, 1))], -1) @ Hm.T
    uv_w = uv_h[:, :2] / uv_h[:, 2:3]

    inlier = jax.random.uniform(ks[5], (K,)) < INLIER_FRAC
    inlier = inlier & (uv_w[:, 0] >= 0) & (uv_w[:, 0] < W_IMG) \
        & (uv_w[:, 1] >= 0) & (uv_w[:, 1] < H_IMG)
    # B keypoint i is: warped A_i (if inlier) else a decoy at a random
    # position with a random codebook descriptor — identity permutation
    # (the net sees no ordering: attention is permutation-equivariant,
    # and uv/descriptors carry no index information)
    uv_b = jnp.where(inlier[:, None],
                     uv_w + jax.random.normal(ks[6], (K, 2)),
                     jax.random.uniform(ks[7], (K, 2))
                     * jnp.array([W_IMG, H_IMG]))
    # FRESH observation noise in view B: keypoints sharing a prototype
    # are then indistinguishable by descriptor alone (the per-keypoint
    # noise must not act as a fingerprint) — only the homography-
    # consistent arrangement resolves the assignment
    fresh = 0.15 * jax.random.normal(ks[8], (K, DESC))
    decoy = protos[jnp.roll(assign, 7)] + jnp.roll(fresh, 3, axis=0)
    desc_b = jnp.where(inlier[:, None], protos[assign] + fresh, decoy)
    desc_b = desc_b / jnp.linalg.norm(desc_b, axis=-1, keepdims=True)
    gt = jnp.where(inlier, jnp.arange(K), K)   # K = dustbin
    ones = jnp.ones((K,), bool)
    sc = jnp.full((K,), 0.5)
    return desc_a, uv_a, sc, ones, desc_b, uv_b, sc, ones, gt


def _norm_uv(uv, w=W_IMG, h=H_IMG):
    # MUST match the inference normalization in superglue._match
    # ((uv/size)*2-1): round 4 trained with (uv-size/2)/max(size) (span
    # ±0.5) while inference fed ±1 — the encoder saw 2x-scaled positions
    # at deployment
    return (uv / jnp.array([w, h])) * 2.0 - 1.0


def loss_fn(params, key, batch: int):
    net = SuperGlueNet()

    def one(k):
        da, ua, sa, va, db_, ub, sb, vb, gt = make_problem(k)
        scores, dustbin = net.apply(params, da, _norm_uv(ua), sa, va,
                                    db_, _norm_uv(ub), sb, vb)
        Z = log_sinkhorn(scores, dustbin, va, vb, iters=20)
        # NLL of the ground-truth assignment (matches + A-side dustbin)
        picked = Z[jnp.arange(K), gt]
        return -jnp.mean(picked), gt

    keys = jax.random.split(key, batch)
    losses, _ = jax.vmap(one)(keys)
    return jnp.mean(losses)


def _make_tx():
    import optax

    return optax.apply_if_finite(
        optax.chain(optax.clip_by_global_norm(1.0), optax.adam(3e-4)),
        max_consecutive_errors=1000)


@partial(jax.jit, static_argnames=("batch", "inner"))
def train_chunk(params, opt_state, key, batch: int = 16, inner: int = 20):
    import optax

    tx = _make_tx()

    def step(carry, k):
        params, opt_state = carry
        loss, grads = jax.value_and_grad(loss_fn)(params, k, batch)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return (params, opt_state), loss

    (params, opt_state), hist = jax.lax.scan(
        step, (params, opt_state), jax.random.split(key, inner))
    return params, opt_state, hist


def evaluate(params, key, n: int = 32):
    """(match precision, match recall) of mutual-best Sinkhorn matches on
    held-out problems, plus the plain-NNDR recall baseline (which the
    codebook ambiguity is designed to break)."""
    net = SuperGlueNet()
    tp = fp = fn = 0
    nn_tp = nn_n = 0
    for k in jax.random.split(key, n):
        da, ua, sa, va, db_, ub, sb, vb, gt = make_problem(k)
        scores, dustbin = net.apply(params, da, _norm_uv(ua), sa, va,
                                    db_, _norm_uv(ub), sb, vb)
        Z = np.asarray(log_sinkhorn(scores, dustbin, va, vb, iters=20))
        P = np.exp(Z[:K, :K])
        row = P.argmax(1)
        col = P.argmax(0)
        mutual = (col[row] == np.arange(K)) & (P[np.arange(K), row] > 0.2)
        gt_np = np.asarray(gt)
        for i in range(K):
            if mutual[i]:
                if gt_np[i] == row[i]:
                    tp += 1
                else:
                    fp += 1
            elif gt_np[i] < K:
                fn += 1
        # NNDR baseline on raw descriptors
        sim = np.asarray(da) @ np.asarray(db_).T
        nn = sim.argmax(1)
        matched = gt_np < K
        nn_tp += int((nn[matched] == gt_np[matched]).sum())
        nn_n += int(matched.sum())
    precision = tp / max(tp + fp, 1)
    recall = tp / max(tp + fn, 1)
    return precision, recall, nn_tp / max(nn_n, 1)


# ---------------------------------------------------------------- real data
# Round-5 stage: train on REAL SuperPoint features from the reference's
# 84 sample images (the matcher's actual deployment distribution) with
# homography-warp supervision — the round-4 weights were trained only on
# the synthetic codebook problems and did not discriminate real frames
# (more matches on a far pair than a consecutive pair).

RK = 128           # keypoints per view for real pairs
RW, RH = 256.0, 192.0   # half-res extraction (multiples of 8)
SAMPLES_DIR = "/root/reference/data/samples"


def _real_homography(key):
    """Moderate rotation/scale/shear/perspective/translation around the
    image center at (RW, RH) resolution."""
    p = jax.random.uniform(key, (8,), minval=-1.0, maxval=1.0)
    ang = 0.25 * p[0]
    s = 1.0 + 0.18 * p[1]
    ca, sa = jnp.cos(ang) * s, jnp.sin(ang) * s
    shear = 0.08 * p[2]
    tx, ty = 28.0 * p[3], 20.0 * p[4]
    px, py = 4e-4 * p[5], 4e-4 * p[6]
    cx, cy = RW / 2.0, RH / 2.0
    C = jnp.array([[1.0, 0, -cx], [0, 1.0, -cy], [0, 0, 1.0]])
    A = jnp.array([[ca, -sa + shear, tx], [sa, ca + shear, ty],
                   [px, py, 1.0]])
    Ci = jnp.array([[1.0, 0, cx], [0, 1.0, cy], [0, 0, 1.0]])
    return Ci @ A @ C


def build_real_bank(image_dir: str = SAMPLES_DIR, n_warps: int = 4,
                    conf: float = 0.005, seed: int = 0, n_images: int = 0,
                    verbose: bool = False):
    """Extract SuperPoint features for every sample image and ``n_warps``
    homographic warps of it. Returns a dict of stacked arrays:

    positives — da/ua/va (P,RK,*) base view, db/ub/vb warp view,
    gt (P,RK) assignment (RK = dustbin);
    negatives — base features (N,RK,*) + allowed distant pair list
    (the samples loop revisits i ~ i+43, so 'far' respects that metric).
    """
    import glob

    from PIL import Image

    from rtabmap_tpu.models.superpoint import SuperPoint
    from rtabmap_tpu.ops import image as im

    @jax.jit
    def _warp_image(img, Hm):
        # inverse bilinear warp at the image's own shape (the
        # train_superpoint helper hardcodes its canvas size)
        h, w = img.shape
        Hi = jnp.linalg.inv(Hm)
        yy, xx = jnp.mgrid[0:h, 0:w]
        ph = jnp.stack([xx, yy, jnp.ones_like(xx)], -1).astype(jnp.float32)
        q = ph @ Hi.T
        sx = q[..., 0] / q[..., 2]
        sy = q[..., 1] / q[..., 2]
        x0 = jnp.floor(sx).astype(jnp.int32)
        y0 = jnp.floor(sy).astype(jnp.int32)
        fx, fy = sx - x0, sy - y0
        ok = (sx >= 0) & (sx < w - 1) & (sy >= 0) & (sy < h - 1)
        x0c = jnp.clip(x0, 0, w - 2)
        y0c = jnp.clip(y0, 0, h - 2)
        g = lambda dy, dx: img[y0c + dy, x0c + dx]
        out = ((1 - fy) * (1 - fx) * g(0, 0) + (1 - fy) * fx * g(0, 1)
               + fy * (1 - fx) * g(1, 0) + fy * fx * g(1, 1))
        return jnp.where(ok, out, 0.0), ok

    sp = SuperPoint.distilled()
    files = sorted(glob.glob(os.path.join(image_dir, "*.jpg")),
                   key=lambda f: (len(os.path.basename(f)), f))
    if n_images:
        files = files[:n_images]
    key = jax.random.PRNGKey(seed)

    def load_half(f):
        a = np.asarray(Image.open(f))
        g = im.rgb_to_gray(jnp.asarray(a))
        return im.downsample2(g)      # 384x512 -> 192x256

    base = {"d": [], "u": [], "v": []}
    pos = {"da": [], "ua": [], "va": [], "db": [], "ub": [], "vb": [],
           "gt": []}
    extract = lambda g: sp.extract(g, RK, nms_size=9, conf_threshold=conf)
    for fi, f in enumerate(files):
        g = load_half(f)
        kps, _, descf = extract(g)
        base["d"].append(np.asarray(descf))
        base["u"].append(np.asarray(kps.uv))
        base["v"].append(np.asarray(kps.valid))
        for _ in range(n_warps):
            key, k1 = jax.random.split(key)
            Hm = _real_homography(k1)
            gw, _mask = _warp_image(g, Hm)
            kw, _, dw = extract(gw)
            # GT: base kp -> nearest warped kp within 4 px of H(uv)
            uvh = jnp.concatenate([kps.uv, jnp.ones((RK, 1))], -1) @ Hm.T
            uvw = uvh[:, :2] / uvh[:, 2:3]
            d2 = jnp.sum((uvw[:, None, :] - kw.uv[None, :, :]) ** 2, -1)
            d2 = jnp.where(kw.valid[None, :], d2, 1e12)
            j = jnp.argmin(d2, axis=1)
            ok = (d2[jnp.arange(RK), j] < 16.0) & kps.valid
            gt = jnp.where(ok, j, RK).astype(jnp.int32)
            pos["da"].append(np.asarray(descf))
            pos["ua"].append(np.asarray(kps.uv))
            pos["va"].append(np.asarray(kps.valid))
            pos["db"].append(np.asarray(dw))
            pos["ub"].append(np.asarray(kw.uv))
            pos["vb"].append(np.asarray(kw.valid))
            pos["gt"].append(np.asarray(gt))
        if verbose and (fi + 1) % 20 == 0:
            print(f"bank: {fi + 1}/{len(files)} images", flush=True)

    n = len(files)
    # negative (non-overlapping) pairs in the loop metric: the samples
    # sequence revisits frame i at ~i+43
    neg = [(i, j) for i in range(n) for j in range(n)
           if min(abs(i - j), abs(abs(i - j) - 43)) > 8]
    bank = {
        "pos": {k: jnp.asarray(np.stack(v)) for k, v in pos.items()},
        "base": {k: jnp.asarray(np.stack(v)) for k, v in base.items()},
        "neg": jnp.asarray(np.array(neg, np.int32).reshape(-1, 2)),
    }
    return bank


def real_loss_fn(params, key, bank, batch: int, neg_frac: float = 0.25):
    """NLL of the GT assignment on real positive pairs + all-dustbin NLL
    on distant (non-overlapping) real pairs — the negative examples teach
    the transport to route unrelated frames to the dustbin, which is what
    separates a consecutive pair from a far pair at deployment."""
    net = SuperGlueNet()
    P = bank["pos"]["da"].shape[0]
    NN = bank["neg"].shape[0]
    sc = jnp.full((RK,), 0.5)

    def one(k):
        k1, k2, k3 = jax.random.split(k, 3)
        pi = jax.random.randint(k2, (), 0, P)
        da, ua, va = (bank["pos"]["da"][pi], bank["pos"]["ua"][pi],
                      bank["pos"]["va"][pi])
        db_, ub, vb = (bank["pos"]["db"][pi], bank["pos"]["ub"][pi],
                       bank["pos"]["vb"][pi])
        gt = bank["pos"]["gt"][pi]
        if NN > 0:
            use_neg = jax.random.uniform(k1) < neg_frac
            ni = jax.random.randint(k3, (), 0, NN)
            ia, ib = bank["neg"][ni, 0], bank["neg"][ni, 1]
            da = jnp.where(use_neg, bank["base"]["d"][ia], da)
            ua = jnp.where(use_neg, bank["base"]["u"][ia], ua)
            va = jnp.where(use_neg, bank["base"]["v"][ia], va)
            db_ = jnp.where(use_neg, bank["base"]["d"][ib], db_)
            ub = jnp.where(use_neg, bank["base"]["u"][ib], ub)
            vb = jnp.where(use_neg, bank["base"]["v"][ib], vb)
            gt = jnp.where(use_neg, jnp.full((RK,), RK, jnp.int32), gt)
        scores, dustbin = net.apply(params, da, _norm_uv(ua, RW, RH), sc, va,
                                    db_, _norm_uv(ub, RW, RH), sc, vb)
        Z = log_sinkhorn(scores, dustbin, va, vb, iters=20)
        picked = Z[jnp.arange(RK), gt]
        return -jnp.mean(jnp.where(va, picked, 0.0))

    keys = jax.random.split(key, batch)
    return jnp.mean(jax.vmap(one)(keys))


@partial(jax.jit, static_argnames=("batch", "inner"))
def train_chunk_mixed(params, opt_state, key, bank, batch: int = 8,
                      inner: int = 10):
    """Real pairs + the synthetic codebook problems (which keep the
    spatial-reasoning pressure NNDR can't satisfy) in one update."""
    import optax

    tx = _make_tx()

    def step(carry, k):
        params, opt_state = carry
        k1, k2 = jax.random.split(k)

        def total(p):
            return (real_loss_fn(p, k1, bank, batch)
                    + 0.5 * loss_fn(p, k2, batch))

        loss, grads = jax.value_and_grad(total)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return (params, opt_state), loss

    (params, opt_state), hist = jax.lax.scan(
        step, (params, opt_state), jax.random.split(key, inner))
    return params, opt_state, hist


def evaluate_real(params, bank, n: int = 64, seed: int = 99):
    """(precision, recall) of mutual Sinkhorn matches vs the homography GT
    on bank positives, plus the mean match count on negative pairs (the
    discrimination figure: should be << the positive match count)."""
    net = SuperGlueNet()
    sc = jnp.full((RK,), 0.5)
    key = jax.random.PRNGKey(seed)
    P = int(bank["pos"]["da"].shape[0])
    NN = int(bank["neg"].shape[0])
    tp = fp = fn = 0
    pos_counts, neg_counts = [], []

    def transport(da, ua, va, db_, ub, vb):
        scores, dustbin = net.apply(params, da, _norm_uv(ua, RW, RH), sc, va,
                                    db_, _norm_uv(ub, RW, RH), sc, vb)
        Z = np.asarray(log_sinkhorn(scores, dustbin, va, vb, iters=20))
        Pm = np.exp(Z[:RK, :RK])
        row = Pm.argmax(1)
        col = Pm.argmax(0)
        mutual = (col[row] == np.arange(RK)) \
            & (Pm[np.arange(RK), row] > 0.2) & np.asarray(va)
        return row, mutual

    idxs = np.asarray(jax.random.permutation(key, P))[:n]
    for pi in idxs:
        pi = int(pi)
        row, mutual = transport(
            bank["pos"]["da"][pi], bank["pos"]["ua"][pi],
            bank["pos"]["va"][pi], bank["pos"]["db"][pi],
            bank["pos"]["ub"][pi], bank["pos"]["vb"][pi])
        gt = np.asarray(bank["pos"]["gt"][pi])
        for i in range(RK):
            if mutual[i]:
                if gt[i] == row[i]:
                    tp += 1
                else:
                    fp += 1
            elif gt[i] < RK:
                fn += 1
        pos_counts.append(int(mutual.sum()))
    nidx = np.asarray(jax.random.permutation(
        jax.random.PRNGKey(seed + 1), NN))[:n]
    for ni in nidx:
        ia, ib = (int(bank["neg"][int(ni), 0]), int(bank["neg"][int(ni), 1]))
        _row, mutual = transport(
            bank["base"]["d"][ia], bank["base"]["u"][ia],
            bank["base"]["v"][ia], bank["base"]["d"][ib],
            bank["base"]["u"][ib], bank["base"]["v"][ib])
        neg_counts.append(int(mutual.sum()))
    precision = tp / max(tp + fp, 1)
    recall = tp / max(tp + fn, 1)
    return (precision, recall, float(np.mean(pos_counts)),
            float(np.mean(neg_counts)))


def train_real(steps: int = 800, batch: int = 8, inner: int = 10,
               seed: int = 0, out: str = WEIGHTS_PATH, bank=None,
               n_warps: int = 4, verbose: bool = True):
    """Real-image training (round 5): mixed real/synthetic objective."""
    if bank is None:
        if verbose:
            print("building real feature bank...", flush=True)
        bank = build_real_bank(n_warps=n_warps, seed=seed, verbose=verbose)
    m = SuperGlueMatcher(seed=seed)
    params = m.init_params(jax.random.PRNGKey(seed), k=RK, desc_dim=DESC)
    tx = _make_tx()
    opt_state = tx.init(params)
    key = jax.random.PRNGKey(seed + 1)
    done = 0
    t0 = time.time()
    while done < steps:
        key, sub = jax.random.split(key)
        params, opt_state, hist = train_chunk_mixed(
            params, opt_state, sub, bank, batch=batch, inner=inner)
        done += inner
        if verbose and done % (inner * 5) == 0:
            print(f"step {done}: loss={float(hist[-1]):.3f} "
                  f"({time.time() - t0:.0f}s)", flush=True)
    m.params = params
    if out:
        os.makedirs(os.path.dirname(out), exist_ok=True)
        m.save_params(out)
    return m, bank


def train(steps: int = 3000, batch: int = 16, inner: int = 20,
          seed: int = 0, out: str = WEIGHTS_PATH, verbose: bool = True):
    m = SuperGlueMatcher(seed=seed)
    params = m.init_params(jax.random.PRNGKey(seed), k=K, desc_dim=DESC)
    tx = _make_tx()
    opt_state = tx.init(params)
    key = jax.random.PRNGKey(seed + 1)
    done = 0
    t0 = time.time()
    while done < steps:
        key, sub = jax.random.split(key)
        params, opt_state, hist = train_chunk(params, opt_state, sub,
                                              batch=batch, inner=inner)
        done += inner
        if verbose and done % (inner * 5) == 0:
            print(f"step {done}: loss={float(hist[-1]):.3f} "
                  f"({time.time() - t0:.0f}s)", flush=True)
    m.params = params
    if out:
        os.makedirs(os.path.dirname(out), exist_ok=True)
        m.save_params(out)
    return m


if __name__ == "__main__":
    import sys

    args = [a for a in sys.argv[1:] if a != "--synthetic-only"]
    synthetic_only = "--synthetic-only" in sys.argv[1:]
    n = int(args[0]) if args else (3000 if synthetic_only else 800)
    dest = args[1] if len(args) > 1 else WEIGHTS_PATH
    if synthetic_only:
        m = train(steps=n, out=dest)
        p, r, nn_base = evaluate(m.params, jax.random.PRNGKey(77))
        print(f"eval: precision={p:.3f} recall={r:.3f} "
              f"(NNDR baseline recall={nn_base:.3f})")
    else:
        m, bank = train_real(steps=n, out=dest)
        p, r, pos_m, neg_m = evaluate_real(m.params, bank)
        print(f"real eval: precision={p:.3f} recall={r:.3f} "
              f"pos_matches={pos_m:.1f} neg_matches={neg_m:.1f}")
        p2, r2, nn_base = evaluate(m.params, jax.random.PRNGKey(77))
        print(f"synthetic eval: precision={p2:.3f} recall={r2:.3f} "
              f"(NNDR baseline recall={nn_base:.3f})")
