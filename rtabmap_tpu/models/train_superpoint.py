"""In-repo self-supervised distillation of SuperPoint weights.

The reference loads a pretrained TorchScript file
(/root/reference/corelib/src/superpoint_torch/SuperPoint.cc:342); this
environment has zero network egress, so the learned detector is TRAINED
here instead, following the SuperPoint recipe (DeTone et al., 2018):

1. MagicPoint stage — synthetic convex polygons rendered analytically on
   the pixel grid with exactly known corner positions supervise the
   65-class cell detector head (cross-entropy).
2. Homographic descriptor stage — each image is warped by a random
   homography; the descriptor head is trained with the paper's hinge
   loss over cell-center correspondences (positive margin 1.0, negative
   margin 0.2, lambda_d weighting).

Everything (data generation, warping, loss) is jnp inside one jitted
step scanned ``inner`` times per dispatch — through the tunneled TPU the
per-call RTT would otherwise dominate the small conv net.

Run:  python -m rtabmap_tpu.models.train_superpoint [steps] [out.npz]
Weights ship in rtabmap_tpu/models/weights/superpoint_distilled.npz
(float16) and load via ``SuperPoint.distilled()``.
"""
from __future__ import annotations

import os
import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from rtabmap_tpu.models.superpoint import (
    CELL, SuperPoint, SuperPointNet, score_map_from_logits,
)

H, W = 120, 160
HC, WC = H // CELL, W // CELL
N_POLY = 4          # polygons per image
N_CORNER = N_POLY * 4
WEIGHTS_PATH = os.path.join(os.path.dirname(__file__), "weights",
                            "superpoint_distilled.npz")


# ---------------------------------------------------------- synthetic world


def _render_polys(key):
    """One synthetic image + its corner list: N_POLY random convex quads
    (sorted-angle construction) composited over a shaded background.
    Returns (img (H,W), corners (N_CORNER,2) xy, corner_valid)."""
    ks = jax.random.split(key, 8)
    yy, xx = jnp.mgrid[0:H, 0:W]
    # background: smooth gradient + offset
    gdir = jax.random.normal(ks[0], (2,)) * 0.002
    img = 0.35 + 0.2 * jax.random.uniform(ks[1]) + gdir[0] * yy + gdir[1] * xx

    centers = jax.random.uniform(ks[2], (N_POLY, 2)) * jnp.array([W, H])
    radii = jax.random.uniform(ks[3], (N_POLY, 4), minval=8.0, maxval=36.0)
    base = jax.random.uniform(ks[4], (N_POLY, 1)) * 2 * jnp.pi
    # strictly increasing angles -> convex, ccw
    gaps = jax.random.uniform(ks[5], (N_POLY, 4), minval=0.3, maxval=1.0)
    ang = base + 2 * jnp.pi * jnp.cumsum(gaps, -1) / jnp.sum(gaps, -1,
                                                            keepdims=True)
    verts = centers[:, None, :] + radii[..., None] * jnp.stack(
        [jnp.cos(ang), jnp.sin(ang)], -1)          # (P,4,2) xy
    shade = jax.random.uniform(ks[6], (N_POLY,), minval=0.0, maxval=1.0)

    p = jnp.stack([xx, yy], -1).astype(jnp.float32)  # (H,W,2)

    def paint(img, args):
        v, s = args                                  # (4,2), ()
        e = jnp.roll(v, -1, axis=0) - v              # edges (4,2)
        rel = p[None] - v[:, None, None, :]          # (4,H,W,2)
        cross = e[:, None, None, 0] * rel[..., 1] - e[:, None, None, 1] * rel[..., 0]
        inside = jnp.all(cross >= 0, axis=0)
        return jnp.where(inside, s, img), None

    img, _ = jax.lax.scan(paint, img, (verts, shade))
    # mild separable blur + sensor noise
    img = (img + jnp.roll(img, 1, 0) * 0.5 + jnp.roll(img, -1, 0) * 0.5) / 2.0
    img = (img + jnp.roll(img, 1, 1) * 0.5 + jnp.roll(img, -1, 1) * 0.5) / 2.0
    img = img + 0.02 * jax.random.normal(ks[7], (H, W))
    img = jnp.clip(img, 0.0, 1.0)
    corners = verts.reshape(-1, 2)
    ok = ((corners[:, 0] >= 2) & (corners[:, 0] < W - 2)
          & (corners[:, 1] >= 2) & (corners[:, 1] < H - 2))
    return img, corners, ok


def _labels_from_corners(corners, ok):
    """(Hc, Wc) int32 65-class detector label (dustbin 64)."""
    cls = jnp.full((HC, WC), 64, jnp.int32)
    cx = jnp.clip(corners[:, 0].astype(jnp.int32), 0, W - 1)
    cy = jnp.clip(corners[:, 1].astype(jnp.int32), 0, H - 1)
    cell_r, cell_c = cy // CELL, cx // CELL
    sub = (cy % CELL) * CELL + (cx % CELL)
    r = jnp.where(ok, cell_r, HC)   # out-of-range -> dropped
    return cls.at[r, cell_c].set(sub, mode="drop")


def _rand_homography(key):
    ks = jax.random.split(key, 4)
    ab = 1.0 + jax.random.uniform(ks[0], (2,), minval=-0.12, maxval=0.12)
    sh = jax.random.uniform(ks[1], (2,), minval=-0.12, maxval=0.12)
    t = jax.random.uniform(ks[2], (2,), minval=-12.0, maxval=12.0)
    per = jax.random.uniform(ks[3], (2,), minval=-3e-4, maxval=3e-4)
    return jnp.array([[ab[0], sh[0], t[0]],
                      [sh[1], ab[1], t[1]],
                      [per[0], per[1], 1.0]])


def _apply_h(Hm, pts):
    """pts (...,2) xy through a 3x3 homography."""
    ph = jnp.concatenate([pts, jnp.ones(pts.shape[:-1] + (1,))], -1)
    q = ph @ Hm.T
    return q[..., :2] / jnp.maximum(jnp.abs(q[..., 2:3]), 1e-6) * \
        jnp.sign(q[..., 2:3])


def _warp_image(img, Hm):
    """Inverse-warp: out(p) = img(H^-1 p), bilinear, zeros outside."""
    Hi = jnp.linalg.inv(Hm)
    yy, xx = jnp.mgrid[0:H, 0:W]
    src = _apply_h(Hi, jnp.stack([xx, yy], -1).astype(jnp.float32))
    sx, sy = src[..., 0], src[..., 1]
    x0 = jnp.floor(sx).astype(jnp.int32)
    y0 = jnp.floor(sy).astype(jnp.int32)
    fx, fy = sx - x0, sy - y0
    valid = (sx >= 0) & (sx < W - 1) & (sy >= 0) & (sy < H - 1)
    x0c = jnp.clip(x0, 0, W - 2)
    y0c = jnp.clip(y0, 0, H - 2)
    g = lambda dy, dx: img[y0c + dy, x0c + dx]
    out = ((1 - fy) * (1 - fx) * g(0, 0) + (1 - fy) * fx * g(0, 1)
           + fy * (1 - fx) * g(1, 0) + fy * fx * g(1, 1))
    return jnp.where(valid, out, 0.0), valid


def make_pair(key):
    """(img1, lbl1, img2, lbl2, Hm): a synthetic view + its homography
    warp, each with detector labels."""
    k1, k2 = jax.random.split(key)
    img1, corners, ok = _render_polys(k1)
    lbl1 = _labels_from_corners(corners, ok)
    Hm = _rand_homography(k2)
    img2, vmask = _warp_image(img1, Hm)
    c2 = _apply_h(Hm, corners)
    ok2 = (ok & (c2[:, 0] >= 2) & (c2[:, 0] < W - 2)
           & (c2[:, 1] >= 2) & (c2[:, 1] < H - 2))
    lbl2 = _labels_from_corners(c2, ok2)
    return img1, lbl1, img2, lbl2, Hm


# ------------------------------------------------------------------- losses


def _detector_loss(logits, labels):
    """Cross-entropy over the 65 cell classes, corners upweighted (cells
    are ~90% dustbin)."""
    ce = -jax.nn.log_softmax(logits, -1)
    pick = jnp.take_along_axis(ce, labels[..., None], axis=-1)[..., 0]
    w = jnp.where(labels < 64, 12.0, 1.0)
    return jnp.sum(pick * w) / jnp.sum(w)


def _descriptor_loss(da, db, Hm, lambda_d: float = 250.0,
                     mp: float = 1.0, mn: float = 0.2):
    """SuperPoint hinge loss over cell-center correspondences.
    da/db: (Hc, Wc, D) unit descriptors of view1/view2."""
    D = da.shape[-1]
    yy, xx = jnp.mgrid[0:HC, 0:WC]
    centers = jnp.stack([xx * CELL + CELL / 2 - 0.5,
                         yy * CELL + CELL / 2 - 0.5], -1).reshape(-1, 2)
    # view1 centers through H -> view2 pixel space
    c1w = _apply_h(Hm, centers)                         # (M,2)
    d2 = jnp.sum((c1w[:, None, :] - centers[None, :, :]) ** 2, -1)
    s = (d2 <= (CELL - 0.5) ** 2).astype(jnp.float32)   # (M1,M2)
    a = da.reshape(-1, D)
    b = db.reshape(-1, D)
    dot = a @ b.T
    loss = (lambda_d * s * jnp.maximum(0.0, mp - dot)
            + (1.0 - s) * jnp.maximum(0.0, dot - mn))
    return jnp.mean(loss)


def _norm_desc(desc_map):
    return desc_map / jnp.maximum(
        jnp.linalg.norm(desc_map, axis=-1, keepdims=True), 1e-8)


def loss_fn(params, key, batch: int, desc_weight: float):
    net = SuperPointNet()
    keys = jax.random.split(key, batch)
    img1, lbl1, img2, lbl2, Hm = jax.vmap(make_pair)(keys)
    logits, dmap = net.apply(
        {"params": params},
        jnp.concatenate([img1, img2])[..., None])
    l1, l2 = logits[:batch], logits[batch:]
    det = _detector_loss(l1, lbl1) + _detector_loss(l2, lbl2)
    if desc_weight == 0.0:
        # detector-only warmup: the descriptor graph is excluded entirely
        # (0.0 * inf would still be NaN)
        return det, (det, jnp.float32(0.0))
    d1, d2 = _norm_desc(dmap[:batch]), _norm_desc(dmap[batch:])
    desc = jnp.mean(jax.vmap(_descriptor_loss)(d1, d2, Hm))
    return det + desc_weight * desc, (det, desc)


def _make_tx():
    import optax

    # bf16 convs + the 12x corner-cell weighting make raw Adam spiky —
    # clip hard, keep the LR conservative, and SKIP any non-finite update
    # so a single bad batch cannot poison the parameters
    return optax.apply_if_finite(
        optax.chain(optax.clip_by_global_norm(1.0), optax.adam(3e-4)),
        max_consecutive_errors=1000)


@partial(jax.jit, static_argnames=("batch", "inner", "desc_weight"))
def train_chunk(params, opt_state, key, batch: int = 16, inner: int = 20,
                desc_weight: float = 1.0):
    """`inner` optimizer steps in one dispatch (tunnel-RTT amortization)."""
    import optax

    tx = _make_tx()

    def step(carry, k):
        params, opt_state = carry
        (loss, (det, desc)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params, k, batch, desc_weight)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return (params, opt_state), jnp.stack([loss, det, desc])

    (params, opt_state), hist = jax.lax.scan(
        step, (params, opt_state), jax.random.split(key, inner))
    return params, opt_state, hist


def evaluate(params, key, n: int = 16):
    """Held-out synthetic eval: corner localization recall (predicted peak
    within 4 px of a true corner) + homography descriptor matching score
    (fraction of warped cell centers whose nearest descriptor is the
    correct cell)."""
    net = SuperPointNet()
    recalls, match_scores = [], []
    for k in jax.random.split(key, n):
        img1, lbl1, img2, lbl2, Hm = make_pair(k)
        logits, dmap = net.apply({"params": params},
                                 jnp.stack([img1, img2])[..., None])
        score = score_map_from_logits(logits[:1])[0]
        # true corners from the label grid
        lab = np.asarray(lbl1)
        rr, cc = np.where(lab < 64)
        if len(rr) == 0:
            continue
        tx = cc * CELL + (lab[rr, cc] % CELL)
        ty = rr * CELL + (lab[rr, cc] // CELL)
        sm = np.asarray(score)
        # one peak per true corner region
        hit = 0
        for x, y in zip(tx, ty):
            y0, y1 = max(y - 4, 0), min(y + 5, H)
            x0, x1 = max(x - 4, 0), min(x + 5, W)
            win = sm[y0:y1, x0:x1]
            hit += float(win.max() > np.percentile(sm, 99) * 0.5)
        recalls.append(hit / len(rr))
        # descriptor nearest-cell accuracy
        d1 = np.asarray(_norm_desc(dmap[0]))
        d2 = np.asarray(_norm_desc(dmap[1]))
        yy, xx = np.mgrid[0:HC, 0:WC]
        centers = np.stack([xx * CELL + 3.5, yy * CELL + 3.5], -1).reshape(-1, 2)
        c1w = np.asarray(_apply_h(Hm, jnp.asarray(centers)))
        tgt = ((np.round((c1w[:, 1] - 3.5) / CELL).astype(int)) * WC
               + np.round((c1w[:, 0] - 3.5) / CELL).astype(int))
        inb = ((c1w[:, 0] >= 0) & (c1w[:, 0] < W)
               & (c1w[:, 1] >= 0) & (c1w[:, 1] < H))
        sim = d1.reshape(-1, d1.shape[-1]) @ d2.reshape(-1, d2.shape[-1]).T
        nn = sim.argmax(1)
        okm = inb & (tgt >= 0) & (tgt < HC * WC)
        if okm.sum():
            match_scores.append(float((nn[okm] == tgt[okm]).mean()))
    return (float(np.mean(recalls)) if recalls else 0.0,
            float(np.mean(match_scores)) if match_scores else 0.0)


def train(steps: int = 2000, batch: int = 16, inner: int = 20,
          seed: int = 0, out: str = WEIGHTS_PATH, verbose: bool = True,
          params=None):
    sp = SuperPoint(seed=seed, params=params)
    key = jax.random.PRNGKey(seed + 1)
    tx = _make_tx()
    opt_state = tx.init(sp.params)
    params = sp.params
    done = 0
    t0 = time.time()
    while done < steps:
        key, sub = jax.random.split(key)
        # detector-first curriculum: descriptors join after warmup at the
        # paper's small relative weight (DeTone et al.: lambda = 1e-4;
        # slightly larger here because our desc term is already a mean)
        dw = 0.0 if done < steps // 4 else 0.001
        params, opt_state, hist = train_chunk(params, opt_state, sub,
                                              batch=batch, inner=inner,
                                              desc_weight=dw)
        done += inner
        if verbose:
            h = np.asarray(hist[-1])
            print(f"step {done}: loss={h[0]:.3f} det={h[1]:.3f} "
                  f"desc={h[2]:.3f} ({time.time() - t0:.0f}s)", flush=True)
    sp.params = params
    if out:
        os.makedirs(os.path.dirname(out), exist_ok=True)
        # float16 on disk: half the repo weight for ~1e-3 descriptor noise
        flat = jax.tree_util.tree_flatten_with_path(params)[0]
        np.savez_compressed(out, **{
            "/".join(p.key for p in kp): np.asarray(leaf, np.float16)
            for kp, leaf in flat})
    return sp


# -------------------------------------------------------------- real stage
# Round-5 descriptor fine-tune on REAL pixels: the 84 reference sample
# images (384x512 -> the trainer's 120x160 canvas is an exact /3.2 resize)
# with homography-warp supervision on the descriptor head, mixed with the
# synthetic detector+descriptor objective so corner detection stays
# grounded. Motivation: the synthetic-only descriptors matched real frames
# but were weakly view-discriminative (NNDR 66 consecutive vs 49 far on
# the samples), capping the learned BoW operating point.

SAMPLES_DIR = "/root/reference/data/samples"


def load_real_bank(image_dir: str = SAMPLES_DIR, n_images: int = 0):
    """(N, H, W) float32 bank of real grayscale images at canvas size."""
    import glob

    from PIL import Image

    from rtabmap_tpu.ops import image as im

    files = sorted(glob.glob(os.path.join(image_dir, "*.jpg")),
                   key=lambda f: (len(os.path.basename(f)), f))
    if n_images:
        files = files[:n_images]
    bank = []
    for f in files:
        g = im.rgb_to_gray(jnp.asarray(np.asarray(Image.open(f))))
        bank.append(jax.image.resize(g, (H, W), method="linear"))
    return jnp.stack(bank)


def real_desc_loss(params, key, bank, batch: int):
    """Descriptor hinge loss on real-image homography pairs."""
    net = SuperPointNet()

    def one(k):
        k1, k2 = jax.random.split(k)
        img1 = bank[jax.random.randint(k1, (), 0, bank.shape[0])]
        Hm = _rand_homography(k2)
        img2, _ = _warp_image(img1, Hm)
        _logits, dmap = net.apply({"params": params},
                                  jnp.stack([img1, img2])[..., None])
        d1, d2 = _norm_desc(dmap[0]), _norm_desc(dmap[1])
        return _descriptor_loss(d1, d2, Hm)

    return jnp.mean(jax.vmap(one)(jax.random.split(key, batch)))


@partial(jax.jit, static_argnames=("batch", "inner", "real_weight"))
def finetune_chunk(params, opt_state, key, bank, batch: int = 8,
                   inner: int = 10, real_weight: float = 0.2):
    import optax

    tx = _make_tx()

    def step(carry, k):
        params, opt_state = carry
        k1, k2 = jax.random.split(k)

        def total(p):
            syn, _aux = loss_fn(p, k1, batch, 0.001)
            return syn + real_weight * real_desc_loss(p, k2, bank, batch)

        loss, grads = jax.value_and_grad(total)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return (params, opt_state), loss

    (params, opt_state), hist = jax.lax.scan(
        step, (params, opt_state), jax.random.split(key, inner))
    return params, opt_state, hist


def finetune_real(steps: int = 400, batch: int = 8, inner: int = 10,
                  seed: int = 3, out: str = WEIGHTS_PATH,
                  real_weight: float = 0.2, verbose: bool = True):
    """Fine-tune the SHIPPED distilled weights on real-image pairs."""
    from rtabmap_tpu.models.superpoint import SuperPoint

    sp = SuperPoint.distilled()
    bank = load_real_bank()
    tx = _make_tx()
    opt_state = tx.init(sp.params)
    params = sp.params
    key = jax.random.PRNGKey(seed)
    done = 0
    t0 = time.time()
    while done < steps:
        key, sub = jax.random.split(key)
        params, opt_state, hist = finetune_chunk(params, opt_state, sub,
                                                 bank, batch=batch,
                                                 inner=inner,
                                                 real_weight=real_weight)
        done += inner
        if verbose and done % (inner * 5) == 0:
            print(f"finetune step {done}: loss={float(hist[-1]):.3f} "
                  f"({time.time() - t0:.0f}s)", flush=True)
    sp.params = params
    if out:
        flat = jax.tree_util.tree_flatten_with_path(params)[0]
        np.savez_compressed(out, **{
            "/".join(p.key for p in kp): np.asarray(leaf, np.float16)
            for kp, leaf in flat})
    return sp


if __name__ == "__main__":
    import sys

    args = [a for a in sys.argv[1:] if a != "--finetune-real"]
    n = int(args[0]) if args else 2000
    dest = args[1] if len(args) > 1 else WEIGHTS_PATH
    if "--finetune-real" in sys.argv[1:]:
        sp = finetune_real(steps=n, out=dest)
    else:
        sp = train(steps=n, out=dest)
    rec, ms = evaluate(sp.params, jax.random.PRNGKey(99))
    print(f"eval: corner recall={rec:.3f}, desc match={ms:.3f}")
