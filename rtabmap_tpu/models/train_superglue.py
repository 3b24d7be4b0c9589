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


def _norm_uv(uv):
    size = jnp.array([W_IMG, H_IMG])
    return (uv - size / 2.0) / jnp.max(size)


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

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 3000
    dest = sys.argv[2] if len(sys.argv) > 2 else WEIGHTS_PATH
    m = train(steps=n, out=dest)
    p, r, nn_base = evaluate(m.params, jax.random.PRNGKey(77))
    print(f"eval: precision={p:.3f} recall={r:.3f} "
          f"(NNDR baseline recall={nn_base:.3f})")
