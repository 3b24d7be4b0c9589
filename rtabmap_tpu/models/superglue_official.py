"""Official-architecture SuperGlue (indoor/outdoor pretrained layout) as a
pure-jax function pipeline.

Capability parity: the reference's PyMatcher bridge runs the MagicLeap
SuperGlue torch graph per loop-closure candidate
(/root/reference/corelib/src/python/rtabmap_superglue.py). This is the
SAME architecture — keypoint-MLP encoder (BatchNorm, eval stats), 18
alternating self/cross attentional-propagation layers (4-head, 256-dim),
final projection, dustbin log-Sinkhorn — expressed as jittable jax so the
pretrained ``superglue_indoor.pth``/``superglue_outdoor.pth`` weights run
on the MXU. ``models/convert.convert_superglue`` maps either the
MagicLeap state_dict or the HF-transformers layout into this param tree;
numerical equivalence against the torch implementation is proven in
tests/test_superglue_official.py.

(The lighter re-scoped matcher in ``models/superglue.py`` remains the
default for scratch training; this module exists to run the OFFICIAL
pretrained weights.)
"""
from __future__ import annotations

from functools import partial
from typing import Dict, List

import jax
import jax.numpy as jnp
import numpy as np

HIDDEN = 256
HEADS = 4
BN_EPS = 1e-5
# official indoor/outdoor checkpoints: 9 (self, cross) pairs
LAYER_TYPES = ("self", "cross") * 9


def _linear(p, x):
    return x @ p["w"].T + p["b"]


def _bn_eval(p, x):
    return (x - p["mean"]) / jnp.sqrt(p["var"] + BN_EPS) * p["gamma"] + p["beta"]


def _mlp_block(p, x):
    return jax.nn.relu(_bn_eval(p["bn"], _linear(p["linear"], x)))


def keypoint_encoder(p: Dict, kpts_norm, scores):
    """(K,2) normalized keypoints + (K,) scores -> (K,256)."""
    x = jnp.concatenate([kpts_norm, scores[:, None]], axis=-1)
    for blk in p["blocks"]:
        x = _mlp_block(blk, x)
    return _linear(p["final"], x)


def _attention(p: Dict, x, source):
    """4-head scaled dot-product attention + output projection.
    x (K,256) queries; source (Ks,256) keys/values."""
    K = x.shape[0]
    Ks = source.shape[0]
    hd = HIDDEN // HEADS
    q = _linear(p["q"], x).reshape(K, HEADS, hd).transpose(1, 0, 2)
    k = _linear(p["k"], source).reshape(Ks, HEADS, hd).transpose(1, 0, 2)
    v = _linear(p["v"], source).reshape(Ks, HEADS, hd).transpose(1, 0, 2)
    att = jax.nn.softmax(q @ k.transpose(0, 2, 1) / jnp.sqrt(hd), axis=-1)
    out = (att @ v).transpose(1, 0, 2).reshape(K, HIDDEN)
    return _linear(p["out"], out)


def _propagate(p: Dict, x, source):
    msg = _attention(p, x, source)
    h = jnp.concatenate([x, msg], axis=-1)
    h = _mlp_block(p["mlp0"], h)
    return _linear(p["mlp1"], h)


def gnn(p: Dict, xa, xb):
    for lp, lt in zip(p["layers"], LAYER_TYPES):
        if lt == "self":
            da = _propagate(lp, xa, xa)
            db = _propagate(lp, xb, xb)
        else:
            da = _propagate(lp, xa, xb)
            db = _propagate(lp, xb, xa)
        xa = xa + da
        xb = xb + db
    return xa, xb


def log_optimal_transport(scores, bin_score, iters: int):
    """Dustbin-augmented log-space Sinkhorn (official log_optimal_transport
    — SuperGlue paper eq. 8-9)."""
    m, n = scores.shape
    b = jnp.full((m, 1), bin_score)
    c = jnp.full((1, n), bin_score)
    d = jnp.full((1, 1), bin_score)
    couplings = jnp.concatenate(
        [jnp.concatenate([scores, b], 1), jnp.concatenate([c, d], 1)], 0)
    norm = -jnp.log(jnp.float32(m + n))
    log_mu = jnp.concatenate([jnp.full((m,), norm),
                              jnp.log(jnp.float32(n))[None] + norm])
    log_nu = jnp.concatenate([jnp.full((n,), norm),
                              jnp.log(jnp.float32(m))[None] + norm])

    def body(carry, _):
        u, v = carry
        u = log_mu - jax.scipy.special.logsumexp(couplings + v[None, :], axis=1)
        v = log_nu - jax.scipy.special.logsumexp(couplings + u[:, None], axis=0)
        return (u, v), None

    (u, v), _ = jax.lax.scan(body, (jnp.zeros(m + 1), jnp.zeros(n + 1)),
                             None, length=iters)
    return couplings + u[:, None] + v[None, :] - norm


def normalize_keypoints(uv, width, height):
    """Official keypoint normalization: center + scale by 0.7*max(size)."""
    size = jnp.asarray([width, height], jnp.float32)
    center = size / 2.0
    scaling = jnp.max(size) * 0.7
    return (uv - center[None]) / scaling


@partial(jax.jit, static_argnames=("iters",))
def superglue_apply(params: Dict, kpts_a, sc_a, desc_a, kpts_b, sc_b,
                    desc_b, width: float, height: float, iters: int = 100):
    """Full official forward: returns the (Ka+1, Kb+1) log-assignment
    matrix. kpts in pixels, desc (K,256) (pretrained scale), scores (K,)."""
    ka = normalize_keypoints(kpts_a, width, height)
    kb = normalize_keypoints(kpts_b, width, height)
    xa = desc_a + keypoint_encoder(params["kenc"], ka, sc_a)
    xb = desc_b + keypoint_encoder(params["kenc"], kb, sc_b)
    xa, xb = gnn(params["gnn"], xa, xb)
    ma = _linear(params["final"], xa)
    mb = _linear(params["final"], xb)
    scores = (ma @ mb.T) / jnp.sqrt(jnp.float32(HIDDEN))
    return log_optimal_transport(scores, params["bin_score"], iters)


def match_from_scores(Z, threshold: float = 0.2):
    """Mutual-max + threshold decode of the log-assignment (official
    post-processing). Returns (idx_a->b (Ka,), valid (Ka,), score (Ka,))."""
    inner = Z[:-1, :-1]
    idx0 = jnp.argmax(inner, axis=1)
    idx1 = jnp.argmax(inner, axis=0)
    mutual = jnp.arange(inner.shape[0]) == idx1[idx0]
    score = jnp.where(mutual, jnp.exp(inner[jnp.arange(inner.shape[0]), idx0]),
                      0.0)
    valid = mutual & (score > threshold)
    return idx0.astype(jnp.int32), valid, score


def save_params(params: Dict, path: str) -> None:
    flat = {}

    def rec(prefix, obj):
        if isinstance(obj, dict):
            for k, v in obj.items():
                rec(f"{prefix}/{k}" if prefix else k, v)
        elif isinstance(obj, list):
            for i, v in enumerate(obj):
                rec(f"{prefix}/{i}", v)
        else:
            flat[prefix] = np.asarray(obj)

    rec("", params)
    np.savez(path, **flat)


def load_params(path: str) -> Dict:
    data = np.load(path, allow_pickle=False)
    out: Dict = {}
    for key in data.files:
        parts = key.split("/")
        cur = out
        for i, p in enumerate(parts[:-1]):
            nxt_list = parts[i + 1].isdigit() if i + 1 < len(parts) else False
            if p.isdigit():
                p = int(p)
                while len(cur) <= p:
                    cur.append({} if not nxt_list else [])
                if cur[p] == {} and nxt_list:
                    cur[p] = []
                cur = cur[p]
            else:
                if p not in cur:
                    cur[p] = [] if nxt_list else {}
                cur = cur[p]
        leaf = parts[-1]
        val = jnp.asarray(data[key])
        if leaf.isdigit():
            leaf = int(leaf)
            while len(cur) <= leaf:
                cur.append(None)
            cur[leaf] = val
        else:
            cur[leaf] = val
    return out
