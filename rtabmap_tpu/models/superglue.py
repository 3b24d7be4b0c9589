"""Attentional feature matcher (SuperGlue-class) — the PyMatcher slot.

Capability parity: the reference's learned-matcher bridge
(/root/reference/corelib/src/python/PyMatcher.cpp — embedded-Python
SuperGlue/OANet rescoring of descriptor correspondences, used by
RegistrationVis when Vis/CorNNType=5/6). Instead of a CPython bridge to a
torch script, the matcher is a native flax module so the whole thing jits
into the registration step:

- keypoint encoder: MLP on (normalized uv, score) added to descriptors;
- L alternating self-/cross-attention blocks (standard multi-head
  attention — pure matmuls, MXU-friendly);
- optimal matching layer: learned similarity + dustbin row/col and a
  fixed-iteration log-domain Sinkhorn (entropic OT), the
  partial-assignment formulation from the SuperGlue paper (public
  method; implementation our own).

Weights load from ``.npz`` (``load_params``) — pretrained export or
in-domain training; random-initialized weights still produce a valid
doubly-stochastic transport (tested), the hook point being the API parity.
"""
from __future__ import annotations

from functools import partial
from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


class KeypointEncoder(nn.Module):
    dim: int = 128

    @nn.compact
    def __call__(self, uv_norm, score):
        x = jnp.concatenate([uv_norm, score[..., None]], axis=-1)
        for h in (32, 64, self.dim):
            x = nn.Dense(h)(x)
            x = nn.relu(x)
        return x


class AttentionBlock(nn.Module):
    dim: int = 128
    heads: int = 4

    @nn.compact
    def __call__(self, x, source, mask_src):
        """Residual MHA + MLP; ``source`` is x for self-attention, the
        other image's features for cross-attention."""
        att = nn.MultiHeadDotProductAttention(
            num_heads=self.heads, qkv_features=self.dim)(
                x, source, mask=mask_src[None, None, :])
        y = jnp.concatenate([x, att], axis=-1)
        y = nn.Dense(2 * self.dim)(y)
        y = nn.relu(y)
        y = nn.Dense(self.dim)(y)
        return x + y


class SuperGlueNet(nn.Module):
    dim: int = 128
    layers: int = 4

    @nn.compact
    def __call__(self, desc_a, uv_a, sc_a, va, desc_b, uv_b, sc_b, vb):
        proj = nn.Dense(self.dim)
        enc = KeypointEncoder(self.dim)
        xa = proj(desc_a) + enc(uv_a, sc_a)
        xb = proj(desc_b) + enc(uv_b, sc_b)
        for i in range(self.layers):
            blk_self = AttentionBlock(self.dim, name=f"self_{i}")
            blk_cross = AttentionBlock(self.dim, name=f"cross_{i}")
            xa = blk_self(xa, xa, va)
            xb = blk_self(xb, xb, vb)
            xa2 = blk_cross(xa, xb, vb)
            xb2 = blk_cross(xb, xa, va)
            xa, xb = xa2, xb2
        fin = nn.Dense(self.dim)
        xa, xb = fin(xa), fin(xb)
        scores = jnp.einsum("id,jd->ij", xa, xb) / np.sqrt(self.dim)
        dustbin = self.param("dustbin", nn.initializers.ones, ())
        return scores, dustbin


def log_sinkhorn(scores, dustbin, va, vb, iters: int = 30):
    """Log-domain Sinkhorn over the augmented (Ka+1, Kb+1) score matrix
    with dustbin row/col (SuperGlue's partial assignment). Returns log
    transport (Ka+1, Kb+1); invalid keypoints route to the dustbin."""
    Ka, Kb = scores.shape
    neg = -1e9
    s = jnp.where(va[:, None] & vb[None, :], scores, neg)
    s = jnp.concatenate([s, jnp.where(va, dustbin, neg)[:, None]], axis=1)
    bot = jnp.concatenate([jnp.where(vb, dustbin, neg), dustbin[None]])
    s = jnp.concatenate([s, bot[None, :]], axis=0)      # (Ka+1, Kb+1)

    na = jnp.maximum(jnp.sum(va), 1.0)
    nb = jnp.maximum(jnp.sum(vb), 1.0)
    # marginals: each valid keypoint has mass 1; dustbins absorb the rest
    log_mu = jnp.concatenate([jnp.where(va, 0.0, neg), jnp.log(nb)[None]])
    log_nu = jnp.concatenate([jnp.where(vb, 0.0, neg), jnp.log(na)[None]])

    def body(carry, _):
        u, v = carry
        u = log_mu - jax.nn.logsumexp(s + v[None, :], axis=1)
        v = log_nu - jax.nn.logsumexp(s + u[:, None], axis=0)
        return (u, v), None

    (u, v), _ = jax.lax.scan(
        body, (jnp.zeros(Ka + 1), jnp.zeros(Kb + 1)), None, length=iters)
    return s + u[:, None] + v[None, :]


class SuperGlueMatcher:
    """Host wrapper: jitted match() with the Matches-compatible output."""

    def __init__(self, params=None, dim: int = 128, layers: int = 4,
                 seed: int = 0):
        self.net = SuperGlueNet(dim=dim, layers=layers)
        self.params = params
        self._seed = seed

    def init_params(self, key, k: int = 32, desc_dim: int = 256):
        z = jnp.zeros((k, desc_dim))
        uv = jnp.zeros((k, 2))
        sc = jnp.zeros((k,))
        v = jnp.ones((k,), bool)
        return self.net.init(key, z, uv, sc, v, z, uv, sc, v)

    def match(self, desc_a, uv_a, score_a, valid_a,
              desc_b, uv_b, score_b, valid_b,
              image_wh=(640.0, 480.0), threshold: float = 0.2):
        """-> (idx (Ka,), valid (Ka,), confidence (Ka,)): mutual best of
        the Sinkhorn transport above threshold."""
        if self.params is None:
            self.params = self.init_params(
                jax.random.PRNGKey(self._seed), k=int(desc_a.shape[0]),
                desc_dim=int(desc_a.shape[1]))
        return _match(self.net, self.params, desc_a, uv_a, score_a, valid_a,
                      desc_b, uv_b, score_b, valid_b,
                      float(image_wh[0]), float(image_wh[1]), threshold)

    def save_params(self, path: str):
        from flax.traverse_util import flatten_dict

        flat = {"/".join(k): np.asarray(v) for k, v in
                flatten_dict(self.params).items()}
        np.savez(path, **flat)

    @classmethod
    def distilled(cls) -> "SuperGlueMatcher":
        """The in-repo trained matcher weights (models/train_superglue.py
        — synthetic codebook-ambiguous assignment problems; the
        egress-blocked substitute for the downloaded SuperGlue
        checkpoint)."""
        import os

        path = os.path.join(os.path.dirname(__file__), "weights",
                            "superglue_distilled.npz")
        if not os.path.exists(path):
            raise FileNotFoundError(
                f"{path} missing — run python -m "
                "rtabmap_tpu.models.train_superglue to (re)train it")
        return cls.load_params(path)

    @classmethod
    def load_params(cls, path: str, dim: int = 128,
                    layers: int = 4) -> "SuperGlueMatcher":
        from flax.traverse_util import unflatten_dict

        raw = np.load(path)
        tree = unflatten_dict({tuple(k.split("/")): jnp.asarray(raw[k])
                               for k in raw.files})
        return cls(params=tree, dim=dim, layers=layers)


@partial(jax.jit, static_argnames=("net",))
def _match(net, params, desc_a, uv_a, sc_a, va, desc_b, uv_b, sc_b, vb,
           w: float, h: float, threshold: float):
    s = jnp.array([w, h], jnp.float32)
    na = (uv_a / s) * 2.0 - 1.0
    nb = (uv_b / s) * 2.0 - 1.0
    scores, dustbin = net.apply(params, desc_a.astype(jnp.float32), na,
                                sc_a, va, desc_b.astype(jnp.float32), nb,
                                sc_b, vb)
    logp = log_sinkhorn(scores, dustbin, va, vb)
    p = jnp.exp(logp[:-1, :-1])                     # (Ka,Kb)
    idx = jnp.argmax(p, axis=1).astype(jnp.int32)
    conf = jnp.max(p, axis=1)
    back = jnp.argmax(p, axis=0).astype(jnp.int32)
    mutual = back[idx] == jnp.arange(p.shape[0])
    ok = va & mutual & (conf > threshold) & vb[idx]
    return idx, ok, conf
