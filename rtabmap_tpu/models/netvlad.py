"""NetVLAD-style global descriptors + a matmul retrieval index.

Capability parity: the reference's ``GlobalDescriptorExtractor`` with its
single implementation, the embedded-Python NetVLAD wrapper
(/root/reference/corelib/include/rtabmap/core/GlobalDescriptorExtractor.h:42
and corelib/src/python/rtabmap_netvlad.py), whose descriptors feed
loop-closure candidate retrieval. Rebuilt TPU-native: VLAD aggregation
over the frame's local descriptors is a (K,C) soft-assignment matmul +
residual einsum on the MXU — no Python bridge, no torch. The codebook is
either learned (flax param) or fit by jitted k-means over the BoW slab;
retrieval over stored frames is one (N,G) @ (G,) cosine matmul.
"""
from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


@partial(jax.jit, static_argnames=("iters", "n_clusters"))
def kmeans_codebook(desc, valid, key, n_clusters: int = 64, iters: int = 10):
    """Fit a (C, D) codebook with jitted Lloyd iterations (masked).

    desc (N, D) float; invalid rows excluded via the mask."""
    N, D = desc.shape
    x = jnp.where(valid[:, None], desc, 0.0)
    idx = jax.random.choice(key, N, (n_clusters,), replace=False,
                            p=valid.astype(jnp.float32) / jnp.maximum(jnp.sum(valid), 1))
    centers = desc[idx]

    def step(centers, _):
        d2 = (jnp.sum(x * x, axis=1, keepdims=True)
              - 2.0 * x @ centers.T + jnp.sum(centers * centers, axis=1)[None])
        assign = jnp.argmin(d2, axis=1)
        onehot = (jax.nn.one_hot(assign, n_clusters) * valid[:, None])
        sums = onehot.T @ x
        cnts = jnp.sum(onehot, axis=0)
        new = jnp.where(cnts[:, None] > 0, sums / jnp.maximum(cnts[:, None], 1),
                        centers)
        return new, None

    centers, _ = jax.lax.scan(step, centers, None, length=iters)
    return centers


@partial(jax.jit, static_argnames=("soft",))
def vlad(desc, valid, codebook, alpha: float = 10.0, soft: bool = True):
    """VLAD aggregation -> L2-normalized (C*D,) global descriptor.

    Soft assignment (NetVLAD) or hard (classic VLAD); intra-normalization
    per cluster then global L2 (the NetVLAD normalization stack)."""
    C, D = codebook.shape
    x = desc.astype(jnp.float32)
    d2 = (jnp.sum(x * x, axis=1, keepdims=True) - 2.0 * x @ codebook.T
          + jnp.sum(codebook * codebook, axis=1)[None])
    if soft:
        a = jax.nn.softmax(-alpha * d2, axis=1)          # (K, C)
    else:
        a = jax.nn.one_hot(jnp.argmin(d2, axis=1), C)
    a = a * valid[:, None]
    resid = x[:, None, :] - codebook[None, :, :]          # (K, C, D)
    v = jnp.einsum("kc,kcd->cd", a, resid)
    v = v / jnp.maximum(jnp.linalg.norm(v, axis=1, keepdims=True), 1e-12)
    v = v.reshape(-1)
    return v / jnp.maximum(jnp.linalg.norm(v), 1e-12)


class NetVLAD:
    """Host facade: codebook management + per-frame extraction."""

    def __init__(self, codebook: Optional[np.ndarray] = None,
                 n_clusters: int = 64, alpha: float = 10.0):
        self.codebook = None if codebook is None else jnp.asarray(codebook)
        self.n_clusters = n_clusters
        self.alpha = alpha

    def fit(self, desc, valid, seed: int = 0):
        self.codebook = kmeans_codebook(
            jnp.asarray(desc, jnp.float32), jnp.asarray(valid),
            jax.random.PRNGKey(seed), n_clusters=self.n_clusters)
        return self

    def extract(self, desc, valid):
        assert self.codebook is not None, "fit() or pass a codebook first"
        return vlad(jnp.asarray(desc, jnp.float32), jnp.asarray(valid),
                    self.codebook, alpha=self.alpha)

    @property
    def dim(self) -> int:
        return 0 if self.codebook is None else int(np.prod(self.codebook.shape))


@jax.jit
def _cosine_topk_scores(slab, slab_valid, q):
    sims = slab @ q
    return jnp.where(slab_valid, sims, -2.0)


class GlobalDescriptorIndex:
    """Fixed-capacity retrieval slab: add per-node global descriptors, query
    cosine top-k in one matmul (the loop-closure candidate shortlist the
    reference builds from NetVLAD descriptors)."""

    def __init__(self, dim: int, capacity: int = 4096):
        self.slab = jnp.zeros((capacity, dim), jnp.float32)
        self.valid = jnp.zeros((capacity,), bool)
        self.ids = np.full((capacity,), -1, np.int64)
        self.cursor = 0

    def add(self, node_id: int, g):
        slot = self.cursor % self.slab.shape[0]
        self.slab = self.slab.at[slot].set(jnp.asarray(g))
        self.valid = self.valid.at[slot].set(True)
        self.ids[slot] = node_id
        self.cursor += 1

    def query(self, g, k: int = 5, exclude_ids=()) -> Tuple[np.ndarray, np.ndarray]:
        """-> (node_ids (k,), cosine scores (k,)); unfilled slots = -1."""
        scores = np.array(_cosine_topk_scores(self.slab, self.valid,
                                              jnp.asarray(g)))
        for e in exclude_ids:
            scores[self.ids == e] = -2.0
        order = np.argsort(-scores)[:k]
        return self.ids[order], scores[order]
