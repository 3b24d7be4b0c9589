"""Incremental bag-of-visual-words vocabulary, MXU-native.

Capability parity: the reference's ``VWDictionary``
(/root/reference/corelib/src/VWDictionary.cpp — incremental vocabulary with
NNDR quantization and new-word creation at :913 ``addNewWords``, index
update at :475, fixed-dictionary mode, reference counting feeding tf-idf)
and its FLANN backend (FlannIndex.cpp / rtflann). The kd-tree is replaced
by EXACT blocked matmul 2-NN over a fixed-capacity ±1 descriptor slab —
top-k on the MXU beats an incremental kd-tree on TPU and removes FLANN's
approximation error; slab growth is a masked scatter, no rebuilds.

Since round 5 the ENTIRE quantization — 2-NN search, NNDR new-word rule,
slot numbering (cumsum + capacity clamp) and the slab scatter — runs on
device (``_insert_after_quantize``); ``quantize_async`` makes zero host
fetches and the host word counter catches up from the deferred n_new.
"""
from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from rtabmap_tpu.ops import matching as M
from rtabmap_tpu.ops.features import DESC_DIM


@partial(jax.jit, static_argnames=("block", "use_pallas"))
def _quantize_kernel(desc, valid, slab, word_valid, nndr: jnp.ndarray, block: int = 8192,
                     use_pallas: bool = False):
    """2-NN against the word slab + Lowe test.

    Returns (nn_idx (K,), is_new (K,)): is_new=True when the descriptor is
    not distinctive enough for its nearest word (dist0 > nndr * dist1 —
    the reference's incremental-mode new-word rule), or when the
    dictionary is empty for that query.
    """
    if use_pallas:
        from rtabmap_tpu.ops.pallas.vocab_knn import best_block, pallas_knn2

        d, i = pallas_knn2(desc, slab, word_valid,
                           block=best_block(desc.shape[0], slab.shape[0]))
    else:
        d, i = M.knn_blocked(desc, slab, k=2, block=block, base_valid=word_valid)
    has_any = jnp.any(word_valid)
    d0, d1 = d[:, 0], d[:, 1]
    # no valid second neighbor -> treat as distinctive (match first) unless
    # no words at all
    no_second = d1 > 1e8
    is_new = jnp.where(
        no_second, d0 > 1e8, d0 > nndr * d1
    )
    is_new = jnp.where(has_any, is_new, True) & valid
    return i[:, 0], is_new


@partial(jax.jit, static_argnames=("incremental",))
def _insert_after_quantize(nn_idx, is_new, desc, valid, slab, word_valid,
                           n_words, free, incremental: bool = True):
    """DEVICE-side new-word slot assignment + insertion — the host cumsum/
    clamp of the legacy quantize() moved on-device so the whole
    quantization stage needs NO host round trip (the tunnel RTT was ~26 ms
    of every engine tick). ``n_words``/``free`` ride in as traced scalars;
    the host counter catches up from the returned n_new."""
    if not incremental:
        word_ids = jnp.where(valid & ~is_new, nn_idx, -1).astype(jnp.int32)
        return (word_ids, jnp.zeros_like(is_new),
                jnp.zeros((), jnp.int32), slab, word_valid)
    order = jnp.cumsum(is_new.astype(jnp.int32))
    keep = is_new & (order <= free)
    slots = (n_words + jnp.cumsum(keep.astype(jnp.int32)) - 1).astype(jnp.int32)
    W = slab.shape[0]
    safe = jnp.where(keep, slots, W)
    slab = slab.at[safe].set(desc, mode="drop")
    word_valid = word_valid.at[safe].set(True, mode="drop")
    word_ids = jnp.where(valid, jnp.where(keep, slots, nn_idx),
                         -1).astype(jnp.int32)
    return word_ids, keep, jnp.sum(keep, dtype=jnp.int32), slab, word_valid


class VWDictionary:
    """Host-managed vocabulary over a device descriptor slab."""

    def __init__(self, capacity: int = 131072, desc_dim: int = DESC_DIM,
                 nndr: float = 0.8, incremental: bool = True, block: int = 8192):
        self.capacity = capacity
        self.nndr = float(nndr)
        self.incremental = incremental
        self.block = block
        self.slab = jnp.zeros((capacity, desc_dim), jnp.int8)
        self.word_valid = jnp.zeros((capacity,), bool)
        self.n_words = 0
        self.mesh = None          # set by shard(): multi-chip word slab
        self.shard_axis = "shard"

    def shard(self, mesh, axis: str = "shard") -> "VWDictionary":
        """Partition the descriptor slab over a device mesh axis: the 2-NN
        quantization then runs shard-local on each chip's slab block with a
        single top-2 gather (parallel.sharded.sharded_knn2) — the
        vocabulary memory ceiling and the search FLOPs both scale with
        chips (SURVEY.md §2.3(a))."""
        from jax.sharding import NamedSharding, PartitionSpec as P

        n_sh = mesh.shape[axis]
        if self.capacity % n_sh:
            raise ValueError(
                f"vocab capacity {self.capacity} not divisible by "
                f"{n_sh} shards")
        self.mesh, self.shard_axis = mesh, axis
        self.slab = jax.device_put(self.slab,
                                   NamedSharding(mesh, P(axis, None)))
        self.word_valid = jax.device_put(self.word_valid,
                                         NamedSharding(mesh, P(axis)))
        return self

    def quantize(self, desc, valid) -> Tuple[np.ndarray, np.ndarray]:
        """Assign word ids to descriptors; create new words in incremental
        mode. Returns (word_ids (K,) int32 with -1 for invalid slots,
        is_new (K,) bool)."""
        wid_dev, new_dev, n_new_dev = self.quantize_async(desc, valid)
        wid, new, n_new = jax.device_get((wid_dev, new_dev, n_new_dev))
        self.commit_new_words(int(n_new))
        return wid, new

    def quantize_async(self, desc, valid):
        """DEVICE-only quantization + new-word insertion — zero host
        fetches (the engine's async tick overlaps the transfer with the
        rest of the tick). Returns (word_ids_dev, is_new_dev, n_new_dev);
        the caller must pass the fetched n_new to ``commit_new_words``
        BEFORE the next quantize call."""
        from rtabmap_tpu.ops.pallas.vocab_knn import use_pallas_ok

        if self.mesh is not None:
            nn_idx, is_new = self._quantize_sharded(desc, valid)
        else:
            nn_idx, is_new = _quantize_kernel(
                desc, valid, self.slab, self.word_valid,
                jnp.float32(self.nndr),
                block=self.block,
                use_pallas=use_pallas_ok(desc.shape[0], self.capacity),
            )
        free = self.capacity - self.n_words
        word_ids, keep, n_new, self.slab, self.word_valid = \
            _insert_after_quantize(
                nn_idx, is_new, desc, valid, self.slab, self.word_valid,
                jnp.int32(self.n_words), jnp.int32(free),
                incremental=self.incremental)
        return word_ids, keep, n_new

    def commit_new_words(self, n_new: int):
        self.n_words += int(n_new)

    def _quantize_sharded(self, desc, valid):
        """Sharded-slab global 2-NN (per-shard MXU top-2 + one gather,
        parallel.sharded.sharded_knn2) with the identical NNDR new-word
        rule as ``_quantize_kernel`` — the distance conventions match
        (hamming via (D-sim)/2, invalid words -> 1e9)."""
        if getattr(self, "_sharded_quant_fn", None) is None:
            from rtabmap_tpu.parallel.sharded import sharded_knn2

            mesh, axis = self.mesh, self.shard_axis

            def fn(desc, valid, slab, word_valid, nndr):
                d, i = sharded_knn2(mesh, desc, slab, word_valid, axis=axis)
                has_any = jnp.any(word_valid)
                d0, d1 = d[:, 0], d[:, 1]
                no_second = d1 > 1e8
                is_new = jnp.where(no_second, d0 > 1e8, d0 > nndr * d1)
                is_new = jnp.where(has_any, is_new, True) & valid
                return i[:, 0].astype(jnp.int32), is_new

            self._sharded_quant_fn = jax.jit(fn)
        return self._sharded_quant_fn(desc, valid, self.slab,
                                      self.word_valid,
                                      jnp.float32(self.nndr))

    def descriptors(self, word_ids):
        return self.slab[jnp.asarray(word_ids)]

    def state_dict(self):
        return {
            "slab": np.asarray(self.slab),
            "word_valid": np.asarray(self.word_valid),
            "n_words": self.n_words,
            "nndr": self.nndr,
            "incremental": self.incremental,
        }

    @classmethod
    def from_state(cls, st) -> "VWDictionary":
        d = cls(capacity=st["slab"].shape[0], desc_dim=st["slab"].shape[1],
                nndr=st["nndr"], incremental=st["incremental"])
        d.slab = jnp.asarray(st["slab"])
        d.word_valid = jnp.asarray(st["word_valid"])
        d.n_words = int(st["n_words"])
        return d


# --------------------------------------------------------------- tf-idf likelihood


@partial(jax.jit, static_argnames=("vocab_cap",))
def tfidf_likelihood(query_words, node_words, node_valid, word_nw, n_places, vocab_cap):
    """tf-idf likelihood of the query frame against all resident nodes.

    Exact re-expression of Memory::computeLikelihood
    (/root/reference/corelib/src/Memory.cpp:2177): for each unique query
    word w, every node j containing w gains nwi * log10(N/nw) / ni. Here
    the inverted-index loop becomes: build a (W,) weight indicator over
    unique query words (scatter-set collapses duplicates), then one (N,K)
    gather + row-sum — node word lists carry duplicates, which reproduces
    the nwi factor exactly.

    query_words (K,) int32 (-1 invalid); node_words (N,K) int32 (-1 pad);
    word_nw (W,) float32 signatures-per-word; n_places scalar.
    Returns (N,) float32 likelihood (invalid nodes -> 0).
    """
    W = vocab_cap
    nw = jnp.maximum(word_nw, 0.0)
    logNnw = jnp.where(nw > 0, jnp.log10(jnp.maximum(n_places, 1.0) / jnp.maximum(nw, 1.0)), 0.0)
    qw = jnp.where(query_words >= 0, query_words, W)
    # TPU form: a (N,K) gather from the (W,) weight table serializes on
    # the scalar path (~6 ms/session at W=131k) — instead dedupe the <=K
    # query words and contract node word ids against them with a fused
    # compare*weight reduce (VPU, no (N,K,Kq) materialization): ~20x.
    qs = jnp.sort(qw)                                      # (Kq,) W = pad
    first = jnp.concatenate([jnp.ones((1,), bool), qs[1:] != qs[:-1]])
    wq = jnp.where(first & (qs < W),
                   logNnw[jnp.clip(qs, 0, W - 1)], 0.0)    # (Kq,)
    nwj = jnp.where(node_words >= 0, node_words, -1)
    contrib = jnp.sum(
        (nwj[:, :, None] == qs[None, None, :]) * wq[None, None, :],
        axis=-1)                                           # (N,K) fused
    ni = jnp.sum(node_words >= 0, axis=-1)   # words per node
    lik = jnp.sum(contrib, axis=-1) / jnp.maximum(ni, 1)
    return jnp.where(node_valid & (ni > 0), lik, 0.0)


@jax.jit
def similarity_likelihood(query_words, node_words, node_valid):
    """Non-tf-idf likelihood (reference: Kp/TfIdfLikelihoodUsed=false ->
    Memory::computeLikelihood uses Signature::compareTo, Memory.cpp:2145:
    similarity = shared UNIQUE words / max(unique word counts) — the
    2010-2013 papers' likelihood).

    TPU form: sorted-dedupe masks on both sides, then one fused
    (N,K,Kq) compare-reduce (no gather, same shape discipline as the
    tf-idf kernel)."""
    W = jnp.int32(2 ** 30)
    qw = jnp.where(query_words >= 0, query_words, W)
    qs = jnp.sort(qw)
    firstq = jnp.concatenate([jnp.ones((1,), bool), qs[1:] != qs[:-1]])
    quniq = firstq & (qs < W)
    nwj = jnp.where(node_words >= 0, node_words, W)
    ns = jnp.sort(nwj, axis=-1)                               # (N,K)
    firstn = jnp.concatenate(
        [jnp.ones((ns.shape[0], 1), bool), ns[:, 1:] != ns[:, :-1]], axis=1)
    nuniq = firstn & (ns < W)
    shared = jnp.sum(
        (ns[:, :, None] == qs[None, None, :])
        & nuniq[:, :, None] & quniq[None, None, :], axis=(-2, -1))
    nq = jnp.sum(quniq)
    nn = jnp.sum(nuniq, axis=-1)
    sim = shared / jnp.maximum(jnp.maximum(nq, nn), 1)
    return jnp.where(node_valid & (nn > 0), sim.astype(jnp.float32), 0.0)


def adjust_likelihood(lik, node_valid):
    """Angeli mean/stddev normalization + virtual-place score.

    Exact re-expression of Rtabmap::adjustLikelihood
    (/root/reference/corelib/src/Rtabmap.cpp:5691) for the default
    ``_virtualPlaceLikelihoodRatio == 0`` mode: values > mean+std map to
    (v - (std - eps)) / mean, others to 1; virtual place scores
    mean/std + 1 (or 2 when degenerate).

    Returns (adjusted (N,), virtual_score ()).
    """
    eps = 1e-4
    mask = node_valid & (lik > 0)
    n = jnp.maximum(jnp.sum(mask), 1)
    mean = jnp.sum(jnp.where(mask, lik, 0.0)) / n
    var = jnp.sum(jnp.where(mask, (lik - mean) ** 2, 0.0)) / jnp.maximum(n - 1, 1)
    std = jnp.sqrt(jnp.maximum(var, 0.0))
    max_v = jnp.max(jnp.where(mask, lik, 0.0))
    adjusted = jnp.where(
        mask & (lik > mean + std) & (mean > 0),
        (lik - (std - eps)) / jnp.maximum(mean, 1e-12),
        1.0,
    )
    adjusted = jnp.where(node_valid, adjusted, 0.0)
    virtual = jnp.where((std > eps) & (max_v > 0), mean / jnp.maximum(std, 1e-12) + 1.0, 2.0)
    return adjusted, virtual
