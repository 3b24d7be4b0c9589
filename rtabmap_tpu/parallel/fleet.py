"""Fleet serving: batched multi-session loop-closure detection on one chip.

Beyond-the-reference capability (the reference is strictly one robot per
process): a localization/mapping *fleet* — B sessions, each with its own
working-memory node slab and Bayes posterior, sharing one frozen
vocabulary (the Mem/IncrementalMemory=false serving deployment) — ticks
in a single jitted device step:

- quantization: all sessions' descriptors fold into ONE (B*K, W) Hamming
  matmul against the shared vocab slab — batching raises MXU utilization
  instead of multiplying dispatches;
- tf-idf likelihood and the Bayes recursion vmap over the session axis;
- hypothesis selection returns (node, probability) per session.

Composes with `sharded.py`: put the vocab axis on the mesh
(`sharded_knn2`) and the session axis on data-parallel replicas for
multi-chip fleets.
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from rtabmap_tpu.bayes import filter as BF
from rtabmap_tpu.ops.features import DESC_DIM
from rtabmap_tpu.vocab.dictionary import tfidf_likelihood


class FleetState(NamedTuple):
    """Per-session working memory (leading axis = session)."""
    node_words: jnp.ndarray   # (B, N, K) int32, -1 pad
    node_valid: jnp.ndarray   # (B, N) bool
    word_nw: jnp.ndarray      # (B, W) float32 — per-session word→#nodes
    posterior: jnp.ndarray    # (B, N+1)
    nbr_idx: jnp.ndarray      # (B, N, Kn) int32 graph neighborhoods
    nbr_margin: jnp.ndarray   # (B, N, Kn) int32


def init_fleet(batch: int, node_capacity: int, words_per_frame: int,
               vocab_capacity: int, max_neighbors: int = 17) -> FleetState:
    B, N, K = batch, node_capacity, words_per_frame
    return FleetState(
        node_words=jnp.full((B, N, K), -1, jnp.int32),
        node_valid=jnp.zeros((B, N), bool),
        word_nw=jnp.zeros((B, vocab_capacity), jnp.float32),
        posterior=jnp.zeros((B, N + 1)).at[:, N].set(1.0),
        nbr_idx=jnp.full((B, N, max_neighbors), -1, jnp.int32),
        nbr_margin=jnp.zeros((B, N, max_neighbors), jnp.int32),
    )


def _quantize_flat(flat, slab, word_valid):
    """1-NN word assignment for (Q,D) descriptors.

    At fleet batch sizes a plain bf16 matmul + argmax is fastest (5.2 ms
    for 16k queries vs 131k words on v5e): XLA fuses the argmax into the
    matmul epilogue so the (Q,W) similarity never hits HBM. (The fused
    Pallas 2-NN kernel wins only in the engine's small-Q, need-top-2
    regime; chunking it here measured 51 ms.)"""
    sim = jnp.dot(flat.astype(jnp.bfloat16), slab.astype(jnp.bfloat16).T,
                  preferred_element_type=jnp.float32)
    sim = jnp.where(word_valid[None, :], sim, -jnp.inf)
    return jnp.argmax(sim, axis=-1).astype(jnp.int32)


@partial(jax.jit, static_argnames=("vocab_cap",))
def fleet_tick(state: FleetState, desc, desc_valid, slab, word_valid,
               kernel, vp_prior, vocab_cap: int):
    """One loop-closure tick for every session.

    desc: (B, K, D) ±1 int8; slab: (W, D) shared frozen vocabulary.
    Returns (word_ids (B,K), posterior (B,N+1), best (B,) slot,
    best_p (B,) = 1 - P(virtual)).
    """
    B, K, D = desc.shape
    W = slab.shape[0]
    # ---- quantization: the whole fleet's descriptors against the shared
    # slab via the fused/blocked 1-NN (never materializes the (B*K, W)
    # similarity matrix — 8.6 GB at serving scale)
    flat = desc.reshape(B * K, D)
    nn = _quantize_flat(flat, slab, word_valid)
    word_ids = nn.reshape(B, K)
    word_ids = jnp.where(desc_valid, word_ids, -1)

    # ---- per-session tf-idf likelihood + Bayes recursion (vmap)
    from rtabmap_tpu.vocab.dictionary import adjust_likelihood

    def one(qw, nwords, nvalid, nw, post, nbr_i, nbr_m):
        n_places = jnp.maximum(jnp.sum(nvalid).astype(jnp.float32), 1.0)
        lik = tfidf_likelihood(qw, nwords, nvalid, nw, n_places, vocab_cap)
        adj, virt = adjust_likelihood(lik, nvalid)   # Angeli normalization
        post = BF._predict_and_update(post, adj, virt, nbr_i,
                                      nbr_m, nvalid, kernel, vp_prior)
        return lik, post

    lik, post = jax.vmap(one)(word_ids, state.node_words, state.node_valid,
                              state.word_nw, state.posterior,
                              state.nbr_idx, state.nbr_margin)
    best = jnp.argmax(post[:, :-1], axis=-1).astype(jnp.int32)
    best_p = 1.0 - post[:, -1]
    return word_ids, post, best, best_p


@jax.jit
def fleet_insert(state: FleetState, session_slots, node_slots, word_ids):
    """Register one new node per session (or a subset): scatter the word
    lists, validity, per-word counts, and chain-graph neighborhoods.

    session_slots: (M,) sessions touched; node_slots: (M,) slot per
    session; word_ids: (M, K).
    """
    B, N, K = state.node_words.shape
    s, n = session_slots, node_slots
    nw = state.node_words.at[s, n].set(word_ids)
    nv = state.node_valid.at[s, n].set(True)
    # per-word node counts: +1 for each unique word of the node
    W = state.word_nw.shape[1]
    uniq = jnp.where(word_ids >= 0, word_ids, W)
    # collapse duplicates within the node: count a word once
    sorted_w = jnp.sort(uniq, axis=-1)
    first = jnp.concatenate(
        [jnp.ones((len(s), 1), bool),
         sorted_w[:, 1:] != sorted_w[:, :-1]], axis=1)
    contrib = jnp.where(first & (sorted_w < W), 1.0, 0.0)
    wn = state.word_nw.at[
        jnp.repeat(s, K), sorted_w.reshape(-1).clip(0, W - 1)
    ].add(jnp.where(sorted_w.reshape(-1) < W, contrib.reshape(-1), 0.0))
    # chain topology: neighbors = [self-1 .. self+1] margins (the engine
    # supplies true graph tables; the fleet demo uses time-chain maps)
    Kn = state.nbr_idx.shape[2]
    offs = jnp.arange(Kn) - Kn // 2
    idx = n[:, None] + offs[None, :]
    ok = (idx >= 0) & (idx < N)
    ni = state.nbr_idx.at[s, n].set(jnp.where(ok, idx, -1).astype(jnp.int32))
    nm = state.nbr_margin.at[s, n].set(jnp.abs(offs)[None, :].astype(jnp.int32)
                                       * jnp.ones((len(s), 1), jnp.int32))
    post = state.posterior
    return FleetState(nw, nv, wn, post, ni, nm)


def demo_fleet(batch: int = 8, node_capacity: int = 64, k: int = 128,
               vocab_cap: int = 4096, seed: int = 0):
    """Small self-contained fleet run (used by tests + perf probe):
    every session maps 10 synthetic places then revisits place 3; the
    posterior must peak at the revisited node in every session."""
    rng = np.random.RandomState(seed)
    B = batch
    kernel = jnp.asarray(BF.DEFAULT_PREDICTION_LC)
    vp = jnp.float32(0.9)

    # frozen vocabulary + per-place word sets
    slab = jnp.asarray(np.where(rng.rand(vocab_cap, DESC_DIM) > 0.5, 1, -1),
                       jnp.int8)
    word_valid = jnp.ones((vocab_cap,), bool)
    place_words = rng.randint(0, vocab_cap, (B, 10, k)).astype(np.int32)

    state = init_fleet(B, node_capacity, k, vocab_cap)
    slab_np = np.asarray(slab)
    posts = None
    for t in range(10):
        desc = jnp.asarray(slab_np[place_words[:, t]])       # (B,k,D)
        wid, posts, best, best_p = fleet_tick(
            state, desc, jnp.ones((B, k), bool), slab, word_valid,
            kernel, vp, vocab_cap)
        state = fleet_insert(state, jnp.arange(B, dtype=jnp.int32),
                             jnp.full((B,), t, jnp.int32), wid)
    # revisit place 3 everywhere
    desc = jnp.asarray(slab_np[place_words[:, 3]])
    _, posts, best, best_p = fleet_tick(
        state, desc, jnp.ones((B, k), bool), slab, word_valid,
        kernel, vp, vocab_cap)
    return np.asarray(best), np.asarray(best_p), state
