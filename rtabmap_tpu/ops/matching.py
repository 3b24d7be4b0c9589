"""Descriptor matching as MXU matmuls: NN / NNDR / projection-guided search.

Capability parity: the reference's descriptor-correspondence machinery —
FLANN/brute-force NNDR matching in ``RegistrationVis``
(/root/reference/corelib/src/RegistrationVis.cpp:735-783) and the
``VWDictionary`` NN quantization (corelib/src/VWDictionary.cpp:913). The
kd-tree is deliberately replaced with exact blocked matmul top-k: for ±1
sign descriptors, ``hamming = (D - a @ b.T) / 2``, which maps straight onto
the MXU and is exact (no FLANN approximation error).
"""
from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from rtabmap_tpu.ops.features import DESC_DIM


def similarity_matrix(a, b, precision=jnp.bfloat16):
    """a (Ka,D) ±1 int8, b (Kb,D) ±1 int8 -> dot similarity (Ka,Kb) f32.

    Invalid (zeroed) descriptors produce similarity 0 == hamming D/2.
    """
    am = a.astype(precision)
    bm = b.astype(precision)
    return jnp.dot(am, bm.T, preferred_element_type=jnp.float32)


def hamming_matrix(a, b):
    return (DESC_DIM - similarity_matrix(a, b)) * 0.5


def l2_matrix(a, b):
    """Squared-L2 distances of float descriptors via one matmul
    (|a|^2 + |b|^2 - 2ab) — the float-descriptor (SIFT-family /
    SuperPoint) metric."""
    sim = jnp.dot(a.astype(jnp.float32), b.astype(jnp.float32).T)
    na = jnp.sum(a.astype(jnp.float32) ** 2, axis=-1)
    nb = jnp.sum(b.astype(jnp.float32) ** 2, axis=-1)
    return jnp.maximum(na[:, None] + nb[None, :] - 2.0 * sim, 0.0)


def distance_matrix(a, b, metric: str = "hamming"):
    return hamming_matrix(a, b) if metric == "hamming" else l2_matrix(a, b)


class Matches(NamedTuple):
    """Fixed-size match set from a's perspective."""

    idx: jnp.ndarray       # (Ka,) int32 index into b (best NN)
    dist: jnp.ndarray      # (Ka,) float32 best distance
    second: jnp.ndarray    # (Ka,) float32 second-best distance
    valid: jnp.ndarray     # (Ka,) bool passes NNDR + validity


def match_nndr(desc_a, valid_a, desc_b, valid_b, nndr: float = 0.8,
               max_dist: Optional[float] = None,
               guess_uv: Optional[jnp.ndarray] = None,
               uv_b: Optional[jnp.ndarray] = None,
               window: float = 0.0, metric: str = "hamming") -> Matches:
    """Nearest-neighbour + Lowe ratio matching a -> b.

    When ``guess_uv``/``uv_b``/``window`` are given, candidates outside the
    projection window are excluded (reference's guess-projected window
    search, RegistrationVis.cpp:590-660), fused into the same masked top-2.
    ``metric``: "hamming" for ±1 int8 descriptors, "l2" for float
    (SIFT-family, SuperPoint) descriptors.
    """
    d = distance_matrix(desc_a, desc_b, metric)  # (Ka,Kb)
    inf = jnp.float32(1e9)
    mask = valid_b[None, :]
    # presence of the projection gates the mode (window may be a traced
    # scalar under jit — never compare it in Python)
    if guess_uv is not None and uv_b is not None:
        du = guess_uv[:, None, 0] - uv_b[None, :, 0]
        dv = guess_uv[:, None, 1] - uv_b[None, :, 1]
        mask = mask & ((du * du + dv * dv) <= window * window)
    d = jnp.where(mask, d, inf)
    # top-2 smallest via two masked min/argmin passes — cheaper on the VPU
    # than the general sorting network lax.top_k lowers to
    best = jnp.min(d, axis=-1)
    idx = jnp.argmin(d, axis=-1).astype(jnp.int32)
    cols = jax.lax.broadcasted_iota(jnp.int32, d.shape, d.ndim - 1)
    second = jnp.min(jnp.where(cols == idx[:, None], inf, d), axis=-1)
    ok = valid_a & (best < inf * 0.5) & (best <= nndr * second)
    if max_dist is not None:
        ok = ok & (best <= max_dist)
    return Matches(idx=idx, dist=best, second=second, valid=ok)


def cross_check(m_ab: Matches, m_ba: Matches) -> jnp.ndarray:
    """Mutual-consistency mask for a->b matches."""
    back = m_ba.idx[m_ab.idx]
    ids = jnp.arange(m_ab.idx.shape[0], dtype=jnp.int32)
    return m_ab.valid & m_ba.valid[m_ab.idx] & (back == ids)


def match_nndr_bidir(desc_a, valid_a, desc_b, valid_b, nndr: float = 0.8,
                     metric: str = "hamming"):
    """(m_ab, m_ba) from ONE distance matrix — halves the matmul + masking
    work of calling ``match_nndr`` per direction."""
    d = distance_matrix(desc_a, desc_b, metric)  # (Ka,Kb)
    inf = jnp.float32(1e9)

    def reduce(dm, valid_rows, valid_cols):
        dm = jnp.where(valid_cols[None, :], dm, inf)
        best = jnp.min(dm, axis=-1)
        idx = jnp.argmin(dm, axis=-1).astype(jnp.int32)
        cols = jax.lax.broadcasted_iota(jnp.int32, dm.shape, dm.ndim - 1)
        second = jnp.min(jnp.where(cols == idx[:, None], inf, dm), axis=-1)
        ok = valid_rows & (best < inf * 0.5) & (best <= nndr * second)
        return Matches(idx=idx, dist=best, second=second, valid=ok)

    return reduce(d, valid_a, valid_b), reduce(d.T, valid_b, valid_a)


def match_mutual_nndr(desc_a, valid_a, desc_b, valid_b, nndr: float = 0.8) -> Matches:
    m_ab, m_ba = match_nndr_bidir(desc_a, valid_a, desc_b, valid_b, nndr)
    return m_ab._replace(valid=cross_check(m_ab, m_ba))


def knn_blocked(query, base, k: int, block: int = 8192,
                base_valid: Optional[jnp.ndarray] = None):
    """Exact k-NN of ±1 query (Q,D) against a large ±1 base (N,D), scanning
    the base in blocks to bound VMEM/HBM working set — this is the
    vocabulary-search primitive (replaces rtflann kd-tree).

    Returns (dists (Q,k) ascending, indices (Q,k)).
    """
    Q = query.shape[0]
    N = base.shape[0]
    nblocks = (N + block - 1) // block
    pad = nblocks * block - N
    basep = jnp.pad(base, ((0, pad), (0, 0)))
    validp = jnp.pad(
        base_valid if base_valid is not None else jnp.ones((N,), bool), (0, pad)
    )
    qm = query.astype(jnp.bfloat16)
    inf = jnp.float32(1e9)

    def body(carry, blk_idx):
        best_d, best_i = carry
        blk = jax.lax.dynamic_slice_in_dim(basep, blk_idx * block, block, axis=0)
        bv = jax.lax.dynamic_slice_in_dim(validp, blk_idx * block, block, axis=0)
        sim = jnp.dot(qm, blk.astype(jnp.bfloat16).T, preferred_element_type=jnp.float32)
        dist = jnp.where(bv[None, :], (DESC_DIM - sim) * 0.5, inf)
        nd, ni = jax.lax.top_k(-dist, k)
        cand_d = jnp.concatenate([best_d, -nd], axis=1)
        cand_i = jnp.concatenate([best_i, ni + blk_idx * block], axis=1)
        nd2, sel = jax.lax.top_k(-cand_d, k)
        return (
            -nd2,
            jnp.take_along_axis(cand_i, sel, axis=1),
        ), None

    init = (jnp.full((Q, k), inf), jnp.zeros((Q, k), jnp.int32))
    (d, i), _ = jax.lax.scan(body, init, jnp.arange(nblocks))
    return d, i.astype(jnp.int32)


# ------------------------------------------------------------------------ GMS


def gms_filter(uv_a, uv_b_matched, match_valid, shape_a, shape_b,
               grid: int = 8, threshold_factor: float = 6.0):
    """Grid-based Motion Statistics match verification (reference:
    RegistrationVis Vis/CorNNType=5..7 via the vendored gms_matcher,
    corelib/src/gms_matcher.h; GMS/ThresholdFactor=6). Idea: true matches
    concentrate in consistent cell pairs; a match survives when its 3x3
    cell-pair neighborhood holds more matches than alpha*sqrt(mean support).

    uv_a (K,2) keypoints in A, uv_b_matched (K,2) their matched positions
    in B, shapes (H, W). One scatter-add + one 3x3 box filter — no loops.
    """
    Ha, Wa = shape_a
    Hb, Wb = shape_b
    ca = (jnp.clip(uv_a[:, 1] * grid / Ha, 0, grid - 1).astype(jnp.int32) * grid
          + jnp.clip(uv_a[:, 0] * grid / Wa, 0, grid - 1).astype(jnp.int32))
    cb = (jnp.clip(uv_b_matched[:, 1] * grid / Hb, 0, grid - 1).astype(jnp.int32) * grid
          + jnp.clip(uv_b_matched[:, 0] * grid / Wb, 0, grid - 1).astype(jnp.int32))
    G = grid * grid
    pair = jnp.where(match_valid, ca * G + cb, G * G)
    counts = jnp.zeros((G * G + 1,)).at[pair].add(1.0, mode="drop")[:-1]
    counts = counts.reshape(G, G)                     # (A cell, B cell)
    counts4 = counts.reshape(grid, grid, grid, grid)  # (ay, ax, by, bx)
    # 3x3 neighborhood aggregation over BOTH grids (motion smoothness)
    k = jnp.ones((3, 3))

    def box2d(x):  # over the last two axes
        return jax.lax.conv_general_dilated(
            x.reshape(-1, 1, grid, grid), k.reshape(1, 1, 3, 3), (1, 1),
            "SAME", dimension_numbers=("NCHW", "OIHW", "NCHW"),
        ).reshape(x.shape)

    s = box2d(counts4)                              # aggregate over B cells
    s = jnp.moveaxis(box2d(jnp.moveaxis(s, (0, 1), (2, 3))), (0, 1), (2, 3))
    # per-region threshold (GMS paper): tau_i = alpha * sqrt(n_i), n_i =
    # mean matches per A-cell over the 3x3 neighborhood of the match's cell
    per_a = jnp.sum(counts, axis=1).reshape(1, grid, grid)
    region = jax.lax.conv_general_dilated(
        per_a[None], k.reshape(1, 1, 3, 3), (1, 1), "SAME",
        dimension_numbers=("NCHW", "OIHW", "NCHW"))[0, 0]
    ai = jnp.clip(ca, 0, G - 1)
    bi = jnp.clip(cb, 0, G - 1)
    n_i = region.reshape(G)[ai] / 9.0
    thr = threshold_factor * jnp.sqrt(jnp.maximum(n_i, 1e-6))
    support = s.reshape(G, G)[ai, bi]
    return match_valid & (support >= thr)
