"""Keypoint detection + binary description, batched and statically shaped.

Capability parity: the reference's ``Feature2D`` family
(/root/reference/corelib/src/Features2d.cpp — GFTT/FAST/ORB detection,
gridded top-K distribution, subpixel refinement, oriented-BRIEF
description, depth/stereo 3D keypoints). Rebuilt TPU-first: the whole
detect→orient→describe path is one jittable function over fixed-size
arrays; score maps come from fused convolutions, NMS is a max-pool, and
selection is a single top-k — no dynamic-length keypoint vectors anywhere.

Descriptors are 256-D sign vectors (±1, stored int8) so that descriptor
distance and vocabulary quantization are plain matmuls on the MXU:
``hamming = (D - a @ b.T) / 2``.
"""
from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from rtabmap_tpu.ops import image as im

DESC_DIM = 256
PATCH_R = 15  # half-patch for orientation + description


class Keypoints(NamedTuple):
    """Fixed-capacity keypoint set. Invalid slots have valid=False and
    uv=(0,0); every consumer masks on ``valid``."""

    uv: jnp.ndarray        # (K,2) float32 pixel coords (x=u, y=v)
    response: jnp.ndarray  # (K,) float32 detector score
    angle: jnp.ndarray     # (K,) float32 radians
    octave: jnp.ndarray    # (K,) int32 pyramid level
    valid: jnp.ndarray     # (K,) bool


# ----------------------------------------------------------------------- score


def shi_tomasi_response(gray, sigma: float = 1.5):
    """GFTT min-eigenvalue response map over (...,H,W)."""
    gx, gy = im.sobel(gray)
    gxx = im.gaussian_blur(gx * gx, sigma)
    gyy = im.gaussian_blur(gy * gy, sigma)
    gxy = im.gaussian_blur(gx * gy, sigma)
    tr = gxx + gyy
    det_term = jnp.sqrt(jnp.maximum((gxx - gyy) ** 2 + 4.0 * gxy * gxy, 0.0))
    return 0.5 * (tr - det_term)  # min eigenvalue


def harris_response(gray, sigma: float = 1.5, k: float = 0.04):
    """Harris corner response det(M) - k*tr(M)^2 (reference: cv::cornerHarris
    path of GFTT, Features2d.cpp kDetectorGfttHarris)."""
    gx, gy = im.sobel(gray)
    gxx = im.gaussian_blur(gx * gx, sigma)
    gyy = im.gaussian_blur(gy * gy, sigma)
    gxy = im.gaussian_blur(gx * gy, sigma)
    det = gxx * gyy - gxy * gxy
    tr = gxx + gyy
    return det - k * tr * tr


def dog_response(gray, sigma1: float = 1.0, sigma2: float = 1.6):
    """|difference-of-Gaussians| blob response — the SIFT/KAZE-family blob
    detector analogue (reference: Features2d.cpp kDetectorSift; scale search
    collapsed to the base octave, which matches how the engine runs SIFT for
    odometry at fixed image scale)."""
    g1 = im.gaussian_blur(gray, sigma1)
    g2 = im.gaussian_blur(gray, sigma2, radius=4)
    return jnp.abs(g1 - g2)


RESPONSE_FNS = {
    "gftt": shi_tomasi_response,
    "harris": harris_response,
    "dog": lambda g: dog_response(g),
    "fast": lambda g: fast_response(g),
}


def register_detector(name: str, response_fn):
    """Plug in a custom response-map detector (the analogue of the
    reference's PyDetector embedded-Python hook, PythonInterface.h:27 —
    here a plugin is just a jittable (H,W)->(H,W) score function)."""
    RESPONSE_FNS[name] = response_fn


def fast_response(gray, ring_r: int = 3):
    """FAST-like corner score: sum of absolute center-vs-ring differences
    exceeding a contrast margin, computed densely with shifts (vectorized)."""
    offs = [
        (0, -3), (1, -3), (2, -2), (3, -1), (3, 0), (3, 1), (2, 2), (1, 3),
        (0, 3), (-1, 3), (-2, 2), (-3, 1), (-3, 0), (-3, -1), (-2, -2), (-1, -3),
    ]
    H, W = gray.shape[-2:]
    pad = 3
    padded = jnp.pad(gray, [(0, 0)] * (gray.ndim - 2) + [(pad, pad), (pad, pad)])
    center = gray
    score = jnp.zeros_like(gray)
    t = 0.04
    for dx, dy in offs:
        shifted = jax.lax.dynamic_slice_in_dim(
            jax.lax.dynamic_slice_in_dim(padded, pad + dy, H, axis=-2), pad + dx, W, axis=-1
        )
        d = shifted - center
        score = score + jnp.maximum(jnp.abs(d) - t, 0.0)
    return score


# ------------------------------------------------------------------- selection


def _peaks_top_k(flat, k: int):
    """Top-k over candidate peak scores. On TPU, exact ``lax.top_k`` is a
    full sort (ms-scale for score maps); ``approx_max_k`` is the partitioned
    hardware path (~10x faster). NMS already spaces the peaks, so per-bin
    collisions are rare; on CPU the lowering is exact, keeping unit tests
    deterministic."""
    if jax.default_backend() == "tpu":
        return jax.lax.approx_max_k(flat, k, recall_target=0.95)
    return jax.lax.top_k(flat, k)


def select_top_k(score, k: int, nms_size: int = 7, quality_level: float = 0.01,
                 border: int = PATCH_R + 1):
    """NMS + global top-k on a (H,W) score map -> Keypoints(k)."""
    H, W = score.shape[-2:]
    local_max = im.max_pool_same(score, nms_size)
    is_peak = (score >= local_max) & (score > 0)
    # border suppression (descriptors need a full patch)
    vmask = jnp.zeros((H, W), dtype=bool).at[border:H - border, border:W - border].set(True)
    peak_score = jnp.where(is_peak & vmask, score, -jnp.inf)
    flat = peak_score.reshape((-1,))
    vals, idx = _peaks_top_k(flat, k)
    vy = (idx // W).astype(jnp.float32)
    vx = (idx % W).astype(jnp.float32)
    max_v = jnp.maximum(jnp.max(vals), 1e-12)
    valid = (vals > quality_level * max_v) & jnp.isfinite(vals)
    uv = jnp.stack([vx, vy], axis=-1)
    return Keypoints(
        uv=uv,
        response=jnp.where(valid, vals, 0.0),
        angle=jnp.zeros((k,), jnp.float32),
        octave=jnp.zeros((k,), jnp.int32),
        valid=valid,
    )


def select_top_k_grid(score, k: int, grid: Tuple[int, int] = (4, 4),
                      nms_size: int = 7, quality_level: float = 0.01,
                      border: int = PATCH_R + 1):
    """Spatially-distributed selection: top-(k/cells) per grid cell
    (reference: Kp/GridRows x Kp/GridCols in Features2d.cpp)."""
    H, W = score.shape[-2:]
    gr, gc = grid
    per_cell = max(k // (gr * gc), 1)
    local_max = im.max_pool_same(score, nms_size)
    vmask = jnp.zeros((H, W), dtype=bool).at[border:H - border, border:W - border].set(True)
    peak = jnp.where((score >= local_max) & (score > 0) & vmask, score, -jnp.inf)
    ch, cw = H // gr, W // gc
    cells = peak[: gr * ch, : gc * cw].reshape(gr, ch, gc, cw).transpose(0, 2, 1, 3).reshape(gr * gc, ch * cw)
    vals, idx = _peaks_top_k(cells, per_cell)  # (cells, per_cell)
    cy = idx // cw
    cx = idx % cw
    cell_ids = jnp.arange(gr * gc)
    oy = (cell_ids // gc * ch)[:, None]
    ox = (cell_ids % gc * cw)[:, None]
    uv = jnp.stack([(cx + ox).astype(jnp.float32), (cy + oy).astype(jnp.float32)], axis=-1)
    uv = uv.reshape(-1, 2)
    vals = vals.reshape(-1)
    max_v = jnp.maximum(jnp.max(vals), 1e-12)
    valid = (vals > quality_level * max_v) & jnp.isfinite(vals)
    pad = k - uv.shape[0]
    if pad > 0:
        uv = jnp.pad(uv, ((0, pad), (0, 0)))
        vals = jnp.pad(vals, (0, pad))
        valid = jnp.pad(valid, (0, pad))
    else:
        # keep overall best k
        order = jax.lax.top_k(jnp.where(valid, vals, -jnp.inf), k)[1]
        uv, vals, valid = uv[order], vals[order], valid[order]
    return Keypoints(uv=uv, response=jnp.where(valid, vals, 0.0),
                     angle=jnp.zeros((k,), jnp.float32),
                     octave=jnp.zeros((k,), jnp.int32), valid=valid)


def refine_subpixel(score, kps: Keypoints):
    """Quadratic 3x3 subpixel refinement of keypoint locations on the score
    map (reference: Kp/SubPixWinSize cornerSubPix in Features2d.cpp).
    Removes the integer-pixel quantization that biases wide-baseline
    registration. Offsets are clamped to ±0.6 px. The 3x3 neighborhood is
    pulled with one-hot matmuls (f32, MXU) instead of 9 point gathers."""
    H, W = score.shape[-2:]
    u = kps.uv[:, 0].astype(jnp.int32)
    v = kps.uv[:, 1].astype(jnp.int32)

    rr = jnp.arange(-1, 2, dtype=jnp.int32)
    rows = jnp.clip(v[:, None] + rr[None, :], 0, H - 1).reshape(-1)
    Rh = (rows[:, None] == jnp.arange(H)[None, :]).astype(score.dtype)
    band = (Rh @ score).reshape(-1, 3, W)
    cols = jnp.clip(u[:, None] + rr[None, :], 0, W - 1)
    Cw = (cols[:, :, None] == jnp.arange(W)[None, None, :]).astype(score.dtype)
    nb = jnp.einsum("krw,kcw->krc", band, Cw)  # (K,3,3) indexed [dv+1,du+1]

    c = nb[:, 1, 1]
    dx = 0.5 * (nb[:, 1, 2] - nb[:, 1, 0])
    dy = 0.5 * (nb[:, 2, 1] - nb[:, 0, 1])
    dxx = nb[:, 1, 2] + nb[:, 1, 0] - 2 * c
    dyy = nb[:, 2, 1] + nb[:, 0, 1] - 2 * c
    off_u = jnp.where(jnp.abs(dxx) > 1e-12, -dx / dxx, 0.0)
    off_v = jnp.where(jnp.abs(dyy) > 1e-12, -dy / dyy, 0.0)
    off = jnp.stack([jnp.clip(off_u, -0.6, 0.6), jnp.clip(off_v, -0.6, 0.6)], axis=-1)
    return kps._replace(uv=jnp.where(kps.valid[:, None], kps.uv + off, kps.uv))


# ----------------------------------------------------------------- orientation


def _disc_offsets(radius: int):
    ys, xs = np.meshgrid(np.arange(-radius, radius + 1), np.arange(-radius, radius + 1), indexing="ij")
    mask = (xs ** 2 + ys ** 2) <= radius ** 2
    return xs[mask].astype(np.float32), ys[mask].astype(np.float32)


_OX, _OY = _disc_offsets(PATCH_R)


def compute_orientation(gray, kps: Keypoints, method: str = "gradient"):
    """Per-keypoint reference orientation for rotation invariance.

    ``gradient`` (default, TPU-fast): direction of the heavily-smoothed
    image gradient at the keypoint — 2 samples/kp instead of the ~700 the
    intensity-centroid needs, with equivalent repeatability on the blurred
    field. ``centroid``: the reference's ORB intensity-centroid
    (Features2d.cpp ORB path / opencv/ORBextractor.cc).
    """
    if method == "gradient":
        gx, gy = im.sobel(im.gaussian_blur(gray, sigma=4.0, radius=6))
        vx = im.bilinear_sample_mm(gx, kps.uv)
        vy = im.bilinear_sample_mm(gy, kps.uv)
        angle = jnp.arctan2(vy, vx)
        return kps._replace(angle=jnp.where(kps.valid, angle, 0.0))
    ox = jnp.asarray(_OX)
    oy = jnp.asarray(_OY)
    uv = kps.uv[:, None, :] + jnp.stack([jnp.broadcast_to(ox, (kps.uv.shape[0], ox.shape[0])),
                                         jnp.broadcast_to(oy, (kps.uv.shape[0], oy.shape[0]))], axis=-1)
    vals = im.bilinear_sample(gray, uv.reshape(-1, 2)).reshape(kps.uv.shape[0], -1)
    m10 = jnp.sum(vals * ox, axis=-1)
    m01 = jnp.sum(vals * oy, axis=-1)
    angle = jnp.arctan2(m01, m10)
    return kps._replace(angle=jnp.where(kps.valid, angle, 0.0))


# ----------------------------------------------------------------- description


def _brief_pattern(dim: int = DESC_DIM, radius: int = PATCH_R - 2, seed: int = 7):
    """Deterministic Gaussian BRIEF test pattern (our own; internally
    consistent — descriptors only ever match against descriptors produced by
    this same pattern)."""
    rng = np.random.RandomState(seed)
    sigma = radius / 2.5
    pts = np.clip(rng.randn(dim, 4) * sigma, -radius, radius).astype(np.float32)
    return pts  # (dim, [x1,y1,x2,y2])


_PATTERN = _brief_pattern()


_PATCH = 32          # descriptor patch side; center at (16,16)
_N_ANGLE_BINS = 30   # ORB quantizes rotation to 2*pi/30 (opencv ORB.cpp)


def _binned_test_matrices(n_bins: int = _N_ANGLE_BINS) -> np.ndarray:
    """Per-orientation-bin BRIEF difference matrices D (n_bins, 1024, 256):
    descriptor = sign(patch.flat @ D[bin]). Column t of D[b] holds +1 at the
    flattened patch index of rotated test point 1 and -1 at point 2 —
    turning the per-keypoint sample gathers into one MXU matmul."""
    out = np.zeros((n_bins, _PATCH * _PATCH, DESC_DIM), np.float32)
    c = _PATCH // 2
    for b in range(n_bins):
        ang = 2.0 * np.pi * b / n_bins
        ca, sa = np.cos(ang), np.sin(ang)
        for t in range(DESC_DIM):
            x1, y1, x2, y2 = _PATTERN[t]
            for sign, (x, y) in ((1.0, (x1, y1)), (-1.0, (x2, y2))):
                rx = int(np.round(ca * x - sa * y)) + c
                ry = int(np.round(sa * x + ca * y)) + c
                rx = min(max(rx, 0), _PATCH - 1)
                ry = min(max(ry, 0), _PATCH - 1)
                out[b, ry * _PATCH + rx, t] += sign
    return out


_TEST_MATS = _binned_test_matrices()


def extract_patches(img, uv, patch: int = _PATCH):
    """(K,patch,patch) patches centered at round(uv), as two one-hot MATMULS:
    band = R @ img selects each keypoint's `patch` rows ((K*patch,H)@(H,W) on
    the MXU), then a batched (patch,W)@(W,patch) column mix. Per-keypoint
    dynamic-slices serialize into ~2us-each small ops on TPU (24ms for
    32x384 patches); this form is pure MXU + bandwidth (~1ms). Values pass
    through bf16 — same precision the descriptor matmul already uses."""
    H, W = img.shape[-2:]
    c = patch // 2
    u0 = (jnp.round(uv[:, 0]).astype(jnp.int32) - c).clip(0, W - patch)
    v0 = (jnp.round(uv[:, 1]).astype(jnp.int32) - c).clip(0, H - patch)
    K = uv.shape[0]
    rr = jnp.arange(patch, dtype=jnp.int32)
    rows = (v0[:, None] + rr[None, :]).reshape(-1)            # (K*patch,)
    Rh = (rows[:, None] == jnp.arange(H)[None, :]).astype(jnp.bfloat16)
    # bf16 accumulation is exact here: each Rh row has a single 1.0, so the
    # "sum" is a pure selection of bf16(img) values — and it halves the
    # band's HBM traffic (the dominant cost of this op).
    band = jnp.dot(Rh, img.astype(jnp.bfloat16),
                   preferred_element_type=jnp.bfloat16).reshape(K, patch, W)
    cols = u0[:, None] + rr[None, :]                          # (K,patch)
    Cw = (cols[:, :, None] == jnp.arange(W)[None, None, :]).astype(jnp.bfloat16)
    return jnp.einsum("krw,kcw->krc", band, Cw,
                      preferred_element_type=jnp.float32)


def describe(gray_blur, kps: Keypoints):
    """Rotated-BRIEF sign descriptors: (K, 256) int8 in {-1,+1}.

    gray_blur should be a Gaussian-smoothed image (reduces test noise).
    TPU formulation: extract one 32x32 patch per keypoint (contiguous
    dynamic-slice), quantize orientation to 30 bins (the reference ORB's
    2*pi/30 lookup, opencv/ORBextractor.cc), and evaluate all 256 tests
    of a bin as a single (K,1024)@(1024,256) matmul with a +1/-1
    difference matrix — the per-bin results are mask-accumulated."""
    K = kps.uv.shape[0]
    patches = extract_patches(gray_blur, kps.uv).reshape(K, _PATCH * _PATCH)
    nb = _N_ANGLE_BINS
    two_pi = 2.0 * np.pi
    bins = jnp.round(jnp.mod(kps.angle, two_pi) / two_pi * nb).astype(jnp.int32) % nb
    D = jnp.asarray(_TEST_MATS, jnp.bfloat16)
    patches16 = patches.astype(jnp.bfloat16)
    diff = jnp.zeros((K, DESC_DIM), jnp.float32)
    for b in range(nb):
        vb = (patches16 @ D[b]).astype(jnp.float32)
        diff = diff + jnp.where((bins == b)[:, None], vb, 0.0)
    bits = jnp.where(diff > 0, 1, -1).astype(jnp.int8)
    return jnp.where(kps.valid[:, None], bits, 0).astype(jnp.int8)


# ------------------------------------------------------------------- 3D lookup


def keypoints_3d_from_depth(kps: Keypoints, depth, cam, min_depth=0.1, max_depth=20.0):
    """Depth-image lookup -> camera-frame 3D points (K,3) + validity.

    (reference: Feature2D::generateKeypoints3D depth path.)
    """
    from rtabmap_tpu.geometry import camera as C

    # one-hot-matmul sampling: point gathers at keypoint locations lower to
    # ~us-per-element scalar loads on TPU (see ops/linalg.py notes)
    z = im.bilinear_sample_mm(depth, kps.uv, pad_value=0.0)
    ok = kps.valid & (z > min_depth) & (z < max_depth)
    pts = C.backproject(kps.uv, z, cam)
    return jnp.where(ok[:, None], pts, 0.0), ok


# --------------------------------------------------------------------- facade


def detect_and_describe(gray, max_kp: int, use_grid: bool = True,
                        grid: Tuple[int, int] = (4, 4), quality_level: float = 0.01,
                        nms_size: int = 7, subpixel: bool = True,
                        detector: str = "gftt", descriptor: str = "brief"):
    """Full single-image pipeline: score map -> NMS top-k -> orientation ->
    descriptor. Returns (Keypoints, desc): (K,256) ±1 int8 for
    ``descriptor="brief"``, (K,128) float32 for ``descriptor="sift"``
    (match with metric="l2").

    ``detector`` selects the response map (gftt | harris | dog | fast) —
    the TPU re-expression of the reference's Kp/DetectorStrategy factory
    (Features2d.cpp Feature2D::create); the learned path (SuperPoint) lives
    in rtabmap_tpu.models.superpoint.
    """
    score = RESPONSE_FNS[detector](gray)
    if use_grid:
        kps = select_top_k_grid(score, max_kp, grid, nms_size, quality_level)
    else:
        kps = select_top_k(score, max_kp, nms_size, quality_level)
    # Orientation + description are sampled at the INTEGER peak — sampling
    # the test pattern at fractional offsets flips sign bits and ruins
    # descriptor repeatability. The subpixel-refined uv is applied after,
    # for geometry only (observations + 3D backprojection), where it
    # removes the quantization bias in wide-baseline registration.
    kps = compute_orientation(gray, kps)
    blur = im.gaussian_blur(gray, sigma=2.0, radius=4)
    desc = (describe(blur, kps) if descriptor == "brief"
            else describe_sift(blur, kps))
    if subpixel:
        kps = refine_subpixel(score, kps)
    return kps, desc


# --------------------------------------------- SIFT-family float descriptor


_SIFT_CELLS = 4       # 4x4 spatial grid
_SIFT_ORI = 8         # orientation bins
SIFT_DIM = _SIFT_CELLS * _SIFT_CELLS * _SIFT_ORI   # 128


def _sift_spatial_weights(n_bins: int = _N_ANGLE_BINS) -> np.ndarray:
    """Per-orientation-bin spatial pooling matrices (n_bins, patch^2, 16):
    rotated, Gaussian-weighted bilinear assignment of each patch pixel to
    the 4x4 descriptor grid. The float-descriptor analogue of
    `_binned_test_matrices` — per-keypoint pooling becomes one matmul."""
    out = np.zeros((n_bins, _PATCH * _PATCH, _SIFT_CELLS * _SIFT_CELLS),
                   np.float32)
    c = (_PATCH - 1) / 2.0
    half = _PATCH / 2.0
    sigma = 0.5 * _PATCH
    for b in range(n_bins):
        ang = 2.0 * np.pi * b / n_bins
        ca, sa = np.cos(ang), np.sin(ang)
        for py in range(_PATCH):
            for px in range(_PATCH):
                x, y = px - c, py - c
                # rotate into the keypoint frame
                rx = ca * x + sa * y
                ry = -sa * x + ca * y
                g = np.exp(-(rx * rx + ry * ry) / (2 * sigma * sigma))
                # continuous cell coords in [0,4)
                cx = (rx + half) / _PATCH * _SIFT_CELLS - 0.5
                cy = (ry + half) / _PATCH * _SIFT_CELLS - 0.5
                x0, y0 = int(np.floor(cx)), int(np.floor(cy))
                fx, fy = cx - x0, cy - y0
                for dy, wy in ((0, 1 - fy), (1, fy)):
                    for dx, wx in ((0, 1 - fx), (1, fx)):
                        gx, gy = x0 + dx, y0 + dy
                        if 0 <= gx < _SIFT_CELLS and 0 <= gy < _SIFT_CELLS:
                            out[b, py * _PATCH + px,
                                gy * _SIFT_CELLS + gx] += g * wy * wx
    return out


_SIFT_SPATIAL = _sift_spatial_weights()


def describe_sift(gray_blur, kps: Keypoints):
    """SIFT-family gradient-histogram descriptor: (K, 128) float32,
    L2-normalized with the standard 0.2 clip + renormalize.

    Capability parity: the reference's float-descriptor detectors (SIFT/
    SURF/DAISY/KAZE slots of Feature2D, Features2d.cpp) — one native
    gradient-histogram descriptor covers the float family; learned floats
    come from models/superpoint.py. TPU formulation: per-keypoint patch
    gradients (batched shifts), soft orientation binning relative to the
    keypoint angle (VPU), and rotated spatial pooling as a single
    (K, patch^2) x (patch^2, 16) matmul selected by orientation bin."""
    K = kps.uv.shape[0]
    patches = extract_patches(gray_blur, kps.uv)            # (K,P,P)
    gx = jnp.pad(patches[:, :, 2:] - patches[:, :, :-2],
                 ((0, 0), (0, 0), (1, 1)))
    gy = jnp.pad(patches[:, 2:, :] - patches[:, :-2, :],
                 ((0, 0), (1, 1), (0, 0)))
    mag = jnp.sqrt(gx * gx + gy * gy + 1e-12)
    theta = jnp.arctan2(gy, gx) - kps.angle[:, None, None]  # kp frame
    # soft assignment to _SIFT_ORI orientation bins
    t = jnp.mod(theta, 2.0 * np.pi) / (2.0 * np.pi) * _SIFT_ORI
    b0 = jnp.floor(t)
    f = t - b0
    b0 = b0.astype(jnp.int32) % _SIFT_ORI
    b1 = (b0 + 1) % _SIFT_ORI
    P2 = _PATCH * _PATCH
    # (K, P2, ORI) orientation weights, built with one-hot compare-reduce
    obins = jnp.arange(_SIFT_ORI)
    w_ori = ((b0.reshape(K, P2, 1) == obins) * ((1.0 - f).reshape(K, P2, 1))
             + (b1.reshape(K, P2, 1) == obins) * f.reshape(K, P2, 1))
    w_ori = w_ori * mag.reshape(K, P2, 1)
    # spatial pooling matrix by keypoint orientation bin
    nb = _N_ANGLE_BINS
    two_pi = 2.0 * np.pi
    bins = jnp.round(jnp.mod(kps.angle, two_pi) / two_pi * nb).astype(jnp.int32) % nb
    S = jnp.asarray(_SIFT_SPATIAL)                          # (nb,P2,16)
    Wsp = S[bins]                                           # (K,P2,16)
    desc = jnp.einsum("kpc,kpo->kco", Wsp, w_ori)           # (K,16,8)
    desc = desc.reshape(K, SIFT_DIM)
    desc = desc / jnp.maximum(jnp.linalg.norm(desc, axis=-1, keepdims=True), 1e-9)
    desc = jnp.minimum(desc, 0.2)
    desc = desc / jnp.maximum(jnp.linalg.norm(desc, axis=-1, keepdims=True), 1e-9)
    return jnp.where(kps.valid[:, None], desc, 0.0)
