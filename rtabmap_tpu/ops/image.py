"""Batched 2D image ops (grayscale, gradients, pyramids, interpolation).

Capability parity: the reference's ``util2d`` toolbox
(/root/reference/corelib/include/rtabmap/core/util2d.h — decimation,
depth/disparity conversion, bilinear sampling, smoothing) rebuilt as
statically-shaped JAX ops that fuse into the feature/odometry kernels.

Convention: images are float32 ``(..., H, W)`` in [0,1] unless noted.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def rgb_to_gray(img):
    """(...,H,W,3) uint8/float -> (...,H,W) float32 in [0,1]."""
    img = jnp.asarray(img)
    if img.dtype == jnp.uint8:
        img = img.astype(jnp.float32) / 255.0
    return (
        0.299 * img[..., 0] + 0.587 * img[..., 1] + 0.114 * img[..., 2]
    ).astype(jnp.float32)


_BAND_CACHE = {}


def _band(k: np.ndarray, n: int) -> np.ndarray:
    """(n,n) banded 'same'-zero-padding convolution matrix for 1-D kernel k:
    out[i] = sum_j k[j] * x[i + j - r]."""
    key = (k.tobytes(), n)
    hit = _BAND_CACHE.get(key)
    if hit is not None:
        return hit
    r = len(k) // 2
    B = np.zeros((n, n), np.float32)
    for j, kv in enumerate(k):
        d = j - r
        idx = np.arange(max(0, -d), min(n, n - d))
        B[idx, idx + d] = kv
    _BAND_CACHE[key] = B
    return B


def _sep_conv(img, kx, ky):
    """Separable 2D convolution with 'same' zero padding on (...,H,W).

    TPU formulation: C=1 `conv_general_dilated` starves the MXU (~1ms per
    pass at 32x240x320); a banded-matrix matmul per axis is exact, tiny
    (H*W*(H+W) MACs), and rides the MXU. Kernels must be host constants."""
    H, W = img.shape[-2:]
    Bx = _band(np.asarray(kx, np.float32), W)
    By = _band(np.asarray(ky, np.float32), H)
    x = jnp.matmul(img, Bx.T)
    return jnp.swapaxes(jnp.matmul(jnp.swapaxes(x, -1, -2), By.T), -1, -2)


def gaussian_blur(img, sigma: float = 1.0, radius: int = 2):
    xs = np.arange(-radius, radius + 1, dtype=np.float32)
    k = np.exp(-0.5 * (xs / sigma) ** 2)
    k = k / np.sum(k)
    return _sep_conv(img, k, k)


def sobel(img):
    """Returns (gx, gy) Scharr-free 3x3 Sobel gradients."""
    gx = _sep_conv(img, np.array([-0.5, 0.0, 0.5]), np.array([0.25, 0.5, 0.25]))
    gy = _sep_conv(img, np.array([0.25, 0.5, 0.25]), np.array([-0.5, 0.0, 0.5]))
    return gx, gy


def decimate(img, d: int):
    """Stride-subsample by integer factor on the trailing H,W dims
    (reference: util2d::decimate)."""
    if d <= 1:
        return img
    return img[..., ::d, ::d]


def downsample2(img):
    """2x blur+decimate for pyramids."""
    return decimate(gaussian_blur(img, sigma=1.0, radius=2), 2)


def pyramid(img, levels: int):
    out = [img]
    for _ in range(levels - 1):
        out.append(downsample2(out[-1]))
    return out


def bilinear_sample(img, uv, pad_value: float = 0.0):
    """Sample (...,H,W) at continuous pixel coords uv (...,N,2) -> (...,N).

    Out-of-bounds samples return pad_value.
    """
    H, W = img.shape[-2:]
    u, v = uv[..., 0], uv[..., 1]
    u0 = jnp.floor(u)
    v0 = jnp.floor(v)
    du = u - u0
    dv = v - v0
    u0i = u0.astype(jnp.int32)
    v0i = v0.astype(jnp.int32)

    def tap(vi, ui):
        vc = jnp.clip(vi, 0, H - 1)
        uc = jnp.clip(ui, 0, W - 1)
        val = jnp.take_along_axis(
            img.reshape((*img.shape[:-2], H * W)),
            (vc * W + uc).reshape((*vc.shape[:-1], -1)),
            axis=-1,
        ).reshape(vc.shape)
        ok = (vi >= 0) & (vi < H) & (ui >= 0) & (ui < W)
        return jnp.where(ok, val, pad_value)

    s = (
        tap(v0i, u0i) * (1 - du) * (1 - dv)
        + tap(v0i, u0i + 1) * du * (1 - dv)
        + tap(v0i + 1, u0i) * (1 - du) * dv
        + tap(v0i + 1, u0i + 1) * du * dv
    )
    return s


def nearest_sample(img, uv, pad_value: float = 0.0):
    """Nearest-neighbour sample (...,H,W) at uv (...,N,2) — 1 gather per
    point vs bilinear's 4; pair with a blurred source."""
    H, W = img.shape[-2:]
    ui = jnp.round(uv[..., 0]).astype(jnp.int32)
    vi = jnp.round(uv[..., 1]).astype(jnp.int32)
    ok = (ui >= 0) & (ui < W) & (vi >= 0) & (vi < H)
    uc = jnp.clip(ui, 0, W - 1)
    vc = jnp.clip(vi, 0, H - 1)
    val = jnp.take_along_axis(
        img.reshape((*img.shape[:-2], H * W)),
        (vc * W + uc).reshape((*vc.shape[:-1], -1)),
        axis=-1,
    ).reshape(vc.shape)
    return jnp.where(ok, val, pad_value)


def window_sample(img, uv, win: int):
    """Per-point (win,win) windows via contiguous dynamic-slices — the
    TPU-fast alternative to point gathers (XLA lowers a point gather to
    ~us-per-element scalar loads; a block slice is a vector copy).

    img (H,W); uv (N,2) continuous coords. Returns (vals (N,win,win),
    origin (N,2) int32 top-left of each window, clamped in-bounds)."""
    H, W = img.shape
    c = (win - 1) // 2
    u0 = (jnp.floor(uv[:, 0]).astype(jnp.int32) - c).clip(0, W - win)
    v0 = (jnp.floor(uv[:, 1]).astype(jnp.int32) - c).clip(0, H - win)

    def one(v, u):
        return jax.lax.dynamic_slice(img, (v, u), (win, win))

    return jax.vmap(one)(v0, u0), jnp.stack([u0, v0], -1)


def bilinear_sample_ds(img, uv, pad_value: float = 0.0):
    """Bilinear sample of (H,W) at (N,2) built on 2x2 dynamic-slice windows
    instead of 4 point gathers (see ``window_sample``). Out-of-bounds
    points return ``pad_value``."""
    H, W = img.shape
    w4, origin = window_sample(img, uv, 2)
    du = (uv[:, 0] - origin[:, 0]).clip(0.0, 1.0)
    dv = (uv[:, 1] - origin[:, 1]).clip(0.0, 1.0)
    s = (w4[:, 0, 0] * (1 - du) * (1 - dv) + w4[:, 0, 1] * du * (1 - dv)
         + w4[:, 1, 0] * (1 - du) * dv + w4[:, 1, 1] * du * dv)
    ok = ((uv[:, 0] >= 0) & (uv[:, 0] <= W - 1)
          & (uv[:, 1] >= 0) & (uv[:, 1] <= H - 1))
    return jnp.where(ok, s, pad_value)


def bilinear_sample_mm(img, uv, pad_value: float = 0.0):
    """Bilinear sample of (H,W) at (N,2) as two one-hot MATMULS instead of
    point gathers: z = (Wv @ img) . Wu with Wv (N,H) / Wu (N,W) carrying the
    two bilinear taps per axis. Point gathers lower to ~us-per-element
    scalar loads on TPU; this form rides the MXU (N*H*W MACs — trivial for
    keypoint counts) and fuses cleanly into larger jits."""
    H, W = img.shape
    u = jnp.clip(uv[:, 0], 0.0, W - 1.0)
    v = jnp.clip(uv[:, 1], 0.0, H - 1.0)
    u0 = jnp.floor(u)
    v0 = jnp.floor(v)
    du = (u - u0)[:, None]
    dv = (v - v0)[:, None]
    rows = jnp.arange(H, dtype=jnp.float32)[None, :]
    cols = jnp.arange(W, dtype=jnp.float32)[None, :]
    wv = (rows == v0[:, None]) * (1.0 - dv) + (rows == v0[:, None] + 1.0) * dv
    wu = (cols == u0[:, None]) * (1.0 - du) + (cols == u0[:, None] + 1.0) * du
    z = jnp.sum((wv @ img) * wu, axis=-1)
    ok = ((uv[:, 0] >= 0) & (uv[:, 0] <= W - 1)
          & (uv[:, 1] >= 0) & (uv[:, 1] <= H - 1))
    return jnp.where(ok, z, pad_value)


def max_pool_same(img, size: int):
    """Max filter with 'same' padding on (...,H,W) — used for NMS."""
    batch = img.shape[:-2]
    H, W = img.shape[-2:]
    x = img.reshape((-1, H, W, 1))
    p = size // 2
    out = jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, size, size, 1), (1, 1, 1, 1),
        [(0, 0), (p, p), (p, p), (0, 0)],
    )
    return out.reshape((*batch, H, W))


def histogram_equalize(img, bins: int = 64):
    """Approximate CLAHE-free global equalization on (...,H,W) in [0,1]."""
    flat = img.reshape((*img.shape[:-2], -1))
    edges = jnp.linspace(0.0, 1.0, bins + 1)
    idx = jnp.clip((flat * bins).astype(jnp.int32), 0, bins - 1)
    one = jnp.ones_like(flat)
    hist = jax.vmap(lambda i, o: jnp.zeros((bins,)).at[i].add(o)) (
        idx.reshape((-1, flat.shape[-1])), one.reshape((-1, flat.shape[-1]))
    )
    cdf = jnp.cumsum(hist, axis=-1)
    cdf = cdf / jnp.maximum(cdf[..., -1:], 1.0)
    eq = jnp.take_along_axis(cdf, idx.reshape((-1, flat.shape[-1])), axis=-1)
    return eq.reshape(img.shape)


# ---------------------------------------------------------------- util2d extras


def _shifts(img, radius: int):
    """All (dy,dx) shifted copies within a square window, zero-padded.
    Returns (n_off, ...,H,W) stacked array + list of (dy,dx)."""
    H, W = img.shape[-2:]
    p = radius
    padded = jnp.pad(img, [(0, 0)] * (img.ndim - 2) + [(p, p), (p, p)])
    outs, offs = [], []
    for dy in range(-radius, radius + 1):
        for dx in range(-radius, radius + 1):
            outs.append(jax.lax.dynamic_slice_in_dim(
                jax.lax.dynamic_slice_in_dim(padded, p + dy, H, axis=-2),
                p + dx, W, axis=-1))
            offs.append((dy, dx))
    return jnp.stack(outs), offs


def bilateral_filter(depth, radius: int = 3, sigma_s: float = 2.0,
                     sigma_r: float = 0.05):
    """Edge-preserving depth smoothing (reference: util2d
    fastBilateralFiltering, util2d.cpp). Zeros (invalid) are excluded from
    the weighted mean and stay zero."""
    shifted, offs = _shifts(depth, radius)
    sw = jnp.asarray([np.exp(-(dy * dy + dx * dx) / (2 * sigma_s ** 2))
                      for dy, dx in offs], jnp.float32)
    valid = (shifted > 0) & (depth[None] > 0)
    rw = jnp.exp(-((shifted - depth[None]) ** 2) / (2 * sigma_r ** 2))
    w = jnp.where(valid, sw.reshape((-1,) + (1,) * depth.ndim) * rw, 0.0)
    num = jnp.sum(w * shifted, axis=0)
    den = jnp.sum(w, axis=0)
    return jnp.where((depth > 0) & (den > 1e-12), num / jnp.maximum(den, 1e-12),
                     depth)


def fill_depth_holes(depth, iterations: int = 2, radius: int = 1,
                     max_spread: float = 0.1):
    """Fill invalid (zero) depth pixels from valid neighbors when the
    neighborhood is depth-consistent (reference: util2d::fillDepthHoles —
    hole filling bounded by ``maximum filling distance`` / error ratio)."""
    for _ in range(iterations):
        shifted, _ = _shifts(depth, radius)
        valid = shifted > 0
        cnt = jnp.sum(valid, axis=0)
        mean = jnp.sum(jnp.where(valid, shifted, 0.0), axis=0) / jnp.maximum(cnt, 1)
        sq = jnp.sum(jnp.where(valid, (shifted - mean[None]) ** 2, 0.0), axis=0)
        std = jnp.sqrt(sq / jnp.maximum(cnt, 1))
        fill = (depth <= 0) & (cnt >= 3) & (std < max_spread * jnp.maximum(mean, 1e-6))
        depth = jnp.where(fill, mean, depth)
    return depth


def register_depth(depth, depth_cam, rgb_cam, T_rgb_depth, out_shape=None):
    """Reproject a depth image into the RGB camera (reference:
    util2d::registerDepth, util2d.h:123-129): backproject every depth pixel,
    transform into the RGB frame, z-buffer scatter-min onto the RGB grid."""
    from rtabmap_tpu.geometry import camera as C
    from rtabmap_tpu.geometry import transform as T

    H, W = depth.shape[-2:]
    Ho, Wo = out_shape if out_shape is not None else (H, W)
    vv, uu = jnp.meshgrid(jnp.arange(H, dtype=jnp.float32),
                          jnp.arange(W, dtype=jnp.float32), indexing="ij")
    uv = jnp.stack([uu.reshape(-1), vv.reshape(-1)], axis=-1)
    z = depth.reshape(-1)
    pts = C.backproject(uv, z, depth_cam)
    pts_rgb = T.apply(jnp.asarray(T_rgb_depth)[None], pts[None])[0]
    uv_rgb, z_rgb = C.project(pts_rgb, rgb_cam)
    ui = jnp.round(uv_rgb[:, 0]).astype(jnp.int32)
    vi = jnp.round(uv_rgb[:, 1]).astype(jnp.int32)
    ok = (z > 0) & (z_rgb > 0) & (ui >= 0) & (ui < Wo) & (vi >= 0) & (vi < Ho)
    lin = jnp.where(ok, vi * Wo + ui, Ho * Wo)
    out = jnp.full((Ho * Wo + 1,), jnp.inf)
    out = out.at[lin].min(jnp.where(ok, z_rgb, jnp.inf))
    out = out[:-1].reshape(Ho, Wo)
    return jnp.where(jnp.isfinite(out), out, 0.0)


def exposure_fusion(images):
    """Mertens-style single-scale exposure fusion of (N,H,W) gray stack
    (reference: util2d::exposureFusion wrapping cv::createMergeMertens).
    Weights = contrast (|laplacian|) x well-exposedness."""
    imgs = jnp.asarray(images)
    lap = jnp.abs(4 * imgs
                  - jnp.roll(imgs, 1, -1) - jnp.roll(imgs, -1, -1)
                  - jnp.roll(imgs, 1, -2) - jnp.roll(imgs, -1, -2))
    wexp = jnp.exp(-((imgs - 0.5) ** 2) / (2 * 0.2 ** 2))
    w = lap * wexp + 1e-12
    w = w / jnp.sum(w, axis=0, keepdims=True)
    return jnp.sum(w * imgs, axis=0)


def brightness_contrast_auto(img, clip_percent: float = 1.0):
    """Percentile-stretch auto brightness/contrast (reference:
    util2d::brightnessAndContrastAuto)."""
    lo = jnp.percentile(img, clip_percent)
    hi = jnp.percentile(img, 100.0 - clip_percent)
    return jnp.clip((img - lo) / jnp.maximum(hi - lo, 1e-6), 0.0, 1.0)
