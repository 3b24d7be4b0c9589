"""Stereo correspondence: sparse pyramidal LK along epipolar lines + dense
block matching.

Capability parity: the reference's stereo stack —
``StereoOpticalFlow``/``calcOpticalFlowPyrLKStereo``
(/root/reference/corelib/include/rtabmap/core/util2d.h:63,
corelib/src/Stereo.cpp) for sparse keypoint disparity, and the dense
``StereoBM`` wrapper (corelib/src/stereo/). TPU-first: the sparse matcher
runs all keypoints x all pyramid levels as batched gathers + fixed LK
iterations (no per-feature loops); dense BM is a batched shift-and-SAD
reduction that XLA fuses.
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from rtabmap_tpu.ops import image as im


def _patch_sample(img, uv, offs):
    """Sample (K,P) patch values at uv (K,2) + offs (P,2)."""
    pts = uv[:, None, :] + offs[None]
    return im.bilinear_sample(img, pts.reshape(-1, 2)).reshape(uv.shape[0], -1)


def _lk_offsets(r: int):
    ys, xs = jnp.meshgrid(jnp.arange(-r, r + 1.0), jnp.arange(-r, r + 1.0), indexing="ij")
    return jnp.stack([xs.reshape(-1), ys.reshape(-1)], axis=-1)


def lk_stereo_disparity(left, right, uv, valid, max_disparity: float = 128.0,
                        levels: int = 3, iters: int = 8, win: int = 3,
                        max_err: float = 0.08) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """1-D Lucas-Kanade along the epipolar line for rectified pairs.

    uv (K,2) keypoints in the LEFT image -> (disparity (K,), ok (K,)).
    Coarse-to-fine over a pyramid; all K tracked in parallel.
    """
    offs = _lk_offsets(win)
    pyr_l = im.pyramid(left, levels)
    pyr_r = im.pyramid(right, levels)
    K = uv.shape[0]
    d = jnp.zeros((K,))

    for lvl in range(levels - 1, -1, -1):
        scale = 0.5 ** lvl
        uv_l = uv * scale
        L = pyr_l[lvl]
        R = pyr_r[lvl]
        tpl = _patch_sample(L, uv_l, offs)
        # horizontal gradient of right image patches (central diff)
        def body(_, d):
            uv_r = uv_l - jnp.stack([d, jnp.zeros_like(d)], axis=-1)
            cur = _patch_sample(R, uv_r, offs)
            gx = (_patch_sample(R, uv_r + jnp.array([0.5, 0.0]), offs)
                  - _patch_sample(R, uv_r - jnp.array([0.5, 0.0]), offs))
            err = cur - tpl
            num = jnp.sum(gx * err, axis=-1)
            den = jnp.maximum(jnp.sum(gx * gx, axis=-1), 1e-9)
            step = num / den
            return d + jnp.clip(step, -2.0, 2.0)

        d = jax.lax.fori_loop(0, iters, body, d)
        if lvl > 0:
            d = d * 2.0

    # validity: residual + bounds
    uv_r = uv - jnp.stack([d, jnp.zeros_like(d)], axis=-1)
    res = _patch_sample(pyr_l[0], uv, offs) - _patch_sample(pyr_r[0], uv_r, offs)
    rms = jnp.sqrt(jnp.mean(res * res, axis=-1))
    ok = valid & (d > 0.25) & (d < max_disparity) & (rms < max_err) & (uv_r[:, 0] >= 0)
    return jnp.where(ok, d, 0.0), ok


def dense_bm_disparity(left, right, max_disparity: int = 64, block: int = 9,
                       uniqueness: float = 0.95):
    """Dense block-matching disparity (reference StereoBM parity) via
    shift-and-SAD: for each d, SAD = boxfilter(|L - shift(R,d)|); take the
    arg-min with a uniqueness check. Returns float disparity (H,W), 0
    where invalid."""
    H, W = left.shape[-2:]
    r = block // 2
    k = np.ones((block,), np.float32) / block  # host constant (see im._sep_conv)

    def sad_for(d):
        shifted = jnp.roll(right, d, axis=-1)
        ad = jnp.abs(left - shifted)
        return im._sep_conv(ad, k, k)

    sads = jnp.stack([sad_for(d) for d in range(max_disparity)], axis=0)
    best = jnp.argmin(sads, axis=0)
    best_v = jnp.min(sads, axis=0)
    # uniqueness: best must beat the median response clearly
    second = jnp.partition(sads, 1, axis=0)[1]
    okay = (best_v < uniqueness * second) & (best > 0)
    # mask left border (invalid shifts)
    col = jnp.arange(W)[None, :]
    okay = okay & (col >= max_disparity)
    return jnp.where(okay, best.astype(jnp.float32), 0.0)


def dense_sgbm_disparity(left, right, max_disparity: int = 64,
                         p1: float = 0.03, p2: float = 0.2,
                         uniqueness: float = 0.95):
    """Semi-global matching disparity (reference StereoSGBM parity,
    corelib/src/stereo/StereoSGBM — here the Hirschmueller scheme over 4
    scanline directions). TPU shape: the (D, H, W) cost volume is built by
    shift-and-AD (+ small census term for robustness), and each direction's
    DP is one ``lax.scan`` along that axis with the whole perpendicular
    dimension and the disparity axis vectorized — O(H+W) sequential steps,
    everything else batched on the VPU."""
    H, W = left.shape[-2:]
    D = max_disparity

    def cost_for(d):
        shifted = jnp.roll(right, d, axis=-1)
        ad = jnp.abs(left - shifted)
        gl = left - jnp.roll(left, 1, axis=-1)
        gr = shifted - jnp.roll(shifted, 1, axis=-1)
        return 0.7 * ad + 0.3 * jnp.abs(gl - gr)

    cost = jnp.stack([cost_for(d) for d in range(D)], axis=0)  # (D,H,W)

    def aggregate(costs_seq):
        """costs_seq (L, D, M): DP along axis 0 with the SGM recurrence."""
        def step(prev, c):
            # prev (D, M): previous aggregated column (minus its min)
            m = jnp.min(prev, axis=0)
            up = jnp.roll(prev, 1, axis=0).at[0].set(1e9)
            dn = jnp.roll(prev, -1, axis=0).at[-1].set(1e9)
            best = jnp.minimum(jnp.minimum(prev, up + p1),
                               jnp.minimum(dn + p1, m[None] + p2))
            out = c + best - m[None]
            return out, out

        init = costs_seq[0]
        _, agg = jax.lax.scan(step, init, costs_seq[1:])
        return jnp.concatenate([init[None], agg], axis=0)

    # 4 directions: left->right, right->left, top->bottom, bottom->top
    lr = jnp.moveaxis(aggregate(jnp.moveaxis(cost, 2, 0)), 0, 2)
    rl = jnp.flip(jnp.moveaxis(
        aggregate(jnp.moveaxis(jnp.flip(cost, 2), 2, 0)), 0, 2), 2)
    tb = jnp.moveaxis(aggregate(jnp.moveaxis(cost, 1, 0)), 0, 1)
    bt = jnp.flip(jnp.moveaxis(
        aggregate(jnp.moveaxis(jnp.flip(cost, 1), 1, 0)), 0, 1), 1)
    total = lr + rl + tb + bt  # (D,H,W)

    best = jnp.argmin(total, axis=0)
    best_v = jnp.min(total, axis=0)
    second = jnp.partition(total, 1, axis=0)[1]
    okay = (best_v < uniqueness * second) & (best > 0)
    col = jnp.arange(W)[None, :]
    okay = okay & (col >= D)
    # parabolic subpixel refinement on the aggregated cost
    bm1 = jnp.take_along_axis(total, jnp.clip(best - 1, 0, D - 1)[None], 0)[0]
    bp1 = jnp.take_along_axis(total, jnp.clip(best + 1, 0, D - 1)[None], 0)[0]
    denom = bm1 + bp1 - 2.0 * best_v
    off = jnp.where(jnp.abs(denom) > 1e-9, 0.5 * (bm1 - bp1) / denom, 0.0)
    disp = best.astype(jnp.float32) + jnp.clip(off, -0.5, 0.5)
    return jnp.where(okay, disp, 0.0)


def keypoints_3d_from_stereo(kps_uv, kps_valid, left, right, stereo_model,
                             max_depth: float = 40.0):
    """Sparse stereo 3D: LK disparity at keypoints -> camera-frame points
    (reference: Feature2D::generateKeypoints3D stereo path)."""
    from rtabmap_tpu.geometry import camera as C

    disp, ok = lk_stereo_disparity(left, right, kps_uv, kps_valid)
    depth = C.disparity_to_depth(disp, stereo_model)
    ok = ok & (depth > 0) & (depth < max_depth)
    pts = C.backproject(kps_uv, depth, stereo_model.left)
    return jnp.where(ok[:, None], pts, 0.0), ok
