"""Pyramidal Lucas-Kanade feature tracking (2-D KLT).

Capability parity: the reference's optical-flow correspondence mode
(/root/reference/corelib/src/RegistrationVis.cpp — ``Vis/CorType=1`` uses
cv::calcOpticalFlowPyrLK instead of descriptor matching; also used by
Odometry for guess-seeded tracking). TPU re-design: all K features are
tracked in one batched coarse-to-fine Gauss-Newton — patch sampling is a
vectorized bilinear gather, the 2x2 normal equations are closed-form, and
the level/iteration loops are fixed-count (jit-friendly).
"""
from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from rtabmap_tpu.ops import image as im
from rtabmap_tpu.ops.stereo import _lk_offsets, _patch_sample


@partial(jax.jit, static_argnames=("levels", "iters", "win"))
def klt_track(prev, nxt, uv, valid, guess_uv: Optional[jnp.ndarray] = None,
              levels: int = 3, iters: int = 8, win: int = 3,
              max_err: float = 0.08, max_move: float = 100.0
              ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Track uv (K,2) from ``prev`` into ``nxt``. Returns (uv2 (K,2), ok).

    ``guess_uv`` seeds the search (e.g. projected map points under the
    motion-model guess — the reference's flow-with-guess path).
    """
    offs = _lk_offsets(win)
    pyr_p = im.pyramid(prev, levels)
    pyr_n = im.pyramid(nxt, levels)
    d = ((guess_uv - uv) if guess_uv is not None
         else jnp.zeros_like(uv)) * (0.5 ** (levels - 1))

    for lvl in range(levels - 1, -1, -1):
        scale = 0.5 ** lvl
        uv_l = uv * scale
        Pl = pyr_p[lvl]
        Nl = pyr_n[lvl]
        tpl = _patch_sample(Pl, uv_l, offs)

        def body(_, d):
            uv_n = uv_l + d
            cur = _patch_sample(Nl, uv_n, offs)
            gx = (_patch_sample(Nl, uv_n + jnp.array([0.5, 0.0]), offs)
                  - _patch_sample(Nl, uv_n - jnp.array([0.5, 0.0]), offs))
            gy = (_patch_sample(Nl, uv_n + jnp.array([0.0, 0.5]), offs)
                  - _patch_sample(Nl, uv_n - jnp.array([0.0, 0.5]), offs))
            err = cur - tpl
            # 2x2 normal equations per feature
            a = jnp.sum(gx * gx, -1) + 1e-9
            b = jnp.sum(gx * gy, -1)
            c = jnp.sum(gy * gy, -1) + 1e-9
            e1 = jnp.sum(gx * err, -1)
            e2 = jnp.sum(gy * err, -1)
            det = jnp.maximum(a * c - b * b, 1e-12)
            du = (c * e1 - b * e2) / det
            dv = (a * e2 - b * e1) / det
            step = jnp.stack([du, dv], axis=-1)
            return d - jnp.clip(step, -2.0, 2.0)

        d = jax.lax.fori_loop(0, iters, body, d)
        if lvl > 0:
            d = d * 2.0

    uv2 = uv + d
    res = (_patch_sample(pyr_p[0], uv, offs)
           - _patch_sample(pyr_n[0], uv2, offs))
    rms = jnp.sqrt(jnp.mean(res * res, axis=-1))
    H, W = prev.shape[-2:]
    ok = (valid & (rms < max_err)
          & (jnp.linalg.norm(d, axis=-1) < max_move)
          & (uv2[:, 0] >= 0) & (uv2[:, 0] < W - 1)
          & (uv2[:, 1] >= 0) & (uv2[:, 1] < H - 1))
    return uv2, ok
