"""SuperPoint keypoint detector + descriptor as a flax module.

Capability parity: the reference's TorchScript SuperPoint wrapper
(/root/reference/corelib/src/superpoint_torch/SuperPoint.cc:342 — loads a
traced pth, runs the VGG encoder + 65-channel detector head + 256-D
descriptor head, NMS, top-k, bilinear descriptor sampling) and the
rpautrat variant (corelib/src/superpoint_rpautrat/). Rebuilt TPU-first:
the network is a flax module traced once under jit — NHWC bfloat16 convs
land on the MXU, the pixel-shuffle detector head is a reshape/transpose,
NMS is the same max-pool trick the classic detectors use, and selection
is a single static top-k. No TorchScript runtime: weights live in a flax
param pytree, loadable from ``.npz`` (``load_params``) so pretrained
MagicLeap weights can be converted offline.

The descriptor head emits unit-norm float features; ``extract`` also
sign-binarizes them to the framework's ±1 int8 convention so SuperPoint
descriptors flow through the same MXU Hamming matcher and BoW vocabulary
as BRIEF (256-bit sign LSH of the unit hypersphere preserves cosine
ranking to within the usual LSH bound).
"""
from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from rtabmap_tpu.ops import features as F
from rtabmap_tpu.ops import image as im

CELL = 8  # encoder stride; detector head emits CELL*CELL+1 logits per cell


class SuperPointNet(nn.Module):
    """VGG-style shared encoder + detector/descriptor heads (NHWC)."""

    desc_dim: int = 256
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        # x: (N, H, W, 1) float32 in [0,1]; H, W multiples of 8.
        conv = partial(nn.Conv, kernel_size=(3, 3), padding="SAME", dtype=self.dtype)
        pool = lambda t: nn.max_pool(t, (2, 2), strides=(2, 2))
        relu = nn.relu
        x = x.astype(self.dtype)
        x = relu(conv(features=64)(x))
        x = relu(conv(features=64)(x))
        x = pool(x)
        x = relu(conv(features=64)(x))
        x = relu(conv(features=64)(x))
        x = pool(x)
        x = relu(conv(features=128)(x))
        x = relu(conv(features=128)(x))
        x = pool(x)
        x = relu(conv(features=128)(x))
        x = relu(conv(features=128)(x))
        # detector head: (N, H/8, W/8, 65)
        h = relu(conv(features=256)(x))
        logits = nn.Conv(features=CELL * CELL + 1, kernel_size=(1, 1),
                         dtype=self.dtype)(h)
        # descriptor head: (N, H/8, W/8, D)
        d = relu(conv(features=256)(x))
        desc = nn.Conv(features=self.desc_dim, kernel_size=(1, 1),
                       dtype=self.dtype)(d)
        return logits.astype(jnp.float32), desc.astype(jnp.float32)


def score_map_from_logits(logits):
    """(N, Hc, Wc, 65) -> dense (N, H, W) keypoint probability.

    Softmax over the 65 cell classes, drop the dustbin, pixel-shuffle the
    remaining 64 back to full resolution (reference: SuperPoint.cc semi ->
    depth-to-space).
    """
    prob = jax.nn.softmax(logits, axis=-1)[..., :-1]  # (N,Hc,Wc,64)
    n, hc, wc, _ = prob.shape
    prob = prob.reshape(n, hc, wc, CELL, CELL)
    prob = prob.transpose(0, 1, 3, 2, 4).reshape(n, hc * CELL, wc * CELL)
    return prob


def _sample_descriptors(desc_map, uv):
    """Bilinear descriptor lookup at pixel coords uv (K,2) on the coarse
    (Hc, Wc, D) map; returns L2-normalized (K, D) float32."""
    hc, wc, dd = desc_map.shape
    # map pixel center to coarse-grid coordinates
    cu = jnp.clip((uv[:, 0] + 0.5) / CELL - 0.5, 0.0, wc - 1.0)
    cv = jnp.clip((uv[:, 1] + 0.5) / CELL - 0.5, 0.0, hc - 1.0)
    u0 = jnp.floor(cu).astype(jnp.int32)
    v0 = jnp.floor(cv).astype(jnp.int32)
    u1 = jnp.minimum(u0 + 1, wc - 1)
    v1 = jnp.minimum(v0 + 1, hc - 1)
    fu = (cu - u0)[:, None]
    fv = (cv - v0)[:, None]
    flat = desc_map.reshape(-1, dd)
    g = lambda vv, uu: flat[vv * wc + uu]
    d = ((1 - fv) * (1 - fu) * g(v0, u0) + (1 - fv) * fu * g(v0, u1)
         + fv * (1 - fu) * g(v1, u0) + fv * fu * g(v1, u1))
    return d / jnp.maximum(jnp.linalg.norm(d, axis=-1, keepdims=True), 1e-8)


@partial(jax.jit, static_argnames=("desc_dim", "max_kp", "nms_size", "use_grid"))
def _extract(params, gray, desc_dim: int, max_kp: int, nms_size: int,
             conf_threshold, use_grid: bool):
    net = SuperPointNet(desc_dim=desc_dim)
    logits, desc_map = net.apply({"params": params}, gray[None, :, :, None])
    score = score_map_from_logits(logits)[0]
    if use_grid:
        kps = F.select_top_k_grid(score, max_kp, nms_size=nms_size,
                                  quality_level=0.0, border=CELL)
    else:
        kps = F.select_top_k(score, max_kp, nms_size=nms_size,
                             quality_level=0.0, border=CELL)
    kps = kps._replace(valid=kps.valid & (kps.response > conf_threshold))
    descf = _sample_descriptors(desc_map[0], kps.uv)
    desc = jnp.where(descf >= 0, 1, -1).astype(jnp.int8)
    desc = jnp.where(kps.valid[:, None], desc, 0).astype(jnp.int8)
    return kps, desc, descf


class SuperPoint:
    """Host-side facade: owns params, exposes a jitted extract()."""

    def __init__(self, params=None, desc_dim: int = 256, seed: int = 0):
        self.desc_dim = desc_dim
        self.net = SuperPointNet(desc_dim=desc_dim)
        if params is None:
            params = self.init_params(jax.random.PRNGKey(seed))
        self.params = params

    def init_params(self, key, h: int = 64, w: int = 64):
        return self.net.init(key, jnp.zeros((1, h, w, 1)))["params"]

    def extract(self, gray, max_kp: int = 512, nms_size: int = 9,
                conf_threshold: float = 0.005, use_grid: bool = False):
        """gray (H, W) float32 in [0,1], H/W multiples of 8 ->
        (Keypoints(max_kp), desc ±1 int8 (max_kp, D), desc_f32 (max_kp, D))."""
        return _extract(self.params, gray, self.desc_dim, max_kp, nms_size,
                        jnp.float32(conf_threshold), use_grid)

    # ------------------------------------------------------------- persistence

    def save_params(self, path: str):
        flat = jax.tree_util.tree_flatten_with_path(self.params)[0]
        out = {}
        for kp, leaf in flat:
            name = "/".join(p.key for p in kp)
            out[name] = np.asarray(leaf)
        np.savez(path, **out)

    @classmethod
    def load_params(cls, path: str, desc_dim: int = 256) -> "SuperPoint":
        data = np.load(path)
        sp = cls(desc_dim=desc_dim)
        tmpl = jax.tree_util.tree_flatten_with_path(sp.params)
        leaves = []
        for kp, leaf in tmpl[0]:
            name = "/".join(p.key for p in kp)
            arr = jnp.asarray(data[name], jnp.float32)
            assert arr.shape == leaf.shape, (name, arr.shape, leaf.shape)
            leaves.append(arr)
        sp.params = jax.tree_util.tree_unflatten(tmpl[1], leaves)
        return sp

    @classmethod
    def distilled(cls, desc_dim: int = 256) -> "SuperPoint":
        """The in-repo self-distilled weights (trained by
        models/train_superpoint.py on synthetic geometry + homographic
        warps — no downloads; the egress-blocked substitute for the
        reference's pretrained superpoint_v1.pt, SuperPoint.cc:342)."""
        import os

        path = os.path.join(os.path.dirname(__file__), "weights",
                            "superpoint_distilled.npz")
        if not os.path.exists(path):
            raise FileNotFoundError(
                f"{path} missing — run python -m "
                "rtabmap_tpu.models.train_superpoint to (re)train it")
        return cls.load_params(path, desc_dim=desc_dim)
