"""CLAMS: discrete depth-distortion self-calibration.

Capability parity: the reference's vendored CLAMS
(/root/reference/corelib/src/clams/ — ``DiscreteDepthDistortionModel``:
a frustum voxel grid of per-bin depth multipliers, trained by comparing
measured depth images against ground-truth depth rendered from a
registered map, then applied to undistort live depth frames; used by the
calibration tool and DatabaseViewer depth-calibration action).

TPU re-design: the per-bin multiplier grid is a dense (By, Bx, Bd) pair of
sum/count accumulators; a training update is one fused scatter-add over
the whole image (no per-pixel scalar loop, reference clams uses OpenMP
over rows), and undistortion is one gather + multiply. Everything jits;
the model is a pytree that checkpoints to .npz.
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np


class DepthDistortionModel(NamedTuple):
    """Accumulated multiplier statistics over the camera frustum."""

    mult_sum: jnp.ndarray   # (By, Bx, Bd) sum of gt/measured ratios
    counts: jnp.ndarray     # (By, Bx, Bd)
    bin_px: jnp.ndarray     # () pixel bin size
    bin_depth: jnp.ndarray  # () meters per depth bin
    max_depth: jnp.ndarray  # () meters


def init_model(height: int, width: int, bin_px: int = 8, bin_depth: float = 2.0,
               max_depth: float = 10.0) -> DepthDistortionModel:
    by = (height + bin_px - 1) // bin_px
    bx = (width + bin_px - 1) // bin_px
    bd = int(np.ceil(max_depth / bin_depth))
    return DepthDistortionModel(
        mult_sum=jnp.zeros((by, bx, bd)),
        counts=jnp.zeros((by, bx, bd)),
        bin_px=jnp.asarray(bin_px, jnp.int32),
        bin_depth=jnp.asarray(bin_depth, jnp.float32),
        max_depth=jnp.asarray(max_depth, jnp.float32),
    )


def _bins(model: DepthDistortionModel, depth):
    H, W = depth.shape[-2:]
    vy = jnp.arange(H, dtype=jnp.int32) // model.bin_px
    vx = jnp.arange(W, dtype=jnp.int32) // model.bin_px
    by = jnp.broadcast_to(vy[:, None], (H, W))
    bx = jnp.broadcast_to(vx[None, :], (H, W))
    bd = jnp.clip((depth / model.bin_depth).astype(jnp.int32), 0,
                  model.mult_sum.shape[2] - 1)
    return by, bx, bd


@jax.jit
def accumulate(model: DepthDistortionModel, measured, gt) -> DepthDistortionModel:
    """One training frame: measured + ground-truth depth images (H, W).

    (reference: DiscreteDepthDistortionModel::accumulate — ratio gt/meas
    into the frustum voxel both depths fall in; invalid pixels skipped.)
    """
    ok = (measured > 1e-3) & (gt > 1e-3) & (measured < model.max_depth) \
        & (gt < model.max_depth)
    ratio = jnp.where(ok, gt / jnp.maximum(measured, 1e-6), 0.0)
    by, bx, bd = _bins(model, measured)
    shape = model.mult_sum.shape
    lin = (by * shape[1] + bx) * shape[2] + bd
    lin = jnp.where(ok, lin, shape[0] * shape[1] * shape[2]).reshape(-1)
    ms = model.mult_sum.reshape(-1).at[lin].add(ratio.reshape(-1), mode="drop")
    ct = model.counts.reshape(-1).at[lin].add(ok.reshape(-1).astype(jnp.float32),
                                              mode="drop")
    return model._replace(mult_sum=ms.reshape(shape), counts=ct.reshape(shape))


@partial(jax.jit, static_argnames=("min_count",))
def undistort(model: DepthDistortionModel, depth, min_count: int = 50):
    """Apply the learned multipliers to a depth image (H, W) -> (H, W).

    Bins with fewer than ``min_count`` observations stay identity
    (reference clams behavior)."""
    mult = jnp.where(model.counts >= min_count,
                     model.mult_sum / jnp.maximum(model.counts, 1.0), 1.0)
    by, bx, bd = _bins(model, depth)
    m = mult[by, bx, bd]
    return jnp.where(depth > 1e-3, depth * m, depth)


def save_model(model: DepthDistortionModel, path: str):
    np.savez(path, **{k: np.asarray(v) for k, v in model._asdict().items()})


def load_model(path: str) -> DepthDistortionModel:
    d = np.load(path)
    return DepthDistortionModel(**{k: jnp.asarray(d[k]) for k in d.files})
