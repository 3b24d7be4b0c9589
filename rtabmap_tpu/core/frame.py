"""Frame-level data model: sensor data + extracted features.

Capability parity: the reference's ``SensorData`` (raw/compressed images,
camera models, IMU/GPS, keypoints+descriptors —
/root/reference/corelib/include/rtabmap/core/SensorData.h:51) and the
feature part of ``Signature`` (wordId->keypoint/3D/descriptor tables,
Signature.h:48). Redesigned as fixed-capacity struct-of-arrays pytrees so a
frame's features flow straight into jitted registration/quantization
kernels with static shapes.
"""
from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from rtabmap_tpu.geometry import camera as C
from rtabmap_tpu.ops import features as F
from rtabmap_tpu.ops import image as im


class FrameFeatures(NamedTuple):
    """Fixed-K per-frame features; the unit of registration/quantization."""

    uv: jnp.ndarray       # (K,2) pixel coords
    desc: jnp.ndarray     # (K,D) ±1 int8 descriptors (0 rows = invalid)
    pts3d: jnp.ndarray    # (K,3) camera-frame 3D (0 where invalid)
    valid: jnp.ndarray    # (K,) keypoint validity
    valid3d: jnp.ndarray  # (K,) has valid depth/3D
    angle: jnp.ndarray    # (K,)
    response: jnp.ndarray # (K,)

    @property
    def capacity(self) -> int:
        return self.uv.shape[0]


class SensorData(NamedTuple):
    """One input frame (host-side container; arrays may be numpy or jax)."""

    gray: jnp.ndarray            # (H,W) float32 [0,1]
    depth: Optional[jnp.ndarray] # (H,W) meters, 0 = invalid; None for stereo
    right: Optional[jnp.ndarray] # (H,W) right image for stereo; None for RGB-D
    stamp: float = 0.0
    id: int = 0


class EnvSensor(NamedTuple):
    """Environmental sensor reading attached to a node (reference:
    ``EnvSensor`` on SensorData — corelib/include/rtabmap/core/EnvSensor.h,
    persisted per node and exported by the WifiMapping example)."""

    type: int      # one of ENV_SENSOR_* below
    value: float
    stamp: float = 0.0


ENV_SENSOR_UNDEFINED = 0
ENV_SENSOR_WIFI_SIGNAL_STRENGTH = 1    # dBm
ENV_SENSOR_AMBIENT_TEMPERATURE = 2     # celsius
ENV_SENSOR_AMBIENT_AIR_PRESSURE = 3    # hPa
ENV_SENSOR_AMBIENT_LIGHT = 4           # lx
ENV_SENSOR_AMBIENT_RELATIVE_HUMIDITY = 5  # %
ENV_SENSOR_CUSTOM1 = 6


def extract_features(gray, depth, cam: C.CameraModel, max_kp: int = 512,
                     min_depth: float = 0.1, max_depth: float = 20.0,
                     use_grid: bool = True) -> FrameFeatures:
    """Jittable: detect + describe + 3D-from-depth in one pass.

    (reference flow: Memory::createSignature feature branch,
    Memory.cpp:5025 -> Features2d + generateKeypoints3D.)
    """
    kps, desc = F.detect_and_describe(gray, max_kp, use_grid=use_grid)
    pts3d, ok3d = F.keypoints_3d_from_depth(kps, depth, cam, min_depth, max_depth)
    return FrameFeatures(
        uv=kps.uv, desc=desc, pts3d=pts3d, valid=kps.valid,
        valid3d=ok3d, angle=kps.angle, response=kps.response,
    )
