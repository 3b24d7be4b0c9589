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
                     use_grid: bool = True, detector: str = "gftt",
                     descriptor: str = "brief") -> FrameFeatures:
    """Jittable: detect + describe + 3D-from-depth in one pass.

    (reference flow: Memory::createSignature feature branch,
    Memory.cpp:5025 -> Features2d + generateKeypoints3D.)

    ``descriptor="sift"`` output (float, L2) is binarized by 256-bit
    sign-LSH (fixed random hyperplanes on the unit descriptor sphere —
    cosine-preserving, Charikar 2002) so every strategy feeds the same ±1
    int8 Hamming vocabulary/matching pipeline. Per-coordinate sign
    thresholding does NOT work for SIFT (sparse, correlated coordinates:
    0 surviving matches on the real samples); the random projection
    recovers BRIEF-level match counts.
    """
    kps, desc = F.detect_and_describe(gray, max_kp, use_grid=use_grid,
                                      detector=detector, descriptor=descriptor)
    if desc.dtype != jnp.int8:
        x = desc / jnp.maximum(
            jnp.linalg.norm(desc, axis=-1, keepdims=True), 1e-8)
        R = jax.random.normal(jax.random.PRNGKey(0),
                              (desc.shape[-1], F.DESC_DIM))
        desc = jnp.where(x @ R >= 0, 1, -1).astype(jnp.int8)
        desc = jnp.where(kps.valid[:, None], desc, 0).astype(jnp.int8)
    pts3d, ok3d = F.keypoints_3d_from_depth(kps, depth, cam, min_depth, max_depth)
    return FrameFeatures(
        uv=kps.uv, desc=desc, pts3d=pts3d, valid=kps.valid,
        valid3d=ok3d, angle=kps.angle, response=kps.response,
    )


# Kp/DetectorStrategy -> (response map, descriptor) for the classical
# pipeline (reference enum: Features2d.h:117-134). The TPU build keeps
# four response maps (gftt/harris/dog/fast) and two descriptors
# (rotated-BRIEF, SIFT); strategies collapse onto the closest equivalent
# the way the reference's own conditional builds do (e.g. no-SURF builds
# fall back to GFTT/BRIEF, Parameters.h:256-258).
CLASSICAL_STRATEGIES = {
    0: ("dog", "brief"),   # SURF -> blob detector + binary descriptor
    1: ("dog", "sift"),    # SIFT
    2: ("fast", "brief"),  # ORB = FAST + rotated BRIEF
    3: ("fast", "brief"),  # FAST/FREAK
    4: ("fast", "brief"),  # FAST/BRIEF
    5: ("gftt", "brief"),  # GFTT/FREAK
    6: ("gftt", "brief"),  # GFTT/BRIEF (the reference default)
    7: ("fast", "brief"),  # BRISK
    8: ("gftt", "brief"),  # GFTT/ORB
    9: ("dog", "sift"),    # KAZE
    10: ("gftt", "brief"),  # ORB-OCTREE (grid-balanced top-k)
    12: ("dog", "brief"),  # SURF/FREAK
    13: ("gftt", "brief"),  # GFTT/DAISY
    14: ("dog", "brief"),  # SURF/DAISY
}
LEARNED_STRATEGIES = (11, 15, 16)  # SuperPoint / PyDetector / SP-rpautrat


class FeatureExtractor:
    """``Kp/DetectorStrategy`` dispatch — the reference's ``Feature2D``
    factory (Features2d.h:117-134 ``Feature2D::create``) as a host-side
    facade over the jitted extraction paths.

    Strategies 11/15/16 run the learned detector (the in-repo distilled
    SuperPoint, models/superpoint.py — the reference's
    superpoint_torch/SuperPoint.cc:342 role; 15 PyDetector maps here too
    since SuperPoint IS the framework's python-pluggable detector).
    ``SuperPoint/ModelPath`` (npz) overrides the bundled weights. All
    other strategies run the classical response-map pipeline per
    CLASSICAL_STRATEGIES.

    ``extract(gray, depth) -> (FrameFeatures, descf)`` where ``descf`` is
    the (K, 256) float descriptor table for the learned strategies (fed to
    the Vis/CorNNType=6 attentional matcher via
    ``Rtabmap.process(..., descf=...)``) and None for classical ones.
    """

    def __init__(self, cam: C.CameraModel, params=None, max_kp: int = 512,
                 min_depth: float = 0.1, max_depth: float = 20.0):
        from rtabmap_tpu.utils.params import Parameters

        p = params or Parameters()
        self.cam = cam
        self.max_kp = max_kp
        self.strategy = int(p["Kp/DetectorStrategy"])
        self.min_depth, self.max_depth = min_depth, max_depth
        if self.strategy in LEARNED_STRATEGIES:
            from rtabmap_tpu.models.superpoint import SuperPoint

            model_path = str(p["SuperPoint/ModelPath"] or "")
            self._sp = (SuperPoint.load_params(model_path) if model_path
                        else SuperPoint.distilled())
            thr_key = ("SuperPointRpautrat/Threshold" if self.strategy == 16
                       else "SuperPoint/Threshold")
            self._sp_threshold = float(p[thr_key])
            self._sp_nms = 2 * int(p["SuperPoint/NMSRadius"]) + 1 \
                if bool(p["SuperPoint/NMS"]) else 1
            self._sp_3d = jax.jit(lambda kps, d: F.keypoints_3d_from_depth(
                kps, d, cam, min_depth, max_depth))
        else:
            det, desc = CLASSICAL_STRATEGIES.get(self.strategy,
                                                 ("gftt", "brief"))
            self._fn = jax.jit(lambda g, d: extract_features(
                g, d, cam, max_kp, min_depth, max_depth,
                detector=det, descriptor=desc))

    @property
    def learned(self) -> bool:
        return self.strategy in LEARNED_STRATEGIES

    def extract(self, gray, depth=None):
        if depth is None:
            depth = jnp.zeros_like(gray)
        if not self.learned:
            return self._fn(gray, depth), None
        kps, desc, descf = self._sp.extract(
            gray, self.max_kp, nms_size=self._sp_nms,
            conf_threshold=self._sp_threshold)
        pts3d, ok3d = self._sp_3d(kps, depth)
        fr = FrameFeatures(uv=kps.uv, desc=desc, pts3d=pts3d,
                           valid=kps.valid, valid3d=ok3d,
                           angle=kps.angle, response=kps.response)
        return fr, descf

    def __call__(self, gray, depth=None):
        return self.extract(gray, depth)
