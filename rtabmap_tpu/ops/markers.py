"""Fiducial marker detection -> landmark constraints.

Capability parity: the reference's ``MarkerDetector``
(/root/reference/corelib/src/MarkerDetector.cpp — ArUco dictionaries +
pose estimation producing ``Landmark`` links with linear/angular
variance). Detection uses OpenCV's aruco module host-side (detection is
control-plane, like the reference); the PnP pose of each marker reuses
our batched solver.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, List, Optional

import numpy as np


@dataclass
class Landmark:
    id: int
    transform: np.ndarray  # (3,4) marker pose in camera frame
    size: float
    variance_linear: float = 0.001
    variance_angular: float = 0.01


# Marker/Dictionary integer indices (reference: Parameters.h
# kMarkerDictionary — 0-16 ArUco, 17-20 AprilTag, 21 ArUco MIP)
DICT_BY_INDEX = [
    "4X4_50", "4X4_100", "4X4_250", "4X4_1000",
    "5X5_50", "5X5_100", "5X5_250", "5X5_1000",
    "6X6_50", "6X6_100", "6X6_250", "6X6_1000",
    "7X7_50", "7X7_100", "7X7_250", "7X7_1000",
    "ARUCO_ORIGINAL",
    "APRILTAG_16h5", "APRILTAG_25h9", "APRILTAG_36h10", "APRILTAG_36h11",
    "ARUCO_MIP_36h12",
]


def _resolve_dictionary(cv2, dictionary):
    """Accept the reference's integer Marker/Dictionary index, or a name
    with/without the DICT_ prefix (ArUco AND AprilTag families)."""
    if isinstance(dictionary, (int, np.integer)):
        if not 0 <= int(dictionary) < len(DICT_BY_INDEX):
            raise ValueError(f"Marker/Dictionary index {dictionary} out of "
                             f"range 0..{len(DICT_BY_INDEX) - 1}")
        dictionary = DICT_BY_INDEX[int(dictionary)]
    name = str(dictionary)
    if name.startswith("DICT_"):
        name = name[5:]
    return getattr(cv2.aruco, f"DICT_{name}")


class MarkerDetector:
    def __init__(self, dictionary="4X4_50", marker_length: float = 0.2,
                 var_linear: float = 0.001, var_angular: float = 0.01):
        import cv2

        self._cv2 = cv2
        dic = _resolve_dictionary(cv2, dictionary)
        self.dictionary = cv2.aruco.getPredefinedDictionary(dic)
        self.detector = cv2.aruco.ArucoDetector(self.dictionary)
        self.marker_length = marker_length
        self.var_linear = var_linear
        self.var_angular = var_angular

    def detect(self, gray_u8: np.ndarray, cam) -> List[Landmark]:
        """gray uint8 (H,W) -> landmarks with camera-frame poses
        (reference: MarkerDetector::detect MarkerDetector.h:101-105)."""
        import jax
        import jax.numpy as jnp

        from rtabmap_tpu.geometry import transform as T
        from rtabmap_tpu.ops import ransac as R

        corners, ids, _ = self.detector.detectMarkers(gray_u8)
        out: List[Landmark] = []
        if ids is None:
            return out
        s = self.marker_length / 2.0
        # marker frame y-down to match the optical frame (ArUco corner
        # order: top-left, top-right, bottom-right, bottom-left)
        obj = np.array([[-s, -s, 0], [s, -s, 0], [s, s, 0], [-s, s, 0]], np.float32)
        for k, mid in enumerate(ids.reshape(-1)):
            uv = corners[k].reshape(4, 2).astype(np.float32)
            # pad to 8 points (duplicate) for the 6-pt DLT; then GN refine
            pts = np.tile(obj, (2, 1))
            uvs = np.tile(uv, (2, 1))
            xn = np.stack([(uvs[:, 0] - float(cam.cx)) / float(cam.fx),
                           (uvs[:, 1] - float(cam.cy)) / float(cam.fy)], axis=-1)
            # planar points: DLT degenerates -> GN from a frontal guess at
            # the scale-implied distance (marker-frame -> camera-frame)
            px_size = float(np.linalg.norm(uv[1] - uv[0]))
            z0 = float(cam.fx) * self.marker_length / max(px_size, 1.0)
            guess = np.eye(3, 4, dtype=np.float32)
            guess[2, 3] = z0
            ctr = uv.mean(0)
            guess[0, 3] = (ctr[0] - float(cam.cx)) / float(cam.fx) * z0
            guess[1, 3] = (ctr[1] - float(cam.cy)) / float(cam.fy) * z0
            Tcw, res, depth = R.pnp_gn(
                jnp.asarray(pts), jnp.asarray(xn), jnp.ones((8,)),
                jnp.asarray(guess), iters=30,
            )
            err = float(jnp.linalg.norm(res, axis=-1).mean()) * float(cam.fx)
            if err > 4.0 or not bool(jnp.isfinite(Tcw).all()):
                continue
            # Tcw maps marker-frame -> camera-frame == marker pose in camera
            marker_in_cam = np.asarray(Tcw)
            out.append(Landmark(id=int(mid), transform=marker_in_cam,
                                size=self.marker_length,
                                variance_linear=self.var_linear,
                                variance_angular=self.var_angular))
        return out


def draw_marker(dictionary, marker_id: int, size_px: int = 200) -> np.ndarray:
    """Render a marker image (for tests / calibration targets)."""
    import cv2

    dic = cv2.aruco.getPredefinedDictionary(_resolve_dictionary(cv2, dictionary))
    return cv2.aruco.generateImageMarker(dic, marker_id, size_px)
