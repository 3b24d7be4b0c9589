"""Camera capture drivers: the file/replay subset of the reference's 23
device backends, plus an explicit registry for the hardware SDKs.

Capability parity: the reference's ``Camera``/``SensorCapture`` family
(/root/reference/corelib/src/camera/ — 14k LoC of device backends:
CameraImages, CameraVideo, CameraStereoImages/Video, CameraRGBDImages,
plus vendor SDKs: OpenNI2, Freenect(2), RealSense2, K4A, Zed, MyntEye,
DepthAI, ...). On a TPU host only the file/replay backends are meaningful;
vendor-SDK drivers are registered with an explicit "hardware SDK not
available" error so callers see the same driver-selection surface
(reference: Camera factory in SensorCaptureThread / rtabmap app driver
index 0-13).

Every driver yields ``SensorData`` (already float [0,1] gray + metric
depth) so the capture layer feeds the jitted feature/odometry kernels
without further conversion.
"""
from __future__ import annotations

import glob
import os
from typing import Callable, Dict, Iterator, List, Optional

import numpy as np

from rtabmap_tpu.core.frame import SensorData


def _imread(path: str) -> np.ndarray:
    from PIL import Image

    return np.asarray(Image.open(path))


def _to_gray01(img: np.ndarray) -> np.ndarray:
    if img.ndim == 3:
        img = (0.299 * img[..., 0] + 0.587 * img[..., 1] + 0.114 * img[..., 2])
    img = img.astype(np.float32)
    if img.max() > 1.5:
        img = img / 255.0
    return img


def _depth_to_meters(depth: np.ndarray, depth_scale: float) -> np.ndarray:
    if depth.dtype == np.uint16:
        return depth.astype(np.float32) / depth_scale
    return depth.astype(np.float32)


def _sorted_files(d: str, exts=("*.png", "*.jpg", "*.jpeg", "*.pgm", "*.tif")) -> List[str]:
    files: List[str] = []
    for e in exts:
        files += glob.glob(os.path.join(d, e))
    return sorted(files, key=lambda f: (len(os.path.basename(f)), f))


class CameraDriver:
    """Iterator protocol: drivers yield SensorData until exhausted
    (reference: SensorCapture::takeData returning invalid data at end)."""

    def init(self) -> bool:
        return True

    def __iter__(self) -> Iterator[SensorData]:
        raise NotImplementedError


class CameraImages(CameraDriver):
    """Grayscale/RGB image directory (reference: CameraImages.cpp)."""

    def __init__(self, image_dir: str, fps: float = 0.0, start_id: int = 0):
        self.dir = image_dir
        self.dt = 1.0 / fps if fps > 0 else 1.0 / 30.0
        self.start = start_id

    def init(self) -> bool:
        return len(_sorted_files(self.dir)) > 0

    def __iter__(self):
        for i, f in enumerate(_sorted_files(self.dir)[self.start:]):
            yield SensorData(gray=_to_gray01(_imread(f)), depth=None, right=None,
                             stamp=i * self.dt, id=i + 1)


class CameraRGBDImages(CameraDriver):
    """Paired rgb/ + depth/ directories (reference: CameraRGBDImages.cpp;
    16-bit depth PNGs divided by ``depth_scale``, TUM convention 5000)."""

    def __init__(self, rgb_dir: str, depth_dir: str, depth_scale: float = 5000.0,
                 fps: float = 0.0):
        self.rgb = rgb_dir
        self.depth = depth_dir
        self.scale = depth_scale
        self.dt = 1.0 / fps if fps > 0 else 1.0 / 30.0

    def init(self) -> bool:
        return (len(_sorted_files(self.rgb)) > 0
                and len(_sorted_files(self.rgb)) == len(_sorted_files(self.depth)))

    def __iter__(self):
        for i, (fr, fd) in enumerate(zip(_sorted_files(self.rgb),
                                         _sorted_files(self.depth))):
            yield SensorData(
                gray=_to_gray01(_imread(fr)),
                depth=_depth_to_meters(_imread(fd), self.scale),
                right=None, stamp=i * self.dt, id=i + 1)


class CameraStereoImages(CameraDriver):
    """Paired left/ + right/ directories (reference: CameraStereoImages.cpp)."""

    def __init__(self, left_dir: str, right_dir: str, fps: float = 0.0):
        self.left = left_dir
        self.right = right_dir
        self.dt = 1.0 / fps if fps > 0 else 1.0 / 30.0

    def init(self) -> bool:
        return (len(_sorted_files(self.left)) > 0
                and len(_sorted_files(self.left)) == len(_sorted_files(self.right)))

    def __iter__(self):
        for i, (fl, fr) in enumerate(zip(_sorted_files(self.left),
                                         _sorted_files(self.right))):
            yield SensorData(gray=_to_gray01(_imread(fl)), depth=None,
                             right=_to_gray01(_imread(fr)),
                             stamp=i * self.dt, id=i + 1)


class CameraVideo(CameraDriver):
    """Video file / webcam via OpenCV when present (reference:
    CameraVideo.cpp). Gated: raises a clear error if cv2 is unavailable."""

    def __init__(self, source, fps: float = 0.0):
        self.source = source
        self.fps = fps

    def init(self) -> bool:
        try:
            import cv2  # noqa: F401
        except ImportError:
            return False
        return True

    def __iter__(self):
        try:
            import cv2
        except ImportError as e:
            raise RuntimeError("CameraVideo requires OpenCV (cv2), which is "
                               "not available in this environment") from e
        cap = cv2.VideoCapture(self.source)
        dt = 1.0 / (self.fps or (cap.get(cv2.CAP_PROP_FPS) or 30.0))
        i = 0
        while True:
            ok, frame = cap.read()
            if not ok:
                break
            gray = _to_gray01(frame[..., ::-1])
            i += 1
            yield SensorData(gray=gray, depth=None, right=None,
                             stamp=(i - 1) * dt, id=i)
        cap.release()


class DBCamera(CameraDriver):
    """Replay a map database as a stream (reference: DBReader.cpp).

    NOTE: databases store extracted features, not raw images, so this
    driver yields DBReader's (FrameFeatures, pose, covariance, stamp)
    tuples — the engine's replay entry point — rather than SensorData."""

    def __init__(self, db, ignore_odometry: bool = False):
        self.db = db
        self.ignore_odometry = ignore_odometry

    def init(self) -> bool:
        return not isinstance(self.db, str) or os.path.exists(self.db)

    def __iter__(self):
        from rtabmap_tpu.memory.db import Database
        from rtabmap_tpu.memory.db_reader import DBReader

        db = Database(self.db, async_writes=False) if isinstance(self.db, str) else self.db
        yield from DBReader(db, ignore_odometry=self.ignore_odometry)


# ----------------------------------------------------------------- registry

_HARDWARE_SDKS = [
    "openni", "openni2", "freenect", "freenect2", "realsense", "realsense2",
    "k4w2", "k4a", "zed", "zedoc", "mynteye", "depthai", "aria", "xvisio",
    "ueye", "tango", "arengine", "arkit",
]


def _hw_stub(name: str) -> Callable[..., CameraDriver]:
    def make(*a, **kw):
        raise RuntimeError(
            f"camera driver '{name}' requires the vendor hardware SDK, which "
            f"is not available on a TPU host; use one of "
            f"{sorted(k for k in _REGISTRY if k not in _HARDWARE_SDKS)} "
            f"(reference driver list: corelib/src/camera/)")
    return make


_REGISTRY: Dict[str, Callable[..., CameraDriver]] = {
    "images": CameraImages,
    "rgbd_images": CameraRGBDImages,
    "stereo_images": CameraStereoImages,
    "video": CameraVideo,
    "database": DBCamera,
}
_REGISTRY.update({name: _hw_stub(name) for name in _HARDWARE_SDKS})


def available_drivers() -> List[str]:
    return sorted(_REGISTRY)


def create_camera(driver: str, *args, **kwargs) -> CameraDriver:
    if driver not in _REGISTRY:
        raise KeyError(f"unknown camera driver '{driver}'; "
                       f"available: {available_drivers()}")
    return _REGISTRY[driver](*args, **kwargs)
