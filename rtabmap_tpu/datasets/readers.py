"""Dataset readers: TUM RGB-D, KITTI odometry, EuRoC MAV.

Capability parity: the reference's file-based cameras + dataset tools —
``CameraRGBDImages`` for TUM (tools/RgbdDataset/main.cpp:150-231 incl. the
fr1/fr2/fr3 calibration table), ``CameraStereoImages``/KITTI calib parse
(tools/KittiDataset/main.cpp), EuRoC ASL layout + cam yaml
(tools/EurocDataset/main.cpp:284-307). Each reader yields
(stamp, gray, depth-or-right, gt_pose?) host-side; decode is lazy.
"""
from __future__ import annotations

import os
from dataclasses import dataclass
from typing import Iterator, List, Optional, Tuple

import numpy as np

from rtabmap_tpu.geometry import camera as C


def _load_gray(path: str) -> np.ndarray:
    from PIL import Image

    img = Image.open(path)
    if img.mode != "L":
        img = img.convert("L")
    return np.asarray(img, np.float32) / 255.0


def _load_depth_png(path: str, factor: float = 5000.0) -> np.ndarray:
    from PIL import Image

    arr = np.asarray(Image.open(path))
    return arr.astype(np.float32) / factor


@dataclass
class Frame:
    stamp: float
    gray: np.ndarray
    depth: Optional[np.ndarray] = None
    right: Optional[np.ndarray] = None
    gt_pose: Optional[np.ndarray] = None  # (3,4)
    odom_pose: Optional[np.ndarray] = None  # (3,4) external odometry (e.g.
    # wheel dead-reckoning — CidSimsDataset --odom, setOdometryPath)
    imu: Optional[List] = None  # [(stamp, gyro(3,), accel(3,))] samples
    # since the previous frame (SensorCaptureThread IMU filtering input)


# ------------------------------------------------------------------ TUM RGB-D

# fr1/fr2/fr3 calibrations (reference table: tools/RgbdDataset/main.cpp:150+)
TUM_CALIB = {
    1: (517.3, 516.5, 318.6, 255.3),
    2: (520.9, 521.0, 325.1, 249.7),
    3: (535.4, 539.2, 320.1, 247.6),
}


def _read_stamped_list(path: str) -> List[Tuple[float, str]]:
    out = []
    with open(path) as f:
        for line in f:
            line = line.strip()
            if not line or line.startswith("#"):
                continue
            parts = line.split()
            out.append((float(parts[0]), parts[1]))
    return out


def _read_tum_gt(path: str) -> List[Tuple[float, np.ndarray]]:
    from rtabmap_tpu.geometry import transform as T
    import jax.numpy as jnp

    out = []
    with open(path) as f:
        for line in f:
            line = line.strip()
            if not line or line.startswith("#"):
                continue
            v = [float(x) for x in line.split()]
            t = np.asarray(v[1:4], np.float32)
            q = np.asarray([v[4], v[5], v[6], v[7]], np.float32)  # qx qy qz qw
            pose = np.asarray(T.from_quaternion(jnp.asarray(q), jnp.asarray(t)))
            out.append((v[0], pose))
    return out


def _associate(a: List[Tuple[float, object]], b: List[Tuple[float, object]],
               max_dt: float = 0.02):
    """Greedy nearest-stamp association (reference associate.py semantics)."""
    out = []
    j = 0
    for ta, va in a:
        while j + 1 < len(b) and abs(b[j + 1][0] - ta) <= abs(b[j][0] - ta):
            j += 1
        if b and abs(b[j][0] - ta) <= max_dt:
            out.append((ta, va, b[j][1]))
    return out


class TumRgbdDataset:
    """TUM RGB-D: rgb.txt + depth.txt + groundtruth.txt association."""

    def __init__(self, root: str, freiburg: Optional[int] = None,
                 depth_factor: float = 5000.0):
        self.root = root
        self.depth_factor = depth_factor
        if freiburg is None:
            name = os.path.basename(os.path.normpath(root))
            freiburg = 1 if "freiburg1" in name else 2 if "freiburg2" in name else 3
        fx, fy, cx, cy = TUM_CALIB[freiburg]
        rgb = _read_stamped_list(os.path.join(root, "rgb.txt"))
        depth = _read_stamped_list(os.path.join(root, "depth.txt"))
        self.pairs = _associate(rgb, depth)
        gt_path = os.path.join(root, "groundtruth.txt")
        self.gt = _read_tum_gt(gt_path) if os.path.exists(gt_path) else []
        # probe image size; scale the published 640x480 intrinsics when
        # the images are a different resolution (lets downscaled copies
        # and synthetic layout fixtures run unchanged)
        g0 = _load_gray(os.path.join(root, self.pairs[0][1]))
        H, W = g0.shape
        sx, sy = W / 640.0, H / 480.0
        self.camera = C.CameraModel.make(fx * sx, fy * sy, cx * sx, cy * sy,
                                         W, H)
        self._first = g0

    def __len__(self):
        return len(self.pairs)

    def __iter__(self) -> Iterator[Frame]:
        gt = self.gt
        j = 0
        for i, (stamp, rgb_rel, depth_rel) in enumerate(self.pairs):
            gray = self._first if i == 0 else _load_gray(os.path.join(self.root, rgb_rel))
            depth = _load_depth_png(os.path.join(self.root, depth_rel), self.depth_factor)
            pose = None
            if gt:
                while j + 1 < len(gt) and abs(gt[j + 1][0] - stamp) <= abs(gt[j][0] - stamp):
                    j += 1
                if abs(gt[j][0] - stamp) < 0.05:
                    pose = gt[j][1]
            yield Frame(stamp=stamp, gray=gray, depth=depth, gt_pose=pose)


# ------------------------------------------------------------- KITTI odometry


class KittiDataset:
    """KITTI odometry: image_0/image_1 stereo grays + calib.txt + times.txt
    (+ poses/<seq>.txt ground truth)."""

    def __init__(self, seq_dir: str, poses_file: Optional[str] = None):
        self.root = seq_dir
        calib = {}
        with open(os.path.join(seq_dir, "calib.txt")) as f:
            for line in f:
                if ":" in line:
                    k, v = line.split(":", 1)
                    calib[k.strip()] = np.fromstring(v, sep=" ")
        P0 = calib["P0"].reshape(3, 4)
        P1 = calib["P1"].reshape(3, 4)
        fx, fy, cx, cy = P0[0, 0], P0[1, 1], P0[0, 2], P0[1, 2]
        baseline = -P1[0, 3] / P1[0, 0]
        with open(os.path.join(seq_dir, "times.txt")) as f:
            self.times = [float(x) for x in f.read().split()]
        self.left_files = sorted(os.listdir(os.path.join(seq_dir, "image_0")))
        g0 = _load_gray(os.path.join(seq_dir, "image_0", self.left_files[0]))
        H, W = g0.shape
        self.camera = C.CameraModel.make(fx, fy, cx, cy, W, H)
        self.stereo = C.StereoCameraModel.make(fx, fy, cx, cy, baseline, W, H)
        self.gt_poses = None
        if poses_file and os.path.exists(poses_file):
            rows = np.loadtxt(poses_file, dtype=np.float32)
            self.gt_poses = rows.reshape(-1, 3, 4)

    def __len__(self):
        return len(self.left_files)

    def __iter__(self) -> Iterator[Frame]:
        for i, name in enumerate(self.left_files):
            gray = _load_gray(os.path.join(self.root, "image_0", name))
            right = _load_gray(os.path.join(self.root, "image_1", name))
            gt = self.gt_poses[i] if self.gt_poses is not None else None
            yield Frame(stamp=self.times[i], gray=gray, right=right, gt_pose=gt)


# ------------------------------------------------------------------- EuRoC


class EurocDataset:
    """EuRoC ASL: mav0/cam0,cam1 stereo + state_groundtruth_estimate0."""

    def __init__(self, root: str):
        import csv

        self.root = root
        cam0 = os.path.join(root, "mav0", "cam0")
        self.cam0_dir = os.path.join(cam0, "data")

        def read_csv(path):
            with open(path) as f:
                return [row for row in csv.reader(f) if row and not row[0].startswith("#")]

        self.rows = read_csv(os.path.join(cam0, "data.csv"))
        # calibration from the dataset's own mav0/cam0/sensor.yaml when
        # present (the real ASL layout carries it); nominal cam0 values as
        # the fallback
        fx, fy, cx, cy = 458.654, 457.296, 367.215, 248.375
        W, H = 752, 480
        dist = np.array([-0.28340811, 0.07395907, 0.00019359,
                         1.76187114e-05, 0.0], np.float32)
        baseline = 0.11
        yml = os.path.join(cam0, "sensor.yaml")
        if os.path.exists(yml):
            try:
                import yaml

                with open(yml) as f:
                    cal = yaml.safe_load(f)
                if cal.get("intrinsics"):
                    fx, fy, cx, cy = [float(x) for x in cal["intrinsics"]]
                if cal.get("resolution"):
                    W, H = [int(x) for x in cal["resolution"]]
                dc = cal.get("distortion_coefficients")
                if dc is not None:
                    d5 = np.zeros(5, np.float32)
                    d5[: min(len(dc), 5)] = np.asarray(dc[:5], np.float32)
                    dist = d5 if np.abs(d5).sum() > 0 else None
                if cal.get("baseline"):
                    baseline = float(cal["baseline"])
            except Exception:
                pass
        self.camera = C.CameraModel.make(fx, fy, cx, cy, W, H, dist=dist)
        self.stereo = C.StereoCameraModel.make(fx, fy, cx, cy, baseline, W, H)
        gt_csv = os.path.join(root, "mav0", "state_groundtruth_estimate0", "data.csv")
        self.gt = []
        if os.path.exists(gt_csv):
            from rtabmap_tpu.geometry import transform as T
            import jax.numpy as jnp

            for row in read_csv(gt_csv):
                stamp = float(row[0]) * 1e-9
                t = np.asarray([float(row[1]), float(row[2]), float(row[3])], np.float32)
                qw, qx, qy, qz = (float(row[4]), float(row[5]), float(row[6]), float(row[7]))
                pose = np.asarray(T.from_quaternion(
                    jnp.asarray([qx, qy, qz, qw]), jnp.asarray(t)))
                self.gt.append((stamp, pose))

    def __len__(self):
        return len(self.rows)

    def __iter__(self) -> Iterator[Frame]:
        j = 0
        for row in self.rows:
            stamp = float(row[0]) * 1e-9
            name = row[1].strip()
            gray = _load_gray(os.path.join(self.cam0_dir, name))
            right_path = os.path.join(self.root, "mav0", "cam1", "data", name)
            right = _load_gray(right_path) if os.path.exists(right_path) else None
            pose = None
            if self.gt:
                while j + 1 < len(self.gt) and abs(self.gt[j + 1][0] - stamp) <= abs(self.gt[j][0] - stamp):
                    j += 1
                if abs(self.gt[j][0] - stamp) < 0.05:
                    pose = self.gt[j][1]
            yield Frame(stamp=stamp, gray=gray, right=right, gt_pose=pose)


# ----------------------------------------------------------------- CID-SIMS


class CidSimsDataset:
    """CID-SIMS ground-robot RGB-D sequences.

    Capability parity: tools/CidSimsDataset/main.cpp — layout is
    ``color/``+``depth/`` directories of stamp-named images (main.cpp:163),
    ``groundtruth.txt`` in TUM format, ``odom.txt`` with 14-column wheel
    velocity rows dead-reckoned into planar odometry poses (vx at column 8,
    vtheta at column 13 — main.cpp:189-223), and ``imu.txt`` gyro+accel
    samples for Madgwick/complementary gravity alignment (main.cpp:232).
    Fixed RealSense calibration from the published calibration.yaml
    (main.cpp:272).
    """

    CALIB = (386.52199190267083, 387.32300428823663,
             326.5103569741365, 237.40293732598795)

    def __init__(self, root: str, depth_factor: float = 1000.0,
                 use_odom: bool = False, use_imu: bool = False,
                 max_time_diff: float = 0.1):
        self.root = root
        self.depth_factor = depth_factor
        self.max_time_diff = max_time_diff

        def stamped_dir(sub):
            d = os.path.join(root, sub)
            out = []
            for name in sorted(os.listdir(d)):
                stem = os.path.splitext(name)[0]
                try:
                    out.append((float(stem), os.path.join(sub, name)))
                except ValueError:
                    continue
            return out

        color = stamped_dir("color")
        depth = stamped_dir("depth")
        self.pairs = _associate(color, depth, max_dt=max_time_diff)
        if not self.pairs:
            raise FileNotFoundError(f"no associated color/depth in {root}")
        gt_path = os.path.join(root, "groundtruth.txt")
        self.gt = _read_tum_gt(gt_path) if os.path.exists(gt_path) else []

        # wheel odometry: dead-reckon the 14-column velocity rows
        self.odom: List[Tuple[float, np.ndarray]] = []
        odom_path = os.path.join(root, "odom.txt")
        if use_odom and os.path.exists(odom_path):
            x = y = theta = 0.0
            prev = None
            with open(odom_path) as f:
                for line in f:
                    vals = line.replace(",", " ").split()
                    if len(vals) != 14:
                        continue
                    stamp = float(vals[0])
                    if prev is None:
                        prev = stamp
                    dt = stamp - prev
                    vx, vtheta = float(vals[8]), float(vals[13])
                    x += vx * np.cos(theta) * dt
                    y += vx * np.sin(theta) * dt
                    theta += vtheta * dt
                    prev = stamp
                    c, s = np.cos(theta), np.sin(theta)
                    pose = np.asarray([[c, -s, 0, x], [s, c, 0, y],
                                       [0, 0, 1, 0]], np.float32)
                    self.odom.append((stamp, pose))

        self.imu: List[Tuple[float, np.ndarray, np.ndarray]] = []
        imu_path = os.path.join(root, "imu.txt")
        if use_imu and os.path.exists(imu_path):
            with open(imu_path) as f:
                for line in f:
                    line = line.strip()
                    if not line or line.startswith("#"):
                        continue
                    vals = [float(v) for v in line.replace(",", " ").split()]
                    if len(vals) < 7:
                        continue
                    self.imu.append((vals[0],
                                     np.asarray(vals[1:4], np.float32),
                                     np.asarray(vals[4:7], np.float32)))

        g0 = _load_gray(os.path.join(root, self.pairs[0][1]))
        H, W = g0.shape
        fx, fy, cx, cy = self.CALIB
        # published calibration is for 640x480; scale to the actual size
        sx, sy = W / 640.0, H / 480.0
        self.camera = C.CameraModel.make(fx * sx, fy * sy, cx * sx, cy * sy,
                                         W, H)
        self._first = g0

    def __len__(self):
        return len(self.pairs)

    def __iter__(self) -> Iterator[Frame]:
        j = k = m = 0
        prev_imu_cut = -np.inf
        for i, (stamp, rgb_rel, depth_rel) in enumerate(self.pairs):
            gray = self._first if i == 0 \
                else _load_gray(os.path.join(self.root, rgb_rel))
            depth = _load_depth_png(os.path.join(self.root, depth_rel),
                                    self.depth_factor)
            pose = None
            if self.gt:
                while j + 1 < len(self.gt) and \
                        abs(self.gt[j + 1][0] - stamp) <= abs(self.gt[j][0] - stamp):
                    j += 1
                if abs(self.gt[j][0] - stamp) < self.max_time_diff:
                    pose = self.gt[j][1]
            odom_pose = None
            if self.odom:
                while k + 1 < len(self.odom) and \
                        abs(self.odom[k + 1][0] - stamp) <= abs(self.odom[k][0] - stamp):
                    k += 1
                if abs(self.odom[k][0] - stamp) < self.max_time_diff:
                    odom_pose = self.odom[k][1]
            imu_batch = None
            if self.imu:
                imu_batch = []
                while m < len(self.imu) and self.imu[m][0] <= stamp:
                    if self.imu[m][0] > prev_imu_cut:
                        imu_batch.append(self.imu[m])
                    m += 1
                prev_imu_cut = stamp
            yield Frame(stamp=stamp, gray=gray, depth=depth, gt_pose=pose,
                        odom_pose=odom_pose, imu=imu_batch)
