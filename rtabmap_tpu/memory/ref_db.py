"""Read-only importer for reference-format RTAB-Map databases.

Opens a real ``.db`` produced by introlab/rtabmap (schema:
/root/reference/corelib/src/resources/DatabaseSchema.sql.in:16-130) and
exposes its nodes, links, features, words, calibration, images, scans,
optimized poses, parameters and statistics in this framework's types —
so any reference-recorded database becomes a replay fixture / regression
input instantly (the DBReader role, corelib/src/DBReader.cpp, without
write access).

Blob formats decoded here (all verified against the reference sources):
- poses / link transforms: 12 float32, row-major 3x4
  (Transform.h:41, DBDriverSqlite3 bind of ``pose.data()``).
- link information: 36 float64 row-major 6x6 (DatabaseSchema Link).
- velocity: 6 float32; gps: 6 float64 (DatabaseSchema Node).
- ``compressData2`` blobs: zlib stream followed by THREE trailing int32:
  rows, cols, cv type (Compression.cpp:239-266); decoded with
  :func:`uncompress_mat`.
- calibration (schema >= 0.18): CameraModel::deserialize — 11 int32
  header (versionMajor, versionMinor, versionPatch, type, width, height,
  lenK, lenD, lenR, lenP, lenL) then float64 K/D/R/P and float32 local
  transform (CameraModel.cpp:555-615); older float-array layouts
  [fx,fy,cx,cy,w,h,L(12)] are handled as a fallback
  (DBDriverSqlite3.cpp:1566-1612).
- scan_info (>= 0.18): [format, min_range, max_range, angle_min,
  angle_max, angle_inc, max_pts] float32 + 12-float local transform
  (DBDriverSqlite3.cpp:1697-1719); scan data is a compressData2 cv::Mat
  1xN with 32F channels per LaserScan::Format (LaserScan.h:45-52).
- images: cv::imencode bytes (JPEG/PNG) directly; depth: 16-bit PNG
  (mm) or RVL (rvl_codec.h) — dispatched on the PNG magic.
- Statistics.data / Info.parameters: "Name:value;Name:value" strings
  (Statistics.cpp:42-71, Parameters.cpp:93-107), statistics zlib-wrapped
  via compressData2.
"""
from __future__ import annotations

import sqlite3
import struct
import zlib
from typing import Dict, Iterator, List, Optional, Tuple

import numpy as np

from rtabmap_tpu.memory.memory import Link, Signature

# cv type decoding: depth id -> numpy dtype (CV_MAKETYPE packs channels
# in the high bits: type = depth + ((channels-1) << 3))
_CV_DEPTH = {0: np.uint8, 1: np.int8, 2: np.uint16, 3: np.int16,
             4: np.int32, 5: np.float32, 6: np.float64}

# LaserScan::Format channel counts (LaserScan.h:40-52)
SCAN_CHANNELS = {0: 2, 1: 3, 2: 4, 3: 5, 4: 6, 5: 3, 6: 4, 7: 4, 8: 6,
                 9: 7, 10: 7, 11: 5, 12: 6}


def uncompress_mat(blob: Optional[bytes]) -> Optional[np.ndarray]:
    """Decode a reference ``compressData2`` blob -> 2D numpy array."""
    if blob is None or len(blob) < 12:
        return None
    rows, cols, cvtype = struct.unpack("<iii", blob[-12:])
    depth, channels = cvtype & 7, (cvtype >> 3) + 1
    data = zlib.decompress(blob[:-12])
    arr = np.frombuffer(data, dtype=_CV_DEPTH[depth])
    if channels > 1:
        return arr.reshape(rows, cols, channels)
    return arr.reshape(rows, cols)


def _pose34(blob: Optional[bytes]) -> Optional[np.ndarray]:
    if blob is None or len(blob) < 48:
        return None
    p = np.frombuffer(blob[:48], np.float32).reshape(3, 4).copy()
    return p if np.isfinite(p).all() and np.abs(p).sum() > 0 else None


def _decode_image(blob: Optional[bytes]):
    """JPEG/PNG bytes -> numpy (grayscale float [0,1] or uint16 depth)."""
    if not blob:
        return None
    import io

    from PIL import Image

    img = Image.open(io.BytesIO(bytes(blob)))
    arr = np.asarray(img)
    return arr


def _decode_depth(blob: Optional[bytes], shape=None):
    """Depth blob -> float32 metres. 16-bit PNG (mm), 32F compressData2,
    or RVL (decoded with the native codec; needs the image shape from the
    node's calibration)."""
    if not blob:
        return None
    b = bytes(blob)
    if b[:8] == b"\x89PNG\r\n\x1a\n":
        d = _decode_image(b)
        if d is None:
            return None
        if d.dtype == np.uint16:
            return d.astype(np.float32) / 1000.0
        return d.astype(np.float32)
    m = uncompress_mat(b)
    if m is not None:
        return m.astype(np.float32)
    if shape is not None:
        try:
            from rtabmap_tpu.native import rvl_decompress

            d = rvl_decompress(b, shape)
            return d.astype(np.float32) / 1000.0
        except Exception:
            pass
    return None


class RefDatabase:
    """Read-only view of a reference-format rtabmap ``.db``."""

    def __init__(self, path: str):
        self.path = path
        self.con = sqlite3.connect(f"file:{path}?mode=ro", uri=True)
        self.version = "0.0.0"
        try:
            row = self.con.execute("SELECT version FROM Admin").fetchone()
            if row and row[0]:
                self.version = str(row[0])
        except sqlite3.Error:
            pass

    def close(self):
        self.con.close()

    # ----------------------------------------------------------- graph side
    def node_ids(self) -> List[int]:
        return [r[0] for r in
                self.con.execute("SELECT id FROM Node ORDER BY id")]

    def load_node(self, nid: int) -> Optional[dict]:
        row = self.con.execute(
            "SELECT id, map_id, weight, stamp, pose, ground_truth_pose,"
            " velocity, label, gps FROM Node WHERE id=?", (nid,)).fetchone()
        if row is None:
            return None
        gps = (np.frombuffer(row[8], np.float64).copy()
               if row[8] and len(row[8]) >= 48 else None)
        vel = (np.frombuffer(row[6], np.float32).copy()
               if row[6] and len(row[6]) >= 24 else None)
        return {"id": row[0], "map_id": row[1], "weight": row[2] or 0,
                "stamp": row[3] or 0.0, "pose": _pose34(row[4]),
                "gt_pose": _pose34(row[5]), "velocity": vel,
                "label": row[7] or "", "gps": gps}

    def load_links(self) -> List[Link]:
        out = []
        for f, t, ty, info_b, tr_b in self.con.execute(
                "SELECT from_id, to_id, type, information_matrix, transform"
                " FROM Link"):
            tr = _pose34(tr_b)
            if tr is None:
                continue
            info = (np.frombuffer(info_b, np.float64).reshape(6, 6)
                    .astype(np.float32)
                    if info_b and len(info_b) >= 288 else
                    np.eye(6, dtype=np.float32))
            out.append(Link(f, t, ty, tr, info))
        return out

    def load_features(self, nid: int, k_cap: int = 0):
        """(word_ids (K,), uv (K,2), pts3d (K,3), valid3d (K,), desc
        (K,D) ±1 int8). Binary descriptors (uint8) unpack to 8 bits/byte;
        float descriptors binarize by sign around their median (lossy —
        documented; the reference's float descriptors have no exact ±1
        form)."""
        rows = self.con.execute(
            "SELECT word_id, pos_x, pos_y, depth_x, depth_y, depth_z,"
            " descriptor_size, descriptor FROM Feature WHERE node_id=?"
            " ORDER BY rowid", (nid,)).fetchall()
        if k_cap > 0:
            rows = rows[:k_cap]
        K = len(rows)
        word_ids = np.full((max(K, 1),), -1, np.int32)[:K] if K else \
            np.zeros((0,), np.int32)
        word_ids = np.array([r[0] for r in rows], np.int32) if K else word_ids
        uv = np.array([[r[1], r[2]] for r in rows], np.float32) \
            if K else np.zeros((0, 2), np.float32)
        pts = np.array([[r[3] or 0.0, r[4] or 0.0, r[5] or 0.0]
                        for r in rows], np.float32) \
            if K else np.zeros((0, 3), np.float32)
        valid3d = np.isfinite(pts).all(1) & (np.abs(pts).sum(1) > 0)
        descs = []
        for r in rows:
            d = self._decode_descriptor(r[7], r[6])
            descs.append(d)
        dim = max((d.shape[0] for d in descs if d is not None), default=256)
        desc = np.zeros((K, dim), np.int8)
        for i, d in enumerate(descs):
            if d is not None:
                desc[i, :d.shape[0]] = d[:dim]
        return word_ids, uv, pts, valid3d, desc

    @staticmethod
    def _decode_descriptor(blob, size) -> Optional[np.ndarray]:
        if not blob:
            return None
        b = bytes(blob)
        if size and len(b) == size:            # uint8 binary (ORB/BRIEF)
            bits = np.unpackbits(np.frombuffer(b, np.uint8))
            return (bits.astype(np.int8) * 2 - 1)
        if len(b) % 4 == 0:                    # float descriptor
            f = np.frombuffer(b, np.float32)
            return np.where(f > np.median(f), 1, -1).astype(np.int8)
        return None

    def load_words(self) -> Dict[int, np.ndarray]:
        out = {}
        for wid, size, blob in self.con.execute(
                "SELECT id, descriptor_size, descriptor FROM Word"):
            d = self._decode_descriptor(blob, size)
            if d is not None:
                out[wid] = d
        return out

    # ---------------------------------------------------------- sensor side
    def load_calibration(self, nid: int):
        """First camera's (fx, fy, cx, cy, width, height, local_transform)
        or None."""
        row = self.con.execute(
            "SELECT calibration FROM Data WHERE id=?", (nid,)).fetchone()
        if not row or not row[0]:
            return None
        b = bytes(row[0])
        if len(b) >= 44:
            header = struct.unpack("<11i", b[:44])
            if header[3] == 0 and 0 < header[4] < 100000:  # v0.18 mono
                w, h = header[4], header[5]
                lk, ld, lr, lp, ll = header[6:11]
                off = 44
                K = np.frombuffer(b[off:off + 72], np.float64).reshape(3, 3) \
                    if lk == 9 else None
                off += 8 * lk + 8 * ld + 8 * lr + 8 * lp
                L = np.frombuffer(b[off:off + 48], np.float32).reshape(3, 4) \
                    if ll == 12 else np.eye(3, 4, dtype=np.float32)
                if K is not None:
                    return (float(K[0, 0]), float(K[1, 1]), float(K[0, 2]),
                            float(K[1, 2]), w, h, L.copy())
        f = np.frombuffer(b, np.float32)
        if f.shape[0] >= 18:  # [fx,fy,cx,cy,w,h,L(12)] pre-0.18 layout
            return (float(f[0]), float(f[1]), float(f[2]), float(f[3]),
                    int(f[4]), int(f[5]), f[6:18].reshape(3, 4).copy())
        return None

    def load_image(self, nid: int):
        row = self.con.execute("SELECT image FROM Data WHERE id=?",
                               (nid,)).fetchone()
        if not row or not row[0]:
            return None
        img = _decode_image(bytes(row[0]))
        if img is None:
            return None
        if img.ndim == 3:
            img = img.mean(axis=2)
        return img.astype(np.float32) / 255.0

    def load_depth(self, nid: int):
        row = self.con.execute("SELECT depth FROM Data WHERE id=?",
                               (nid,)).fetchone()
        if not row or not row[0]:
            return None
        shape = None
        cal = self.load_calibration(nid)
        if cal is not None:
            shape = (cal[5], cal[4])  # (height, width)
        return _decode_depth(bytes(row[0]), shape)

    def load_scan(self, nid: int):
        """(points (N,3) float32, format int) or None."""
        row = self.con.execute(
            "SELECT scan, scan_info FROM Data WHERE id=?", (nid,)).fetchone()
        if not row or not row[0]:
            return None
        m = uncompress_mat(bytes(row[0]))
        if m is None:
            return None
        fmt = 5
        if row[1] and len(bytes(row[1])) >= 28:
            fmt = int(np.frombuffer(bytes(row[1])[:4], np.float32)[0])
        pts = np.asarray(m, np.float32)
        if pts.ndim == 3:
            pts = pts.reshape(-1, pts.shape[2])
        ch = SCAN_CHANNELS.get(fmt, pts.shape[-1])
        if pts.ndim == 1:
            pts = pts.reshape(-1, ch)
        if fmt in (0, 1, 2):  # 2D formats: (x, y[, ...]) -> z = 0
            xyz = np.zeros((pts.shape[0], 3), np.float32)
            xyz[:, :2] = pts[:, :2]
        else:
            xyz = pts[:, :3]
        return xyz.copy(), fmt

    # ----------------------------------------------------------- admin side
    def load_parameters(self) -> Dict[str, str]:
        try:
            row = self.con.execute(
                "SELECT parameters FROM Info ORDER BY time_enter DESC"
            ).fetchone()
        except sqlite3.Error:
            return {}
        out = {}
        if row and row[0]:
            for kv in str(row[0]).split(";"):
                if ":" in kv:
                    k, v = kv.split(":", 1)
                    out[k.strip()] = v.strip()
        return out

    def load_optimized_poses(self) -> Dict[int, np.ndarray]:
        try:
            row = self.con.execute(
                "SELECT opt_ids, opt_poses FROM Admin").fetchone()
        except sqlite3.Error:
            return {}
        if not row or not row[0] or not row[1]:
            return {}
        ids = uncompress_mat(bytes(row[0]))
        poses = uncompress_mat(bytes(row[1]))
        if ids is None or poses is None:
            return {}
        ids = np.asarray(ids).ravel().astype(np.int64)
        poses = np.asarray(poses, np.float32).reshape(-1, 3, 4)
        return {int(i): poses[k] for k, i in enumerate(ids)
                if k < poses.shape[0]}

    def load_statistics(self) -> List[Tuple[int, float, Dict[str, float]]]:
        out = []
        try:
            rows = self.con.execute(
                "SELECT id, stamp, data FROM Statistics ORDER BY id")
        except sqlite3.Error:
            return out
        for nid, stamp, blob in rows:
            d = {}
            if blob:
                m = uncompress_mat(bytes(blob))
                if m is not None:
                    text = m.tobytes().decode("utf-8", "replace").rstrip("\x00")
                    for kv in text.split(";"):
                        if ":" in kv:
                            k, v = kv.rsplit(":", 1)
                            try:
                                d[k] = float(v)
                            except ValueError:
                                pass
            out.append((nid, stamp or 0.0, d))
        return out

    # ------------------------------------------------------------- importers
    def to_signature(self, nid: int, k_cap: int = 0) -> Optional[Signature]:
        """Node -> this framework's Signature (words, uv, 3D, links)."""
        n = self.load_node(nid)
        if n is None or n["pose"] is None:
            return None
        word_ids, uv, pts, valid3d, desc = self.load_features(nid, k_cap)
        sig = Signature(
            id=n["id"], map_id=n["map_id"], stamp=n["stamp"],
            pose=n["pose"], weight=n["weight"], label=n["label"],
            word_ids=word_ids, desc=desc, uv=uv, pts3d=pts,
            valid3d=valid3d, gt_pose=n["gt_pose"], velocity=n["velocity"],
            gps=n["gps"], in_ltm=True)
        return sig

    def load_all(self, k_cap: int = 0):
        """(signatures {id: Signature} with links attached, optimized
        poses, parameters) — the whole graph as replay/regression input."""
        sigs = {}
        for nid in self.node_ids():
            s = self.to_signature(nid, k_cap)
            if s is not None:
                sigs[nid] = s
        for lk in self.load_links():
            if lk.from_id in sigs:
                sigs[lk.from_id].links[lk.to_id] = lk
            if lk.to_id in sigs and lk.to_id >= 0:
                inv = Link(lk.to_id, lk.from_id, lk.type,
                           _invert34(lk.transform), lk.information)
                sigs[lk.to_id].links[lk.from_id] = inv
        return sigs, self.load_optimized_poses(), self.load_parameters()

    def frames(self, max_frames: int = 0) -> Iterator[dict]:
        """DBReader-style replay: yields dicts with gray/depth/stamp/
        odom pose/gt per node carrying image data."""
        n = 0
        for nid in self.node_ids():
            node = self.load_node(nid)
            if node is None or node["pose"] is None:
                continue
            gray = self.load_image(nid)
            if gray is None:
                continue
            yield {"id": nid, "gray": gray, "depth": self.load_depth(nid),
                   "stamp": node["stamp"], "odom_pose": node["pose"],
                   "gt_pose": node["gt_pose"],
                   "calibration": self.load_calibration(nid)}
            n += 1
            if max_frames and n >= max_frames:
                return


def _invert34(t: np.ndarray) -> np.ndarray:
    R = t[:3, :3]
    out = np.zeros((3, 4), np.float32)
    out[:3, :3] = R.T
    out[:3, 3] = -R.T @ t[:3, 3]
    return out
