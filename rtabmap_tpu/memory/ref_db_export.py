"""Write-side exporter to reference-format RTAB-Map databases.

The inverse of :mod:`rtabmap_tpu.memory.ref_db`: a map built by THIS
framework is written out as a ``.db`` with the reference's tables and
blob formats (schema:
/root/reference/corelib/src/resources/DatabaseSchema.sql.in:16-130), so
the reference's own tools (rtabmap-databaseViewer, rtabmap-report,
rtabmap-reprocess) can open it — the cross-validation direction the
read-only importer cannot provide.

Encodings mirror the decoders in ref_db.py line for line (and therefore
the reference sources they were verified against):

- poses / link transforms: 12 float32 row-major 3x4 (Transform.h:41).
- link information matrices: 36 float64 row-major 6x6.
- velocity 6 float32; gps 6 float64 (DatabaseSchema Node comments).
- ``compressData2`` blobs: zlib stream + THREE trailing int32
  (rows, cols, cv type) — Compression.cpp:239-266.
- calibration: the >=0.18 ``CameraModel::serialize`` layout — 11 int32
  header (vMajor, vMinor, vPatch, type=0, width, height, lenK=9, lenD,
  lenR=9, lenP=12, lenL=12), float64 K/D/R/P, float32 local transform
  (CameraModel.cpp:509-553).
- images: JPEG bytes (cv::imencode role); depth: 16-bit PNG in
  millimetres (the reference's default depth codec, util2d).
- scans: compressData2 of a 1xN float32 multi-channel mat + the
  >=0.18 ``scan_info`` header [format, min_range, max_range, angle_min,
  angle_max, angle_inc, max_pts] float32 + 12-float local transform
  (DBDriverSqlite3.cpp:1697-1719).
- Statistics.data: "Name:value;"-joined string, zlib-wrapped via
  compressData2 of a 1xN CV_8U mat (Statistics.cpp:42-71).
- descriptors: ±1 int8 rows pack to binary uint8 (np.packbits) — the
  reference's CV_8U binary descriptor rows (ORB/BRIEF convention).
"""
from __future__ import annotations

import io
import sqlite3
import struct
import zlib
from typing import Dict, Iterable, Optional

import numpy as np

_CV_DEPTH_CODE = {np.dtype(np.uint8): 0, np.dtype(np.int8): 1,
                  np.dtype(np.uint16): 2, np.dtype(np.int16): 3,
                  np.dtype(np.int32): 4, np.dtype(np.float32): 5,
                  np.dtype(np.float64): 6}

SCHEMA = """
CREATE TABLE Node (
    id INTEGER NOT NULL, map_id INTEGER NOT NULL, weight INTEGER,
    stamp FLOAT, pose BLOB, ground_truth_pose BLOB, velocity BLOB,
    label TEXT, gps BLOB, env_sensors BLOB, time_enter DATE,
    PRIMARY KEY (id));
CREATE TABLE Data (
    id INTEGER NOT NULL, image BLOB, depth BLOB, depth_confidence BLOB,
    calibration BLOB, scan BLOB, scan_info BLOB, ground_cells BLOB,
    obstacle_cells BLOB, empty_cells BLOB, cell_size FLOAT,
    view_point_x FLOAT, view_point_y FLOAT, view_point_z FLOAT,
    user_data BLOB, time_enter DATE, PRIMARY KEY (id));
CREATE TABLE Link (
    from_id INTEGER NOT NULL, to_id INTEGER NOT NULL,
    type INTEGER NOT NULL, information_matrix BLOB NOT NULL,
    transform BLOB, user_data BLOB);
CREATE TABLE Word (
    id INTEGER NOT NULL, descriptor_size INTEGER NOT NULL,
    descriptor BLOB NOT NULL, time_enter DATE, PRIMARY KEY (id));
CREATE TABLE Feature (
    node_id INTEGER NOT NULL, word_id INTEGER NOT NULL,
    pos_x FLOAT NOT NULL, pos_y FLOAT NOT NULL, size INTEGER NOT NULL,
    dir FLOAT NOT NULL, response FLOAT NOT NULL, octave INTEGER NOT NULL,
    depth_x FLOAT, depth_y FLOAT, depth_z FLOAT,
    descriptor_size INTEGER, descriptor BLOB);
CREATE TABLE GlobalDescriptor (
    node_id INTEGER NOT NULL, type INTEGER NOT NULL, info BLOB,
    data BLOB NOT NULL);
CREATE TABLE Info (
    STM_size INTEGER, last_sign_added INTEGER, process_mem_used INTEGER,
    database_mem_used INTEGER, dictionary_size INTEGER, parameters TEXT,
    time_enter DATE);
CREATE TABLE Statistics (
    id INTEGER NOT NULL, stamp FLOAT, data BLOB, wm_state BLOB);
CREATE TABLE Admin (
    version TEXT, preview_image BLOB, opt_cloud BLOB, opt_ids BLOB,
    opt_poses BLOB, opt_last_localization BLOB, opt_polygons_size INTEGER,
    opt_polygons BLOB, opt_tex_coords BLOB, opt_tex_materials BLOB,
    opt_map BLOB, opt_map_x_min FLOAT, opt_map_y_min FLOAT,
    opt_map_resolution FLOAT, time_enter DATE);
"""


def compress_mat(arr: np.ndarray) -> bytes:
    """Inverse of ref_db.uncompress_mat: numpy -> compressData2 blob."""
    arr = np.ascontiguousarray(arr)
    if arr.ndim == 1:
        arr = arr[None, :]
    channels = arr.shape[2] if arr.ndim == 3 else 1
    cvtype = _CV_DEPTH_CODE[arr.dtype] + ((channels - 1) << 3)
    return (zlib.compress(arr.tobytes())
            + struct.pack("<iii", arr.shape[0], arr.shape[1], cvtype))


def _pose_blob(pose) -> Optional[bytes]:
    if pose is None:
        return None
    return np.asarray(pose, np.float32).reshape(3, 4).tobytes()


def _encode_image_jpeg(gray01: np.ndarray) -> bytes:
    from PIL import Image

    a = np.clip(np.asarray(gray01, np.float32) * 255.0, 0, 255
                ).astype(np.uint8)
    buf = io.BytesIO()
    Image.fromarray(a).save(buf, format="JPEG", quality=90)
    return buf.getvalue()


def _encode_depth_png16(depth_m: np.ndarray) -> bytes:
    from PIL import Image

    mm = np.clip(np.asarray(depth_m, np.float32) * 1000.0, 0, 65535
                 ).astype(np.uint16)
    buf = io.BytesIO()
    img = Image.new("I;16", (mm.shape[1], mm.shape[0]))
    img.frombytes(mm.tobytes())
    img.save(buf, format="PNG")
    return buf.getvalue()


def _encode_calibration(fx, fy, cx, cy, width, height,
                        local_transform=None) -> bytes:
    """CameraModel::serialize >=0.18 layout (CameraModel.cpp:509-553):
    11 int32 header + float64 K(9)/D(0)/R(9)/P(12) + float32 L(12)."""
    K = np.array([[fx, 0, cx], [0, fy, cy], [0, 0, 1]], np.float64)
    R = np.eye(3, dtype=np.float64)
    P = np.zeros((3, 4), np.float64)
    P[:3, :3] = K
    L = (np.asarray(local_transform, np.float32).reshape(3, 4)
         if local_transform is not None
         else np.eye(3, 4, dtype=np.float32))
    header = struct.pack("<11i", 0, 23, 0, 0, int(width), int(height),
                         9, 0, 9, 12, 12)
    return (header + K.tobytes() + R.tobytes() + P.tobytes() + L.tobytes())


def _encode_scan_info(fmt: int, local_transform=None,
                      max_pts: int = 0, max_range: float = 0.0) -> bytes:
    head = np.array([fmt, 0.0, max_range, 0.0, 0.0, 0.0, max_pts],
                    np.float32)
    L = (np.asarray(local_transform, np.float32).reshape(3, 4)
         if local_transform is not None
         else np.eye(3, 4, dtype=np.float32))
    return head.tobytes() + L.tobytes()


def _desc_blob(desc_row: np.ndarray):
    """±1 int8 descriptor -> (nbytes, packed uint8 bits) — the binary
    CV_8U row the reference stores for ORB/BRIEF-family descriptors."""
    bits = (np.asarray(desc_row, np.int8) > 0).astype(np.uint8)
    packed = np.packbits(bits)
    return len(packed), packed.tobytes()


def _stats_string(d: Dict[str, float]) -> bytes:
    s = ";".join(f"{k}:{v}" for k, v in d.items())
    return compress_mat(np.frombuffer(s.encode("utf-8"), np.uint8))


class RefDatabaseWriter:
    """Create a reference-schema ``.db`` and fill it from this
    framework's objects. Use :func:`export_ref_db` for the one-call
    Memory/engine export."""

    def __init__(self, path: str, version: str = "0.23.8"):
        self.con = sqlite3.connect(path)
        self.con.executescript(SCHEMA)
        self.con.execute("INSERT INTO Admin (version) VALUES (?)",
                         (version,))

    def close(self):
        self.con.commit()
        self.con.close()

    def add_signature(self, sig, gray=None, depth=None, calibration=None,
                      scan=None, scan_format: int = 5):
        """Write one Signature's Node/Data/Feature rows. ``calibration``:
        (fx, fy, cx, cy, width, height[, local_transform])."""
        vel = (np.asarray(sig.velocity, np.float32).tobytes()
               if getattr(sig, "velocity", None) is not None else None)
        gps = (np.asarray(sig.gps, np.float64).tobytes()
               if getattr(sig, "gps", None) is not None else None)
        env = None
        if getattr(sig, "env_sensors", None):
            rows = np.array([[e.type, e.value, e.stamp]
                             for e in sig.env_sensors], np.float64)
            env = rows.tobytes()
        self.con.execute(
            "INSERT OR REPLACE INTO Node (id, map_id, weight, stamp, pose,"
            " ground_truth_pose, velocity, label, gps, env_sensors)"
            " VALUES (?,?,?,?,?,?,?,?,?,?)",
            (int(sig.id), int(sig.map_id), int(sig.weight),
             float(sig.stamp), _pose_blob(sig.pose),
             _pose_blob(getattr(sig, "gt_pose", None)), vel,
             sig.label or "", gps, env))

        img_b = _encode_image_jpeg(gray) if gray is not None else None
        dep_b = _encode_depth_png16(depth) if depth is not None else None
        cal_b = (_encode_calibration(*calibration)
                 if calibration is not None else None)
        scan_b = scan_info_b = None
        if scan is not None:
            pts = np.asarray(scan, np.float32)
            scan_b = compress_mat(pts.reshape(1, -1, pts.shape[-1]))
            scan_info_b = _encode_scan_info(scan_format)
        ud = getattr(sig, "user_data", None)
        ud_b = compress_mat(np.frombuffer(bytes(ud), np.uint8)) \
            if ud else None
        self.con.execute(
            "INSERT OR REPLACE INTO Data (id, image, depth, calibration,"
            " scan, scan_info, user_data) VALUES (?,?,?,?,?,?,?)",
            (int(sig.id), img_b, dep_b, cal_b, scan_b, scan_info_b, ud_b))

        if getattr(sig, "global_desc", None) is not None:
            self.con.execute(
                "INSERT INTO GlobalDescriptor (node_id, type, data)"
                " VALUES (?, 1, ?)",
                (int(sig.id),
                 np.asarray(sig.global_desc, np.float32).tobytes()))

        if sig.word_ids is None:
            return
        uv = np.asarray(sig.uv, np.float32) if sig.uv is not None else None
        pts3 = (np.asarray(sig.pts3d, np.float32)
                if sig.pts3d is not None else None)
        ok3 = (np.asarray(sig.valid3d, bool)
               if sig.valid3d is not None else None)
        rows = []
        for k, wid in enumerate(np.asarray(sig.word_ids)):
            if wid < 0:
                continue
            x, y = (float(uv[k, 0]), float(uv[k, 1])) if uv is not None \
                else (0.0, 0.0)
            dx = dy = dz = None
            if pts3 is not None and ok3 is not None and bool(ok3[k]):
                dx, dy, dz = (float(pts3[k, 0]), float(pts3[k, 1]),
                              float(pts3[k, 2]))
            dsz, dblob = (None, None)
            if sig.desc is not None:
                dsz, dblob = _desc_blob(sig.desc[k])
            rows.append((int(sig.id), int(wid), x, y, 7, 0.0, 0.0, 0,
                        dx, dy, dz, dsz, dblob))
        self.con.executemany(
            "INSERT INTO Feature (node_id, word_id, pos_x, pos_y, size,"
            " dir, response, octave, depth_x, depth_y, depth_z,"
            " descriptor_size, descriptor) VALUES"
            " (?,?,?,?,?,?,?,?,?,?,?,?,?)", rows)

    def add_links(self, links: Iterable):
        """Write links (one canonical direction per pair, like the
        reference persists from->to once)."""
        seen = set()
        for lk in links:
            key = (min(lk.from_id, lk.to_id), max(lk.from_id, lk.to_id),
                   lk.type)
            if key in seen:
                continue
            seen.add(key)
            info = (np.asarray(lk.information, np.float64).reshape(6, 6)
                    if lk.information is not None
                    else np.eye(6, dtype=np.float64))
            self.con.execute(
                "INSERT INTO Link (from_id, to_id, type,"
                " information_matrix, transform) VALUES (?,?,?,?,?)",
                (int(lk.from_id), int(lk.to_id), int(lk.type),
                 info.tobytes(), _pose_blob(lk.transform)))

    def add_words(self, words: Dict[int, np.ndarray]):
        for wid, d in words.items():
            dsz, blob = _desc_blob(d)
            self.con.execute(
                "INSERT OR REPLACE INTO Word (id, descriptor_size,"
                " descriptor) VALUES (?,?,?)", (int(wid), dsz, blob))

    def set_parameters(self, params: Dict[str, object],
                       stm_size: int = 0, last_id: int = 0,
                       dict_size: int = 0):
        text = ";".join(f"{k}:{v}" for k, v in params.items())
        self.con.execute(
            "INSERT INTO Info (STM_size, last_sign_added,"
            " dictionary_size, parameters) VALUES (?,?,?,?)",
            (stm_size, last_id, dict_size, text))

    def set_optimized_poses(self, poses: Dict[int, np.ndarray],
                            last_localization=None):
        if not poses:
            return
        ids = sorted(poses)
        id_mat = np.asarray(ids, np.int32).reshape(1, -1)
        pose_mat = np.concatenate(
            [np.asarray(poses[i], np.float32).reshape(3, 4) for i in ids],
            axis=0)
        self.con.execute(
            "UPDATE Admin SET opt_ids=?, opt_poses=?,"
            " opt_last_localization=?",
            (compress_mat(id_mat), compress_mat(pose_mat),
             _pose_blob(last_localization)))

    def add_statistics(self, node_id: int, stamp: float,
                       data: Dict[str, float]):
        self.con.execute(
            "INSERT INTO Statistics (id, stamp, data) VALUES (?,?,?)",
            (int(node_id), float(stamp), _stats_string(data)))


def export_ref_db(out_path: str, signatures: Dict[int, object],
                  optimized_poses: Optional[Dict[int, np.ndarray]] = None,
                  words: Optional[Dict[int, np.ndarray]] = None,
                  parameters: Optional[Dict[str, object]] = None,
                  calibration=None,
                  statistics: Optional[Iterable] = None,
                  frames: Optional[Dict[int, tuple]] = None) -> int:
    """Export a built map to a reference-schema ``.db``.

    ``signatures``: {id: Signature} (links attached);
    ``frames``: optional {id: (gray01, depth_m)} raw data per node;
    ``statistics``: iterable of (node_id, stamp, {name: value}).
    Returns the number of nodes written.
    """
    w = RefDatabaseWriter(out_path)
    n = 0
    for sid in sorted(signatures):
        sig = signatures[sid]
        gray = depth = None
        if frames and sid in frames:
            gray, depth = frames[sid]
        scan, scan_fmt = None, 5
        sc = getattr(sig, "scan", None)
        if sc is not None and hasattr(sc, "data"):
            pts = np.asarray(sc.data, np.float32)
            if hasattr(sc, "valid") and sc.valid is not None:
                pts = pts[np.asarray(sc.valid)]
            if pts.size:
                scan, scan_fmt = pts, int(getattr(sc, "format", 5))
        w.add_signature(sig, gray=gray, depth=depth,
                        calibration=calibration,
                        scan=scan, scan_format=scan_fmt)
        n += 1
    all_links = []
    for sig in signatures.values():
        all_links.extend(sig.links.values())
    w.add_links(all_links)
    if words:
        w.add_words(words)
    if parameters:
        w.set_parameters(parameters, last_id=max(signatures, default=0),
                         dict_size=len(words or ()))
    if optimized_poses:
        w.set_optimized_poses(optimized_poses)
    for nid, stamp, data in (statistics or ()):
        w.add_statistics(nid, stamp, data)
    w.close()
    return n


def export_engine(slam, out_path: str,
                  frames: Optional[Dict[int, tuple]] = None) -> int:
    """Export a live engine's map (reference role: the DB the reference
    writes on close — Memory::close + DBDriver save path)."""
    mem = slam.memory
    cal = None
    cam = getattr(slam, "cam", None)
    if cam is not None:
        cal = (float(cam.fx), float(cam.fy), float(cam.cx), float(cam.cy),
               int(cam.width), int(cam.height))
    words = {}
    vocab = getattr(mem, "vocab", None)
    if vocab is not None:
        try:
            slab = np.asarray(vocab.slab)
            valid = np.asarray(vocab.word_valid)
            for wid in range(min(len(valid), slab.shape[0])):
                if valid[wid]:
                    words[wid] = slab[wid]
        except Exception:
            words = {}
    stats = [(st.ref_id, st.get("Timing/Total/ms", 0.0), dict(st.data))
             for st in getattr(slam, "stats_history", ())
             if getattr(st, "ref_id", 0)]
    # persist only the overridden parameters (the reference stores the
    # full set; the overrides are the information-carrying part and the
    # Info 'parameters' string format is identical)
    params = mem.params.overrides() if hasattr(mem.params, "overrides") \
        else {}
    return export_ref_db(
        out_path, mem.signatures,
        optimized_poses=slam.get_optimized_poses(),
        words=words, parameters=params,
        calibration=cal, statistics=stats, frames=frames)
