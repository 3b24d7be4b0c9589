"""WifiMapping example: user-data channels riding the map graph.

Capability parity: /root/reference/examples/WifiMapping — a side-channel
sensor (wifi RSSI dBm) is attached to graph nodes as opaque user data
(SensorData::setUserData), persists with the map, and is rendered at the
optimized node positions afterward. Here: a synthetic RGB-D loop is
mapped while a simulated access point's RSSI (log-distance path loss) is
stamped on every node; after optimization the tool exports the signal
map as a colored PLY cloud + CSV at the optimized poses.

Run: ``python -m rtabmap_tpu.tools.wifi_mapping [out_dir] [n_frames]``.
"""
from __future__ import annotations

import json
import os
import struct
import sys

import numpy as np


def rssi_at(pos, ap_pos, tx_dbm: float = -30.0, path_loss_exp: float = 2.2):
    """Log-distance path-loss model."""
    d = float(np.linalg.norm(np.asarray(pos) - np.asarray(ap_pos)))
    return tx_dbm - 10.0 * path_loss_exp * np.log10(max(d, 0.1))


def pack_wifi(dbm: float, stamp: float) -> bytes:
    """The reference packs wifi level as an opaque cv::Mat user-data blob;
    ours is an 8-byte (float dbm, float stamp) struct."""
    return struct.pack("<ff", float(dbm), float(stamp))


def unpack_wifi(blob: bytes):
    dbm, stamp = struct.unpack("<ff", blob[:8])
    return dbm, stamp


def run(out_dir: str = "/tmp/wifi_mapping", n_frames: int = 24,
        verbose: bool = True):
    import jax

    if os.environ.get("RTABMAP_TPU_FORCE_CPU"):
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from rtabmap_tpu.core.frame import extract_features
    from rtabmap_tpu.datasets import synthetic as S
    from rtabmap_tpu.engine.rtabmap import Rtabmap
    from rtabmap_tpu.geometry import camera as C
    from rtabmap_tpu.maps.mesh import write_ply
    from rtabmap_tpu.memory.db import Database
    from rtabmap_tpu.odometry.f2m import OdometryF2M
    from rtabmap_tpu.utils.params import Parameters

    os.makedirs(out_dir, exist_ok=True)
    cam = C.CameraModel.make(300.0, 300.0, 160.0, 120.0, 320, 240)
    p = Parameters().set("Rtabmap/DetectionRate", 0)
    db = Database(os.path.join(out_dir, "wifi.db"))
    odom = OdometryF2M(cam, p)
    slam = Rtabmap(cam, p, db=db, node_capacity=256, words_per_frame=256)
    extract = jax.jit(lambda g, d: extract_features(g, d, cam, 256))

    from rtabmap_tpu.geometry import transform as T

    # dense sampling: VO needs small inter-frame baselines
    poses = S.loop_trajectory(max(4 * n_frames, 32))[:n_frames]
    # the map lives in the odometry frame (first pose = identity); define
    # the access point there so exported positions and RSSI agree
    ap = np.array([1.5, 0.0, 0.0])
    for i in range(n_frames):
        g, d = S.render(poses[i], cam)
        feat = extract(g, d)
        pose, cov, info = odom.process(feat)
        if pose is None:
            pose, cov = odom.pose, np.eye(6) * 9999.0
        rel = np.asarray(T.relative(jnp.asarray(poses[0]),
                                    jnp.asarray(poses[i])))
        dbm = rssi_at(rel[:, 3], ap)
        slam.process(feat, np.asarray(pose), np.asarray(cov),
                     stamp=float(i) * 0.1,
                     user_data=pack_wifi(dbm, float(i) * 0.1))

    opt = slam.get_optimized_poses()
    # read the channel back through the persistence layer
    slam.close()
    db.flush()
    rows = []
    for sid in sorted(opt):
        sig = db.load_signature(sid)
        if sig is None or sig.user_data is None:
            continue
        dbm, stamp = unpack_wifi(sig.user_data)
        rows.append((sid, *np.asarray(opt[sid])[:, 3].tolist(), dbm))
    db.close()

    # colored signal cloud at optimized node positions (blue=weak,red=hot)
    pts = np.asarray([[r[1], r[2], r[3]] for r in rows], np.float32)
    dbms = np.asarray([r[4] for r in rows], np.float32)
    lo, hi = float(dbms.min()), float(dbms.max())
    tt = (dbms - lo) / max(hi - lo, 1e-6)
    colors = np.stack([tt * 255, 40 + 0 * tt, (1 - tt) * 255],
                      axis=-1).astype(np.uint8)
    ply = os.path.join(out_dir, "wifi_map.ply")
    write_ply(ply, pts, colors=colors)
    csv = os.path.join(out_dir, "wifi_map.csv")
    with open(csv, "w") as fp:
        fp.write("node,x,y,z,dbm\n")
        for r in rows:
            fp.write(f"{r[0]},{r[1]:.4f},{r[2]:.4f},{r[3]:.4f},{r[4]:.2f}\n")
    if verbose:
        print(json.dumps({"nodes": len(rows), "dbm_range": [lo, hi],
                          "ply": ply, "csv": csv}))
    return rows


if __name__ == "__main__":
    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/wifi_mapping"
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 24
    run(out, n)
