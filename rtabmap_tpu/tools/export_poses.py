"""Trajectory export/import in the reference's 5 formats.

Capability parity: ``graph::exportPoses/importPoses``
(/root/reference/corelib/include/rtabmap/core/Graph.h:49-64 — formats:
0=raw 3x4 rows (KITTI-style), 1=RGBD-SLAM, 2=KITTI, 3=TORO, 4=g2o;
Rtabmap::exportPoses Rtabmap.h:170-175).
"""
from __future__ import annotations

from typing import Dict, List, Optional, Sequence

import numpy as np


def export_poses(path: str, fmt: int, poses: Dict[int, np.ndarray],
                 stamps: Optional[Dict[int, float]] = None,
                 links=None) -> None:
    import jax.numpy as jnp

    from rtabmap_tpu.geometry import transform as T

    ids = sorted(poses)
    with open(path, "w") as f:
        if fmt in (0, 2):  # raw / KITTI: 12 values per row
            for i in ids:
                f.write(" ".join(f"{v:.6f}" for v in np.asarray(poses[i]).reshape(-1)) + "\n")
        elif fmt == 1:  # RGBD-SLAM / TUM: stamp x y z qx qy qz qw
            for i in ids:
                P = jnp.asarray(poses[i])
                q = np.asarray(T.to_quaternion(P))
                t = np.asarray(T.translation(P))
                stamp = (stamps or {}).get(i, float(i))
                f.write(f"{stamp:.6f} {t[0]:.6f} {t[1]:.6f} {t[2]:.6f} "
                        f"{q[0]:.6f} {q[1]:.6f} {q[2]:.6f} {q[3]:.6f}\n")
        elif fmt == 3:  # TORO
            for i in ids:
                v = np.asarray(T.to_xyzrpy(jnp.asarray(poses[i])))
                f.write(f"VERTEX3 {i} " + " ".join(f"{x:.6f}" for x in v) + "\n")
            for lk in links or []:
                v = np.asarray(T.to_xyzrpy(jnp.asarray(lk.transform)))
                f.write(f"EDGE3 {lk.from_id} {lk.to_id} "
                        + " ".join(f"{x:.6f}" for x in v) + "\n")
        elif fmt == 4:  # g2o
            for i in ids:
                P = jnp.asarray(poses[i])
                q = np.asarray(T.to_quaternion(P))
                t = np.asarray(T.translation(P))
                f.write(f"VERTEX_SE3:QUAT {i} {t[0]:.6f} {t[1]:.6f} {t[2]:.6f} "
                        f"{q[0]:.6f} {q[1]:.6f} {q[2]:.6f} {q[3]:.6f}\n")
            for lk in links or []:
                P = jnp.asarray(lk.transform)
                q = np.asarray(T.to_quaternion(P))
                t = np.asarray(T.translation(P))
                info = np.asarray(lk.information)
                upper = " ".join(f"{info[r, c]:.6f}" for r in range(6) for c in range(r, 6))
                f.write(f"EDGE_SE3:QUAT {lk.from_id} {lk.to_id} "
                        f"{t[0]:.6f} {t[1]:.6f} {t[2]:.6f} "
                        f"{q[0]:.6f} {q[1]:.6f} {q[2]:.6f} {q[3]:.6f} {upper}\n")
        else:
            raise ValueError(f"unknown format {fmt}")


def import_poses(path: str, fmt: int) -> Dict[int, np.ndarray]:
    import jax.numpy as jnp

    from rtabmap_tpu.geometry import transform as T

    poses: Dict[int, np.ndarray] = {}
    with open(path) as f:
        lines = [l.strip() for l in f if l.strip() and not l.startswith("#")]
    if fmt in (0, 2):
        for i, line in enumerate(lines):
            poses[i] = np.asarray([float(x) for x in line.split()], np.float32).reshape(3, 4)
    elif fmt == 1:
        for i, line in enumerate(lines):
            v = [float(x) for x in line.split()]
            poses[i] = np.asarray(T.from_quaternion(
                jnp.asarray(v[4:8], jnp.float32), jnp.asarray(v[1:4], jnp.float32)))
    elif fmt == 3:
        for line in lines:
            parts = line.split()
            if parts[0] == "VERTEX3":
                poses[int(parts[1])] = np.asarray(
                    T.from_xyzrpy(jnp.asarray([float(x) for x in parts[2:8]])))
    elif fmt == 4:
        for line in lines:
            parts = line.split()
            if parts[0] == "VERTEX_SE3:QUAT":
                t = jnp.asarray([float(x) for x in parts[2:5]])
                q = jnp.asarray([float(x) for x in parts[5:9]])
                poses[int(parts[1])] = np.asarray(T.from_quaternion(q, t))
    else:
        raise ValueError(f"unknown format {fmt}")
    return poses
