"""DBReader: replay a map store as a sensor stream.

Capability parity: the reference's ``DBReader``
(/root/reference/corelib/src/DBReader.cpp — replays a recorded .db as a
camera, preserving stamps/odometry; the closest thing the reference has
to a replay fixture, SURVEY.md §4). Yields (FrameFeatures, odom_pose,
covariance, stamp) tuples consumable by the engine or the pipeline.
"""
from __future__ import annotations

from typing import Iterator, Optional, Tuple

import numpy as np

from rtabmap_tpu.core.frame import FrameFeatures


class DBReader:
    def __init__(self, db, ignore_odometry: bool = False):
        self.db = db
        self.ignore_odometry = ignore_odometry

    def __iter__(self) -> Iterator[Tuple[FrameFeatures, np.ndarray, np.ndarray, float]]:
        for sid in self.db.all_node_ids():
            sig = self.db.load_signature(sid)
            if sig is None or sig.word_ids is None:
                continue
            frame = FrameFeatures(
                uv=sig.uv, desc=sig.desc, pts3d=sig.pts3d,
                valid=(np.abs(sig.desc).sum(-1) > 0),
                valid3d=sig.valid3d,
                angle=np.zeros(len(sig.uv), np.float32),
                response=np.zeros(len(sig.uv), np.float32),
            )
            pose = np.eye(3, 4, dtype=np.float32) if self.ignore_odometry else sig.pose
            yield frame, pose, np.eye(6, dtype=np.float32) * 1e-4, sig.stamp


def database_recovery(corrupt_path: str, out_path: str) -> dict:
    """Rebuild a usable map store from a possibly-unclosed database
    (reference: databaseRecovery Recovery.h:47 / rtabmap-recovery tool):
    copy every readable node/link, recompute optimized poses from the
    odometry chain + surviving links, write a fresh Admin record.
    """
    import jax.numpy as jnp

    from rtabmap_tpu.geometry import transform as T
    from rtabmap_tpu.memory.db import Database
    from rtabmap_tpu.optim import pose_graph as PG

    src = Database(corrupt_path, async_writes=False)
    dst = Database(out_path, async_writes=False)
    n_nodes = n_links = 0
    ids = []
    for sid in src.all_node_ids():
        try:
            sig = src.load_signature(sid)
        except Exception:
            continue
        if sig is None or sig.pose is None:
            continue
        dst.save_signature(sig)
        ids.append(sid)
        n_nodes += 1
        n_links += len(sig.links)

    # re-optimize from scratch
    opt = {}
    if len(ids) >= 2:
        id_to_idx = {i: k for k, i in enumerate(ids)}
        poses, ef, et, meas, info = [], [], [], [], []
        for i in ids:
            sig = dst.load_signature(i)
            poses.append(sig.pose)
            for j, lk in sig.links.items():
                if j in id_to_idx and lk.from_id == i:
                    ef.append(id_to_idx[i])
                    et.append(id_to_idx[j])
                    meas.append(lk.transform)
                    info.append(lk.information if lk.information is not None
                                else np.eye(6, dtype=np.float32))
        if ef:
            g = PG.make_graph(jnp.asarray(np.stack(poses)),
                              jnp.asarray(ef, jnp.int32), jnp.asarray(et, jnp.int32),
                              jnp.asarray(np.stack(meas)), jnp.asarray(np.stack(info)),
                              root=0)
            out, _ = PG.optimize(g, iters=10)
            arr = np.asarray(out.poses)
            if np.isfinite(arr).all():
                opt = {i: arr[k] for k, i in enumerate(ids)}
        if not opt:
            opt = {i: np.asarray(dst.load_signature(i).pose) for i in ids}
    admin = {}
    try:
        admin = src.load_admin()
    except Exception:
        pass
    dst.save_admin(params=admin.get("parameters", {}), optimized_poses=opt)
    src.close()
    dst.close()
    return {"nodes": n_nodes, "links": n_links, "optimized": len(opt)}
