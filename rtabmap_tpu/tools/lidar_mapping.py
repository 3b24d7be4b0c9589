"""LiDAR mapping pipeline: scan odometry + proximity closures + graph opt.

Capability parity: the reference's LidarMapping example
(/root/reference/examples/LidarMapping/main.cpp — Velodyne stream ->
ICP odometry (Reg/Strategy=1, OdometryF2M scan map) -> Rtabmap with scan
proximity detection (RGBD/ProximityBySpace) -> occupancy/point-cloud map).

TPU-native composition: OdometryScanF2M (jitted ICP tick) provides the
odometry chain; loop closures come from pose-proximity gating + the same
jitted ``register_scans`` used by the engine's scan proximity path;
the pose graph is solved with optim.pose_graph (GN/PCG on device); maps
are assembled with the block-sparse voxel map and 2D occupancy grid.
"""
from __future__ import annotations

from typing import Dict, Iterable, Optional, Tuple

import numpy as np
import jax.numpy as jnp


def run_lidar_mapping(scans: Iterable[Tuple[np.ndarray, np.ndarray]],
                      params=None,
                      gt_poses: Optional[np.ndarray] = None,
                      proximity_radius: float = 1.0,
                      proximity_min_separation: int = 10,
                      voxel: float = 0.1,
                      map_capacity: int = 2048,
                      verbose: bool = False) -> Dict:
    """Run the full LiDAR SLAM pipeline over an iterable of
    ``(points (N,3) sensor-frame, valid (N,))`` scans."""
    from rtabmap_tpu.maps.voxel import VoxelOccupancyMap
    from rtabmap_tpu.odometry.scan_f2m import OdometryScanF2M
    from rtabmap_tpu.ops.icp import register_scans
    from rtabmap_tpu.optim import pose_graph as PG
    from rtabmap_tpu.utils.params import Parameters

    p = params or Parameters({
        "Icp/MaxCorrespondenceDistance": 0.5,
        "Icp/Iterations": 15,
        "Icp/CorrespondenceRatio": 0.2,
    })
    odom = OdometryScanF2M(params=p, map_capacity=map_capacity,
                           scan_voxel=voxel / 2)

    node_poses: Dict[int, np.ndarray] = {}
    node_scans: Dict[int, Tuple[jnp.ndarray, jnp.ndarray]] = {}
    ef, et, meas, infos = [], [], [], []
    closures = []
    lost = 0

    for i, (pts, valid) in enumerate(scans):
        pts = jnp.asarray(pts, jnp.float32)
        valid = jnp.asarray(valid, bool)
        pose, cov, info = odom.process(pts, valid)
        if pose is None:
            lost += 1
            continue
        nid = len(node_poses)
        node_poses[nid] = np.asarray(pose)
        node_scans[nid] = (pts, valid)
        if nid > 0:
            from rtabmap_tpu.geometry import transform as TT

            t_ab = TT.relative(jnp.asarray(node_poses[nid - 1]), pose)
            ef.append(nid - 1)
            et.append(nid)
            meas.append(np.asarray(t_ab))
            infos.append(np.eye(6) * 100.0)

        # proximity loop closures against older nodes within radius
        cur_t = node_poses[nid][:, 3]
        for j in range(0, nid - proximity_min_separation):
            if np.linalg.norm(node_poses[j][:, 3] - cur_t) > proximity_radius:
                continue
            from rtabmap_tpu.geometry import transform as TT

            guess = TT.relative(jnp.asarray(node_poses[j]), jnp.asarray(node_poses[nid]))
            sj = node_scans[j]
            res, icp_cov = register_scans(
                pts, valid, sj[0], sj[1], guess=guess, voxel=voxel / 2,
                max_corr_dist=float(p["Icp/MaxCorrespondenceDistance"]),
                iters=int(p["Icp/Iterations"]))
            if bool(res.valid):
                # res.transform maps current scan into node j's frame
                ef.append(j)
                et.append(nid)
                meas.append(np.asarray(res.transform))
                infos.append(np.linalg.inv(np.asarray(icp_cov) + 1e-9 * np.eye(6)))
                closures.append((j, nid))
                if verbose:
                    print(f"loop closure {j} -> {nid} "
                          f"(ratio {float(res.correspondence_ratio):.2f})")
            break  # at most one proximity registration per frame

    out: Dict = {"nodes": len(node_poses), "closures": closures, "lost": lost}
    if len(node_poses) < 2:
        out["poses"] = node_poses
        return out

    g = PG.make_graph(
        jnp.asarray(np.stack([node_poses[i] for i in sorted(node_poses)])),
        jnp.asarray(np.asarray(ef, np.int32)),
        jnp.asarray(np.asarray(et, np.int32)),
        jnp.asarray(np.stack(meas)),
        jnp.asarray(np.stack(infos)))
    g_opt, _chi2 = PG.optimize(g, iters=20)
    opt_poses = {i: np.asarray(g_opt.poses[i]) for i in sorted(node_poses)}

    vox = VoxelOccupancyMap(voxel=voxel)
    for i in sorted(node_poses):
        pts, valid = node_scans[i]
        vox.update(i, opt_poses[i], pts, valid)
    occ_xyz, occ_p, _ = vox.occupied_voxels()
    out.update(poses=opt_poses, odom_poses=node_poses,
               occupied_voxels=int(occ_xyz.shape[0]),
               voxel_map=vox)

    if gt_poses is not None:
        from rtabmap_tpu.utils import metrics

        est = jnp.asarray(np.stack([opt_poses[i] for i in sorted(opt_poses)]))
        n = min(est.shape[0], len(gt_poses))
        out["ate_slam"] = float(metrics.ate_rmse(est[:n], jnp.asarray(gt_poses[:n])))
        odo = jnp.asarray(np.stack([node_poses[i] for i in sorted(node_poses)]))
        out["ate_odom"] = float(metrics.ate_rmse(odo[:n], jnp.asarray(gt_poses[:n])))
    return out


def run_synthetic(n_frames: int = 40, radius: float = 2.0,
                  n_azimuth: int = 180, n_rings: int = 6,
                  noise: float = 0.0, verbose: bool = False) -> Dict:
    """Drive the pipeline on the analytic box-room LiDAR simulator."""
    import jax

    from rtabmap_tpu.datasets import synthetic as S

    poses = S.lidar_trajectory(n_frames, radius=radius)
    key = jax.random.PRNGKey(0)

    def gen():
        nonlocal key
        for i in range(n_frames):
            key, sub = jax.random.split(key)
            yield S.lidar_scan(poses[i], n_azimuth=n_azimuth, n_rings=n_rings,
                               noise=noise, key=sub)

    return run_lidar_mapping(gen(), gt_poses=np.asarray(poses), verbose=verbose)
