"""Evaluation report over map stores — the reference's ``rtabmap-report``.

Capability parity: /root/reference/tools/Report/main.cpp — per-database
trajectory re-optimization from the stored odometry + constraints
(main.cpp:943), ground-truth evaluation (SE(3)-aligned ATE with optional
best-scale search, KITTI segment errors, relative errors, loop-closure
accuracy, main.cpp:985-1160), TUM/KITTI pose exports (`--poses`,
main.cpp:1146), ``report.csv`` (`--report`, main.cpp:1220), LaTeX summary
table (`--latex`, main.cpp:1303), available-statistic listing (`--stats`)
and per-session localization statistics (`--loc` mask / `--loc_delay`,
main.cpp:98/822).  The scale search uses the closed-form Umeyama scale
instead of the reference's 0.900..1.100 sweep (same objective, exact
minimizer).
"""
from __future__ import annotations

import os
from typing import Dict, List, Optional, Tuple

import numpy as np

from rtabmap_tpu.memory.memory import (LINK_GRAVITY, LINK_LANDMARK,
                                       LINK_NEIGHBOR, LINK_NEIGHBOR_MERGED,
                                       LINK_POSE_PRIOR, Link)

_USAGE = """\
Usage: report ["Statistic/Id" ...] [options] path...
  path               map-store database(s) or directory of databases
  --latex            print a LaTeX-formatted results table
  --kitti            compute KITTI benchmark errors
  --relative         compute relative motion error between poses
  --loop             compute relative motion error of loop closures
  --scale            best-scale alignment against ground truth
  --poses            export <db>_slam.txt/_odom.txt/_gt.txt (TUM format,
                     aligned to ground truth)
  --poses_raw        same as --poses without ground-truth alignment
  --gt FILE.txt      external TUM-format ground truth (*.db: use that
                     database's optimized poses)
  --gt_max_t S       max interpolation gap to ground truth (default 1.0 s)
  --stats            list available "Statistic/Id" names and exit
  --report           append evaluation rows to report.csv
  --loc [MASK]       per-session localization statistics for each
                     "Statistic/Id" (mask: 1=min 2=max 4=mean 8=stddev
                     16=total 32=nonnull%)
  --loc_delay S      session split gap for --loc (default 60 s)
  --ignore_inter_nodes  skip weight=-1 intermediate nodes
"""


def _is_db(path: str) -> bool:
    if not os.path.isfile(path):
        return False
    with open(path, "rb") as f:
        return f.read(15) == b"SQLite format 3"


def _collect_dbs(path: str) -> List[str]:
    if os.path.isfile(path):
        return [path] if _is_db(path) else []
    found = []
    for root, _dirs, files in os.walk(path):
        for name in sorted(files):
            p = os.path.join(root, name)
            if name.endswith(".db") and _is_db(p):
                found.append(p)
    return found


def _load_external_gt(path: str) -> Tuple[np.ndarray, np.ndarray]:
    """TUM-format gt file -> (stamps (M,), poses (M,3,4)), stamp-sorted."""
    import jax.numpy as jnp

    from rtabmap_tpu.geometry import transform as T

    stamps, poses = [], []
    with open(path) as f:
        for line in f:
            line = line.strip()
            if not line or line.startswith("#"):
                continue
            v = [float(x) for x in line.replace(",", " ").split()]
            if len(v) < 8:
                continue
            stamps.append(v[0])
            poses.append(np.asarray(T.from_quaternion(
                jnp.asarray(v[4:8], jnp.float32),
                jnp.asarray(v[1:4], jnp.float32))))
    order = np.argsort(stamps)
    return (np.asarray(stamps, np.float64)[order],
            np.stack(poses)[order] if poses else np.zeros((0, 3, 4)))


def _interp_gt(gt_stamps: np.ndarray, gt_poses: np.ndarray, s: float,
               max_gap: float) -> Optional[np.ndarray]:
    """Reference main.cpp:683: interpolate between the two gt poses
    bracketing stamp ``s`` when both are within ``max_gap``."""
    import jax.numpy as jnp

    from rtabmap_tpu.geometry import transform as T

    if len(gt_stamps) == 0:
        return None
    j = int(np.searchsorted(gt_stamps, s, side="right"))
    if j == 0 or j >= len(gt_stamps):
        if j < len(gt_stamps) and gt_stamps[j] == s:
            return gt_poses[j]
        return None
    i = j - 1
    if s == gt_stamps[i]:
        return gt_poses[i]
    if gt_stamps[j] - s > max_gap or s - gt_stamps[i] > max_gap:
        return None
    alpha = (s - gt_stamps[i]) / (gt_stamps[j] - gt_stamps[i])
    return np.asarray(T.interpolate(jnp.asarray(gt_poses[i]),
                                    jnp.asarray(gt_poses[j]),
                                    float(alpha)))


def _aligned_errors(gt: np.ndarray, est: np.ndarray, with_scale: bool):
    """Umeyama-align est->gt; return (t_rmse, r_rmse_deg, scale, (s,R,t))."""
    from rtabmap_tpu.utils import metrics as M

    s, R, t = M.align_umeyama(est[:, :3, 3], gt[:, :3, 3], with_scale)
    aligned_t = (s * (R @ est[:, :3, 3].T)).T + t
    t_err = np.linalg.norm(aligned_t - gt[:, :3, 3], axis=1)
    E = np.einsum("nij,nik->njk", gt[:, :3, :3], R[None] @ est[:, :3, :3])
    cos = np.clip((np.trace(E, axis1=1, axis2=2) - 1) / 2, -1, 1)
    r_err = np.degrees(np.arccos(cos))
    return (float(np.sqrt((t_err ** 2).mean())),
            float(np.sqrt((r_err ** 2).mean())), float(s), (s, R, t))


class _LocStats:
    """Reference LocStats (main.cpp:98): per-session aggregate."""

    def __init__(self, values: List[float]):
        arr = np.asarray(values, np.float64)
        self.mean = float(arr.mean()) if len(arr) else 0.0
        self.stddev = float(arr.std()) if len(arr) else 0.0
        self.min = float(arr.min()) if len(arr) else 0.0
        self.max = float(arr.max()) if len(arr) else 0.0
        self.total = len(arr)
        self.non_null = (float((arr != 0).sum()) / len(arr) * 100.0
                         if len(arr) else 0.0)


def _evaluate_db(path: str, opt: Dict, stat_ids: List[str]) -> Dict:
    from rtabmap_tpu.memory.db import Database
    from rtabmap_tpu.optim.pose_graph import optimize_poses_dict
    from rtabmap_tpu.tools.export_poses import export_poses
    from rtabmap_tpu.utils import metrics as M

    db = Database(path, async_writes=False)
    infos = db.node_infos()
    stats_rows = db.load_statistics()
    all_links = db.all_links()
    admin = db.load_admin()
    db.close()
    name = os.path.basename(path)

    if opt["list_stats"]:
        counts: Dict[str, int] = {}
        for row in stats_rows:
            for k in row:
                if k not in ("id", "stamp"):
                    counts[k] = counts.get(k, 0) + 1
        print(f'Showing available statistics in "{path}":')
        for k in sorted(counts):
            print(f"{k} ({counts[k]})")
        return {"db": name, "stats": counts}

    ext_gt = opt["gt"]
    weights = {n["id"]: (n["weight"] if n["weight"] is not None else 0)
               for n in infos}
    stamps_by_id = {n["id"]: n["stamp"] for n in infos}
    odom_poses: Dict[int, np.ndarray] = {}
    gt_poses: Dict[int, np.ndarray] = {}
    odom_dist = 0.0
    prev_pose = prev_map = None
    for n in infos:
        p, w = n["pose"], weights[n["id"]]
        if p is not None and prev_pose is not None and prev_map == n["map_id"]:
            odom_dist += float(np.linalg.norm(p[:3, 3] - prev_pose[:3, 3]))
        prev_pose, prev_map = p, n["map_id"]
        if p is None or w == -9:
            continue
        if opt["ignore_inter"] and w == -1:
            continue
        odom_poses[n["id"]] = p
        if ext_gt is not None:
            g = _interp_gt(ext_gt[0], ext_gt[1], n["stamp"], opt["gt_max_t"])
            if g is not None:
                gt_poses[n["id"]] = g
        elif n["gt"] is not None:
            gt_poses[n["id"]] = n["gt"]

    # link dedupe + classification (main.cpp:826-888)
    links: List[Link] = []
    seen = set()
    loop_links: List[Link] = []
    landmarks = 0
    for lk in all_links:
        key = (min(lk.from_id, lk.to_id), max(lk.from_id, lk.to_id))
        if lk.from_id == lk.to_id or key in seen:
            continue
        seen.add(key)
        if lk.type == LINK_LANDMARK:
            landmarks += 1
            links.append(lk)
            continue
        if opt["ignore_inter"] and (lk.from_id not in odom_poses
                                    or lk.to_id not in odom_poses) \
                and lk.to_id > 0:
            continue  # chains through inter nodes are re-derived below
        links.append(lk)
        if lk.type not in (LINK_NEIGHBOR, LINK_NEIGHBOR_MERGED,
                           LINK_GRAVITY, LINK_POSE_PRIOR):
            loop_links.append(lk)
    if opt["ignore_inter"]:
        # contract the odometry chain: consecutive retained nodes get a
        # merged neighbor edge from the raw odometry (link.merge equivalent)
        import jax.numpy as jnp

        from rtabmap_tpu.geometry import transform as T

        ids_sorted = sorted(odom_poses)
        have = {(lk.from_id, lk.to_id) for lk in links}
        for a, b in zip(ids_sorted, ids_sorted[1:]):
            if (a, b) not in have and (b, a) not in have:
                rel = np.asarray(T.relative(jnp.asarray(odom_poses[a]),
                                            jnp.asarray(odom_poses[b])))
                links.append(Link(a, b, LINK_NEIGHBOR, rel,
                                  np.eye(6, dtype=np.float32)))

    # re-optimize from the first node that has a neighbor link
    root = None
    for lk in links:
        if lk.type in (LINK_NEIGHBOR, LINK_NEIGHBOR_MERGED):
            root = min(lk.from_id, lk.to_id)
            break
    opt_poses = optimize_poses_dict(odom_poses, links, root_id=root) \
        if odom_poses else {}
    opt_poses = {i: p for i, p in opt_poses.items() if i > 0}

    common = sorted(set(opt_poses) & set(gt_poses))
    rmse = vo_rmse = ang = -1.0
    scale = 1.0
    kitti_t = kitti_r = rel_t = rel_r = loop_t = loop_r = None
    align = None
    align_odom = None
    if len(common) >= 2:
        gt_arr = np.stack([gt_poses[i] for i in common])
        slam_arr = np.stack([opt_poses[i] for i in common])
        odom_arr = np.stack([odom_poses[i] for i in common])
        rmse, ang, scale, align = _aligned_errors(gt_arr, slam_arr,
                                                  opt["scale"])
        vo_rmse, _, _, align_odom = _aligned_errors(gt_arr, odom_arr,
                                                    opt["scale"])
        if opt["kitti"]:
            kitti_t, kitti_r = M.kitti_sequence_errors(slam_arr, gt_arr)
        if opt["relative"]:
            rel_t, rel_r = M.rpe(slam_arr, gt_arr)
            rel_r = float(np.degrees(rel_r))
        if opt["loop"] and loop_links:
            import jax.numpy as jnp

            from rtabmap_tpu.geometry import transform as T

            dists, angles = [], []
            for lk in loop_links:
                if lk.from_id in gt_poses and lk.to_id in gt_poses:
                    gl = np.asarray(T.relative(
                        jnp.asarray(gt_poses[lk.from_id]),
                        jnp.asarray(gt_poses[lk.to_id])))
                    tl = np.asarray(lk.transform, np.float64).copy()
                    tl[:3, 3] *= scale
                    dists.append(float(np.linalg.norm(gl[:3, 3] - tl[:3, 3])))
                    cos = np.clip(
                        (np.trace(gl[:3, :3].T @ tl[:3, :3]) - 1) / 2, -1, 1)
                    angles.append(float(np.degrees(np.arccos(cos))))
            if dists:
                loop_t = float(np.mean(dists))
                loop_r = float(np.mean(angles))

    # statistics-derived timing / online-RMSE aggregates (main.cpp:712-760)
    max_rmse = -1.0
    slam_time, odom_time, cam_time = [], [], []
    max_map_ram = max_odom_ram = -1.0
    for row in stats_rows:
        v = row.get("Gt/Translational rmse/m")
        if v is not None:
            max_rmse = max(max_rmse, float(v))
        if "Camera/TotalTime/ms" in row:
            cam_time.append(float(row["Camera/TotalTime/ms"]))
        if "Odometry/TotalTime/ms" in row:
            odom_time.append(float(row["Odometry/TotalTime/ms"]))
        elif "Odometry/TimeEstimation/ms" in row:
            odom_time.append(float(row["Odometry/TimeEstimation/ms"]))
        if "Timing/Total/ms" in row and weights.get(row.get("id"), 0) != -1:
            slam_time.append(float(row["Timing/Total/ms"]))
        if "Memory/RAM usage/MB" in row:
            max_map_ram = max(max_map_ram, float(row["Memory/RAM usage/MB"]))
        if "Odometry/RAM_usage/MB" in row:
            max_odom_ram = max(max_odom_ram,
                               float(row["Odometry/RAM_usage/MB"]))

    # per-session localization statistics (main.cpp:822-905): sessions not
    # present in the saved optimized map, split on stamp gaps > loc_delay
    loc_stats: Dict[str, List[_LocStats]] = {}
    if opt["loc_mask"] is not None and stat_ids:
        mapping_ids = set(admin.get("optimized_poses", {}) or {})
        mapping_maps = {n["map_id"] for n in infos if n["id"] in mapping_ids}
        per_stat: Dict[str, List[float]] = {k: [] for k in stat_ids}
        loc_stats = {k: [] for k in stat_ids}
        prev_stamp = 0.0

        def flush():
            for k, vals in per_stat.items():
                if vals:
                    loc_stats[k].append(_LocStats(vals))
                    per_stat[k] = []

        for row in stats_rows:
            nid = row.get("id")
            if nid is None:
                continue
            n_map = next((n["map_id"] for n in infos if n["id"] == nid), None)
            if n_map in mapping_maps:
                continue
            s = row.get("stamp", 0.0) or 0.0
            if prev_stamp > 0 and abs(s - prev_stamp) > opt["loc_delay"]:
                flush()
            prev_stamp = s
            for k in stat_ids:
                if k in row:
                    per_stat[k].append(float(row[k]))
        flush()

    if opt["poses"]:
        base = path[:-3] if path.endswith(".db") else path
        fmt = 2 if opt["kitti"] else 1

        def _transformed(poses, al):
            if opt["poses_raw"] or al is None:
                return poses
            s, R, t = al
            out = {}
            for i, p in poses.items():
                q = np.asarray(p, np.float64).copy()
                q[:3, 3] *= s
                q2 = q.copy()
                q2[:3, :3] = R @ q[:3, :3]
                q2[:3, 3] = R @ q[:3, 3] + t
                out[i] = q2.astype(np.float32)
            return out

        export_poses(base + "_slam.txt", fmt, _transformed(opt_poses, align),
                     stamps=stamps_by_id)
        export_poses(base + "_odom.txt", fmt,
                     _transformed(odom_poses, align_odom),
                     stamps=stamps_by_id)
        if gt_poses:
            export_poses(base + "_gt.txt", fmt, gt_poses,
                         stamps=stamps_by_id)

    mode = "loc" if opt["loc_mask"] is not None else "slam"
    parts = [f"   {name} ({len(odom_poses)}, {odom_dist:.1f} m"
             + (f", s={scale:.3f}" if opt["scale"] else "") + "):",
             f"RMSE= {rmse:.3f} m"
             f" (max={max_rmse:.3f}m," if max_rmse != -1 else
             f"RMSE= {rmse:.3f} m (max=NA,",
             f"odom={vo_rmse:.3f} m) ang={ang:.1f} deg"]
    if kitti_t is not None:
        parts.append(f", KITTI: t_err={kitti_t:.2f}%"
                     f" r_err={kitti_r * 100:.2f} deg/100m")
    if rel_t is not None:
        parts.append(f", Relative: t_err={rel_t:.3f}m r_err={rel_r:.2f} deg")
    parts.append(f", {mode}: avg={int(np.mean(slam_time)) if slam_time else 0} ms"
                 f" (max={int(np.max(slam_time)) if slam_time else 0} ms)"
                 f" loops={len(loop_links)}")
    if landmarks:
        parts.append(f", landmarks = {landmarks}")
    if loop_t is not None:
        parts.append(f" (t_err={loop_t:.3f}m r_err={loop_r:.2f} deg)")
    if odom_time:
        parts.append(f", odom: avg={int(np.mean(odom_time))}ms"
                     f" (max={int(np.max(odom_time))}ms)")
    if cam_time:
        parts.append(f", camera: avg={int(np.mean(cam_time))}ms")
    print(" ".join(parts))

    if opt["loc_mask"] is not None and loc_stats:
        mask = opt["loc_mask"]
        labels = [(1, "min"), (2, "max"), (4, "mean"), (8, "stddev"),
                  (16, "total"), (32, "nonnull%")]
        for k, sessions in loc_stats.items():
            for si, ls in enumerate(sessions):
                vals = {"min": ls.min, "max": ls.max, "mean": ls.mean,
                        "stddev": ls.stddev, "total": ls.total,
                        "nonnull%": ls.non_null}
                shown = " ".join(f"{lab}={vals[lab]:.3f}"
                                 for bit, lab in labels if mask & bit)
                print(f"   [loc] {k} session {si}: {shown}")

    if opt["report_csv"]:
        header_needed = not os.path.exists("report.csv")
        with open("report.csv", "a") as f:
            if header_needed:
                f.write("name;error linear (m);error linear max (m);"
                        "error linear odom (m);error angular;"
                        "Slam avg (hz);Slam max (hz);Odom avg (hz);"
                        "Odom max (hz)\n")
            slam_hz = 1000.0 / np.mean(slam_time) if slam_time else 0.0
            slam_mx = 1000.0 / np.max(slam_time) if slam_time else 0.0
            odom_hz = 1000.0 / np.mean(odom_time) if odom_time else 0.0
            odom_mx = 1000.0 / np.max(odom_time) if odom_time else 0.0
            f.write(f"{name};{rmse:.4f};{max_rmse:.4f};{vo_rmse:.4f};"
                    f"{ang:.4f};{slam_hz:.2f};{slam_mx:.2f};"
                    f"{odom_hz:.2f};{odom_mx:.2f}\n")

    return {
        "db": name, "nodes": len(odom_poses), "odom_distance": odom_dist,
        "rmse": rmse, "rmse_max_online": max_rmse, "rmse_odom": vo_rmse,
        "rmse_ang_deg": ang, "scale": scale,
        "kitti_t_err_pct": kitti_t, "kitti_r_err_deg_per_m": kitti_r,
        "relative_t_err": rel_t, "relative_r_err_deg": rel_r,
        "loop_t_err": loop_t, "loop_r_err_deg": loop_r,
        "loops": len(loop_links), "landmarks": landmarks,
        "slam_time_ms": float(np.mean(slam_time)) if slam_time else None,
        "odom_time_ms": float(np.mean(odom_time)) if odom_time else None,
        "max_map_ram": max_map_ram if max_map_ram != -1 else None,
        "loc_stats": {k: [vars(ls) for ls in v]
                      for k, v in loc_stats.items()},
        "optimized_poses": opt_poses,
    }


def run_report(argv: List[str]) -> List[Dict]:
    opt = {"latex": False, "kitti": False, "relative": False, "loop": False,
           "scale": False, "poses": False, "poses_raw": False,
           "gt": None, "gt_max_t": 1.0, "list_stats": False,
           "report_csv": False, "loc_mask": None, "loc_delay": 60.0,
           "ignore_inter": False}
    stat_ids: List[str] = []
    paths: List[str] = []
    i = 0
    while i < len(argv):
        a = argv[i]
        if a in ("--help", "-h"):
            print(_USAGE)
            return []
        elif a == "--latex":
            opt["latex"] = True
        elif a == "--kitti":
            opt["kitti"] = True
        elif a == "--relative":
            opt["relative"] = True
        elif a == "--loop":
            opt["loop"] = True
        elif a == "--scale":
            opt["scale"] = True
        elif a == "--poses":
            opt["poses"] = True
        elif a == "--poses_raw":
            opt["poses"] = opt["poses_raw"] = True
        elif a == "--stats":
            opt["list_stats"] = True
        elif a == "--report":
            opt["report_csv"] = True
        elif a == "--ignore_inter_nodes":
            opt["ignore_inter"] = True
        elif a == "--inc":
            pass  # batch solver re-optimizes from scratch each call
        elif a == "--gt":
            i += 1
            gt_path = argv[i]
            if gt_path.endswith(".db"):
                from rtabmap_tpu.memory.db import Database

                gdb = Database(gt_path, async_writes=False)
                gposes = gdb.load_admin().get("optimized_poses", {})
                ginfos = {n["id"]: n["stamp"] for n in gdb.node_infos()}
                gdb.close()
                st = np.asarray([ginfos.get(i2, float(i2))
                                 for i2 in sorted(gposes)], np.float64)
                order = np.argsort(st)
                pp = np.stack([gposes[i2] for i2 in sorted(gposes)]) \
                    if gposes else np.zeros((0, 3, 4))
                opt["gt"] = (st[order], pp[order] if len(pp) else pp)
            else:
                opt["gt"] = _load_external_gt(gt_path)
        elif a == "--gt_max_t":
            i += 1
            opt["gt_max_t"] = float(argv[i])
        elif a == "--loc":
            if i + 1 < len(argv) and argv[i + 1].isdigit():
                i += 1
                opt["loc_mask"] = int(argv[i])
            else:
                opt["loc_mask"] = 0
        elif a == "--loc_delay":
            i += 1
            opt["loc_delay"] = float(argv[i])
        elif a.startswith("--"):
            raise SystemExit(f"unknown report option {a}\n{_USAGE}")
        elif os.path.exists(a):
            paths.append(a)
        elif "/" in a:
            stat_ids.append(a)
        else:
            raise SystemExit(f"path not found: {a}")
        i += 1
    if not paths:
        print(_USAGE)
        return []

    dbs: List[str] = []
    for p in paths:
        dbs.extend(_collect_dbs(p))
    results = [_evaluate_db(p, opt, stat_ids) for p in dbs]

    if opt["latex"] and results:
        print("\n%% LaTeX results table (reference main.cpp:1303)")
        print("\\begin{tabular}{lrrrrrr}")
        print("Database & Nodes & RMSE (m) & Max RMSE (m) & Ang (deg) & "
              "Slam avg (ms) & Slam max (ms) \\\\")
        for r in results:
            if "rmse" not in r:
                continue
            st = r.get("slam_time_ms")
            print(f"{r['db']} & {r['nodes']} & {r['rmse']:.3f} & "
                  f"{r['rmse_max_online']:.3f} & {r['rmse_ang_deg']:.1f} & "
                  f"{st if st is not None else 0:.0f} & - \\\\")
        print("\\end{tabular}")
    return results
