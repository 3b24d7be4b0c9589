"""CLI tools: dataset benchmarks, info, report, reprocess, export.

Capability parity: the reference's tool suite (/root/reference/tools/ —
RgbdDataset, KittiDataset, EurocDataset, Info, Report, Reprocess,
Export). Invoke as ``python -m rtabmap_tpu.tools.cli <tool> [args...]``.
"""
from __future__ import annotations

import json
import sys
from typing import List, Optional

import numpy as np


def tool_rgbd_dataset(argv: List[str]):
    """TUM RGB-D benchmark (reference: tools/RgbdDataset/main.cpp)."""
    from rtabmap_tpu.datasets.readers import TumRgbdDataset
    from rtabmap_tpu.memory.db import Database
    from rtabmap_tpu.tools.dataset_runner import run_dataset
    from rtabmap_tpu.utils.params import Parameters

    params, rest = Parameters.parse_arguments(argv)
    root = rest[0]
    out_db = rest[1] if len(rest) > 1 else None
    max_frames = int(rest[2]) if len(rest) > 2 else 0
    ds = TumRgbdDataset(root)
    db = Database(out_db) if out_db else None
    out = run_dataset(iter(ds), ds.camera, params, db=db, max_frames=max_frames)
    if "ate_slam" in out:
        print(f"ATE RMSE (slam): {out['ate_slam']:.4f} m")
        print(f"ATE RMSE (odom): {out['ate_odom']:.4f} m")
    if db:
        out["slam"].close()
        db.close()
    return out


def tool_kitti_dataset(argv: List[str]):
    """KITTI odometry benchmark (reference: tools/KittiDataset/main.cpp)."""
    from rtabmap_tpu.datasets.readers import KittiDataset
    from rtabmap_tpu.memory.db import Database
    from rtabmap_tpu.tools.dataset_runner import run_dataset
    from rtabmap_tpu.utils.params import Parameters

    params, rest = Parameters.parse_arguments(argv)
    seq_dir = rest[0]
    poses_file = rest[1] if len(rest) > 1 else None
    out_db = rest[2] if len(rest) > 2 else None
    max_frames = int(rest[3]) if len(rest) > 3 else 0
    ds = KittiDataset(seq_dir, poses_file)
    db = Database(out_db) if out_db else None
    out = run_dataset(iter(ds), ds.camera, params, stereo_model=ds.stereo,
                      db=db, max_frames=max_frames, kitti_errors=True)
    if "kitti_t_err_pct" in out:
        print(f"KITTI t_err: {out['kitti_t_err_pct']:.2f}%  "
              f"r_err: {out['kitti_r_err_deg_per_m']:.4f} deg/m")
    if db:
        out["slam"].close()
        db.close()
    return out


def tool_euroc_dataset(argv: List[str]):
    """EuRoC benchmark (reference: tools/EurocDataset/main.cpp)."""
    from rtabmap_tpu.datasets.readers import EurocDataset
    from rtabmap_tpu.memory.db import Database
    from rtabmap_tpu.tools.dataset_runner import run_dataset
    from rtabmap_tpu.utils.params import Parameters

    params, rest = Parameters.parse_arguments(argv)
    root = rest[0]
    out_db = rest[1] if len(rest) > 1 else None
    max_frames = int(rest[2]) if len(rest) > 2 else 0
    ds = EurocDataset(root)
    db = Database(out_db) if out_db else None
    out = run_dataset(iter(ds), ds.camera, params, stereo_model=ds.stereo,
                      db=db, max_frames=max_frames)
    if "ate_slam" in out:
        print(f"ATE RMSE (slam): {out['ate_slam']:.4f} m")
    if db:
        out["slam"].close()
        db.close()
    return out


def tool_cid_sims_dataset(argv: List[str]):
    """CID-SIMS ground-robot RGB-D benchmark (reference:
    tools/CidSimsDataset/main.cpp — color/+depth/ stamped layout,
    --gt groundtruth.txt, --odom wheel dead-reckoning fallback,
    --imu 0|1 Madgwick/complementary gravity alignment).

    Usage: cid_sims_dataset [--gt] [--odom] [--imu 0|1]
           [--max_time_diff S] <path> [out_db] [max_frames]"""
    from rtabmap_tpu.datasets.readers import CidSimsDataset
    from rtabmap_tpu.memory.db import Database
    from rtabmap_tpu.tools.dataset_runner import run_dataset
    from rtabmap_tpu.utils.params import Parameters

    params, rest = Parameters.parse_arguments(argv)
    use_gt = use_odom = False
    imu_filter = -1
    max_time_diff = 0.1
    pos = []
    i = 0
    while i < len(rest):
        a = rest[i]
        if a == "--gt":
            use_gt = True
        elif a == "--odom":
            use_odom = True
        elif a == "--imu":
            i += 1
            imu_filter = int(rest[i])
        elif a == "--max_time_diff":
            i += 1
            max_time_diff = float(rest[i])
        elif a == "--quiet":
            pass
        else:
            pos.append(a)
        i += 1
    root = pos[0]
    out_db = pos[1] if len(pos) > 1 else None
    max_frames = int(pos[2]) if len(pos) > 2 else 0
    ds = CidSimsDataset(root, use_odom=use_odom, use_imu=imu_filter >= 0,
                        max_time_diff=max_time_diff)
    if not use_gt:
        ds.gt = []
    db = Database(out_db) if out_db else None
    out = run_dataset(
        iter(ds), ds.camera, params, db=db, max_frames=max_frames,
        imu_method="madgwick" if imu_filter != 1 else "complementary")
    if "ate_slam" in out:
        print(f"ATE RMSE (slam): {out['ate_slam']:.4f} m")
        print(f"ATE RMSE (odom): {out['ate_odom']:.4f} m")
    if db:
        out["slam"].close()
        db.close()
    return out


def tool_info(argv: List[str]):
    """Map store summary (reference: tools/Info/main.cpp)."""
    from rtabmap_tpu.memory.db import Database

    db = Database(argv[0], async_writes=False)
    ids = db.all_node_ids()
    links = db.all_links()
    admin = db.load_admin()
    by_type = {}
    for lk in links:
        by_type[lk.type] = by_type.get(lk.type, 0) + 1
    info = {
        "path": argv[0], "version": admin["version"],
        "nodes": len(ids), "sessions": db.max_map_id() + 1,
        "links": len(links), "links_by_type": by_type,
        "optimized_poses": len(admin["optimized_poses"]),
        "vocabulary_words": admin["vocab"]["n_words"] if admin["vocab"] else 0,
        "parameters": len(admin["parameters"]),
    }
    print(json.dumps(info, indent=2))
    db.close()
    return info


def tool_import_ref_db(argv: List[str]):
    """Summarize / convert a reference-format rtabmap .db (read-only
    importer, memory/ref_db.py). Usage: import_ref_db <ref.db>
    [--out our.db] [--max-frames N]."""
    from rtabmap_tpu.memory.ref_db import RefDatabase

    path = argv[0]
    out_path = None
    if "--out" in argv:
        out_path = argv[argv.index("--out") + 1]
    ref = RefDatabase(path)
    sigs, opt_poses, params = ref.load_all()
    by_type = {}
    for s in sigs.values():
        for lk in s.links.values():
            by_type[lk.type] = by_type.get(lk.type, 0) + 1
    info = {
        "path": path, "version": ref.version, "nodes": len(sigs),
        "links_by_type": {k: v // 2 if k != 8 else v
                          for k, v in sorted(by_type.items())},
        "optimized_poses": len(opt_poses), "parameters": len(params),
        "sessions": len({s.map_id for s in sigs.values()}),
    }
    if out_path:
        from rtabmap_tpu.memory.db import Database

        out = Database(out_path, async_writes=False)
        for s in sigs.values():
            out.save_signature(s)
        out.save_admin(params={k: v for k, v in params.items()},
                       optimized_poses=opt_poses, vocab=None)
        out.flush()
        out.close()
        info["converted_to"] = out_path
    ref.close()
    print(json.dumps(info, indent=2))
    return info


def tool_export_ref_db(argv: List[str]):
    """Export a native framework .db to a REFERENCE-format .db the
    reference's DatabaseViewer/report/reprocess tools can open (inverse
    of import_ref_db; memory/ref_db_export.py — reference:
    DBDriverSqlite3 save path, DatabaseSchema.sql.in:16-130).
    Usage: export_ref_db <ours.db> <out_ref.db>."""
    from rtabmap_tpu.memory.db import Database
    from rtabmap_tpu.memory.ref_db import RefDatabase
    from rtabmap_tpu.memory.ref_db_export import export_ref_db

    src_path, out_path = argv[0], argv[1]
    src = Database(src_path, async_writes=False)
    sigs = {}
    for nid in src.all_node_ids():
        s = src.load_signature(nid)
        if s is not None:
            sigs[nid] = s
    admin = src.load_admin()
    words = None
    if admin.get("vocab"):
        # native vocab: word id == slab row index
        slab = np.asarray(admin["vocab"]["slab"])
        words = {k: slab[k] for k in range(slab.shape[0])}
    src.close()
    n = export_ref_db(out_path, sigs,
                      optimized_poses=admin.get("optimized_poses") or None,
                      words=words,
                      parameters=admin.get("parameters") or None)
    check = RefDatabase(out_path)
    info = {"source": src_path, "out": out_path, "nodes": n,
            "readback_nodes": len(check.node_ids()),
            "readback_links": len(check.load_links()),
            "readback_opt_poses": len(check.load_optimized_poses())}
    check.close()
    print(json.dumps(info, indent=2))
    return info


def tool_report(argv: List[str]):
    """Evaluation report over map stores (reference: tools/Report/main.cpp
    — re-optimization + gt ATE/KITTI/relative/loop errors, pose exports,
    report.csv, LaTeX, per-session localization stats; see tools/report.py)."""
    from rtabmap_tpu.tools.report import run_report

    return run_report(argv)


def tool_reprocess(argv: List[str]):
    """Re-run SLAM from recorded map store(s) with (possibly different)
    parameters (reference: tools/Reprocess/main.cpp — the regression
    harness). The input may be a ``;``-separated list of databases: they
    are replayed in order as APPENDED SESSIONS into one output map (the
    reference's multi-session reprocess, Reprocess/main.cpp:94
    \"Multiple databases can be input side by side\")."""
    from rtabmap_tpu.core.frame import FrameFeatures
    from rtabmap_tpu.engine.rtabmap import Rtabmap
    from rtabmap_tpu.geometry import camera as C
    from rtabmap_tpu.memory.db import Database
    from rtabmap_tpu.utils.params import Parameters

    params, rest = Parameters.parse_arguments(argv)
    in_paths = [p for p in rest[0].split(";") if p]
    out_path = rest[1] if len(rest) > 1 else None

    # parameters + camera come from the FIRST database (reference reads
    # the parameters of the first input)
    src0 = Database(in_paths[0], async_writes=False)
    admin = src0.load_admin()
    stored = admin["parameters"]
    cam_vals = stored.get("__camera__")
    merged = Parameters()
    for k, v in stored.items():
        if merged.exists(k):
            merged.set(k, v)
    merged.update(params.overrides())
    if cam_vals:
        cam = C.CameraModel.make(*cam_vals)
    else:
        cam = C.CameraModel.make(300.0, 300.0, 160.0, 120.0, 320, 240)

    out_db = Database(out_path) if out_path else None
    slam = Rtabmap(cam, merged, db=out_db)
    n = 0
    sessions = 0
    for pi, path in enumerate(in_paths):
        src = src0 if pi == 0 else Database(path, async_writes=False)
        if pi > 0:
            slam.trigger_new_map()  # each database appends a new session
        sessions += 1
        for sid in src.all_node_ids():
            sig = src.load_signature(sid)
            if sig is None or sig.word_ids is None:
                continue
            frame = FrameFeatures(
                uv=sig.uv, desc=sig.desc, pts3d=sig.pts3d,
                valid=(sig.word_ids >= 0) | (np.abs(sig.desc).sum(-1) > 0),
                valid3d=sig.valid3d, angle=np.zeros(len(sig.uv), np.float32),
                response=np.zeros(len(sig.uv), np.float32),
            )
            slam.process(frame, sig.pose, np.eye(6) * 1e-4, stamp=sig.stamp)
            n += 1
        src.close()
    print(f"reprocessed {n} nodes from {sessions} database(s); "
          f"loops in new run: "
          f"{sum(1 for s in slam.stats_history if s.loop_closure_id)}")
    if out_db:
        slam.close()
        out_db.close()
    return slam


def tool_export(argv: List[str]):
    """Export optimized poses from a map store
    (reference: rtabmap-export / exportPoses)."""
    from rtabmap_tpu.memory.db import Database
    from rtabmap_tpu.tools.export_poses import export_poses

    db_path, out_path = argv[0], argv[1]
    fmt = int(argv[2]) if len(argv) > 2 else 2
    db = Database(db_path, async_writes=False)
    admin = db.load_admin()
    links = db.all_links()
    export_poses(out_path, fmt, admin["optimized_poses"], links=links)
    print(f"exported {len(admin['optimized_poses'])} poses (format {fmt}) -> {out_path}")
    db.close()


def tool_recovery(argv: List[str]):
    """Rebuild a usable map store from an unclosed/corrupted one
    (reference: tools/Recovery/main.cpp)."""
    from rtabmap_tpu.memory.db_reader import database_recovery

    out = database_recovery(argv[0], argv[1])
    print(json.dumps(out))
    return out


def tool_detect_more_loop_closures(argv: List[str]):
    """Offline closure sweep over a map store
    (reference: tools/DetectMoreLoopClosures/main.cpp)."""
    from rtabmap_tpu.engine.rtabmap import Rtabmap
    from rtabmap_tpu.geometry import camera as C
    from rtabmap_tpu.memory.db import Database
    from rtabmap_tpu.utils.params import Parameters

    params, rest = Parameters.parse_arguments(argv)
    path = rest[0]
    radius = float(rest[1]) if len(rest) > 1 else 1.0
    db = Database(path)
    cam = C.CameraModel.make(300.0, 300.0, 160.0, 120.0, 320, 240)
    slam = Rtabmap.load(db, cam, params, new_session=False)
    added = slam.detect_more_loop_closures(cluster_radius=radius)
    print(f"added {added} loop closures")
    slam.close()
    db.close()
    return added


def tool_global_ba(argv: List[str]):
    """Global bundle adjustment over a map store
    (reference: tools/GlobalBundleAdjustment/main.cpp)."""
    from rtabmap_tpu.engine.rtabmap import Rtabmap
    from rtabmap_tpu.geometry import camera as C
    from rtabmap_tpu.memory.db import Database
    from rtabmap_tpu.utils.params import Parameters

    params, rest = Parameters.parse_arguments(argv)
    db = Database(rest[0])
    cam = C.CameraModel.make(300.0, 300.0, 160.0, 120.0, 320, 240)
    slam = Rtabmap.load(db, cam, params, new_session=False)
    ok = slam.global_bundle_adjustment()
    print(f"global BA: {'ok' if ok else 'skipped'}")
    slam.close()
    db.close()
    return ok


def tool_export_cloud(argv: List[str]):
    """Assemble + export the map point cloud / mesh from a store
    (reference: tools/Export/main.cpp; --mesh ~ --texture flags mirror
    rtabmap-export's TSDF/meshing/texturing paths).

    Usage: export_cloud <db> <out.(ply|obj)> [--mesh] [--texture]
           [--voxel V] [--cam fx,fy,cx,cy,w,h]
    --mesh fuses stored raw depth frames into a TSDF and writes the mesh;
    --texture additionally bakes a multiband atlas from stored images
    (requires frames recorded with Mem/BinDataKept or data_recorder)."""
    from rtabmap_tpu.maps.mesh import write_ply
    from rtabmap_tpu.memory.db import Database
    from rtabmap_tpu.geometry import transform as T
    import jax.numpy as jnp

    db_path, out_path = argv[0], argv[1]
    opts = argv[2:]
    if "--mesh" in opts or "--texture" in opts:
        return _export_mesh(db_path, out_path, opts)
    db = Database(db_path, async_writes=False)
    admin = db.load_admin()
    clouds = []
    for sid in db.all_node_ids():
        sig = db.load_signature(sid)
        if sig is None or sig.pts3d is None:
            continue
        pose = admin["optimized_poses"].get(sid, sig.pose)
        world = np.asarray(T.apply(jnp.asarray(pose)[None], jnp.asarray(sig.pts3d)[None])[0])
        clouds.append(world[np.asarray(sig.valid3d, bool)])
    cloud = np.concatenate(clouds) if clouds else np.zeros((0, 3))
    write_ply(out_path, cloud)
    print(f"exported {len(cloud)} points -> {out_path}")
    db.close()
    return len(cloud)


def _export_mesh(db_path: str, out_path: str, opts: List[str]):
    """TSDF-fuse stored raw frames at optimized poses; optionally bake a
    textured OBJ (reference: rtabmap-export --texture pipeline:
    util3d_surface meshing + createTextureMesh + multiband)."""
    from rtabmap_tpu.geometry import camera as C
    from rtabmap_tpu.maps.mesh import write_ply
    from rtabmap_tpu.maps.texture import texture_mesh, write_textured_obj
    from rtabmap_tpu.maps.tsdf import TSDFVolume
    from rtabmap_tpu.memory.db import Database

    def opt(flag, default):
        return opts[opts.index(flag) + 1] if flag in opts else default

    voxel = float(opt("--voxel", "0.05"))
    db = Database(db_path, async_writes=False)
    admin = db.load_admin()
    frames = []
    for sid in db.all_node_ids():
        raw = db.load_raw_frame(sid)
        if raw is None or raw[1] is None:
            continue
        img, depth, calib = raw
        sig = db.load_signature(sid)
        pose = admin["optimized_poses"].get(
            sid, sig.pose if sig is not None else None)
        if pose is None:
            continue
        frames.append((np.asarray(pose, np.float32), img,
                       np.asarray(depth, np.float32), calib))
    if not frames:
        db.close()
        raise SystemExit("no raw depth frames stored in this database "
                         "(record with Mem/BinDataKept or data_recorder)")
    H, W = frames[0][2].shape
    if "--cam" in opts:
        fx, fy, cx, cy, w, h = [float(x) for x in opt("--cam", "").split(",")]
        cam = C.CameraModel.make(fx, fy, cx, cy, int(w), int(h))
    elif frames[0][3]:
        c = json.loads(frames[0][3])
        cam = C.CameraModel.make(c["fx"], c["fy"], c["cx"], c["cy"],
                                 c.get("width", W), c.get("height", H))
    else:
        f = 0.9 * W
        cam = C.CameraModel.make(f, f, W / 2.0, H / 2.0, W, H)

    # volume bounds from camera positions +- max depth
    centers = np.stack([p[:, 3] for p, *_ in frames])
    zmax = min(5.0, float(max(np.nanmax(d[np.isfinite(d)], initial=1.0)
                              for _, _, d, _ in frames)))
    margin = 0.25 * zmax + 0.2   # keep voxels behind observed surfaces
    lo = centers.min(0) - zmax - margin
    hi = centers.max(0) + zmax + margin
    vol = TSDFVolume(lo, hi - lo, voxel=max(voxel, float(np.max(hi - lo)) / 192))
    for pose, _, depth, _ in frames:
        vol.integrate(depth, pose, cam)
    verts, faces = vol.extract_mesh()
    if "--texture" in opts and any(f[1] is not None for f in frames):
        poses = [f[0] for f in frames if f[1] is not None]
        imgs = [np.asarray(f[1], np.float32) for f in frames
                if f[1] is not None]
        imgs = [im / 255.0 if im.max() > 2.0 else im for im in imgs]
        depths = [f[2] for f in frames if f[1] is not None]
        tm = texture_mesh(verts, faces, poses, cam, imgs, depths=depths)
        if not out_path.endswith(".obj"):
            out_path = out_path.rsplit(".", 1)[0] + ".obj"
        write_textured_obj(out_path, tm)
        print(f"exported textured mesh: {len(verts)} verts, "
              f"{len(faces)} faces, atlas {tm.atlas.shape[0]}px -> {out_path}")
    else:
        write_ply(out_path, verts, faces=faces)
        print(f"exported mesh: {len(verts)} verts, {len(faces)} faces "
              f"-> {out_path}")
    db.close()
    return len(faces)


def tool_reduce_graph(argv: List[str]):
    """Prune non-essential nodes, composing their neighbor links
    (reference: tools/ReduceGraph/main.cpp — keep loop-closure anchors and
    every k-th node; a removed node's A-n / n-B neighbor links merge into
    one A-B LINK_NEIGHBOR_MERGED with composed transform and the weaker
    information). Usage: reduce_graph in.db out.db [keep_every=2]."""
    import jax.numpy as jnp

    from rtabmap_tpu.geometry import transform as T
    from rtabmap_tpu.memory.db import Database
    from rtabmap_tpu.memory.memory import (
        LINK_NEIGHBOR, LINK_NEIGHBOR_MERGED, Link,
    )
    from rtabmap_tpu.utils.params import Parameters

    _, rest = Parameters.parse_arguments(argv)
    src_path, dst_path = rest[0], rest[1]
    keep_every = int(rest[2]) if len(rest) > 2 else 2
    src = Database(src_path, async_writes=False)
    ids = src.all_node_ids()
    links = src.all_links()
    closure_nodes = {l.from_id for l in links if l.type not in
                     (LINK_NEIGHBOR, LINK_NEIGHBOR_MERGED)} | \
                    {l.to_id for l in links if l.type not in
                     (LINK_NEIGHBOR, LINK_NEIGHBOR_MERGED)}
    keep = [i for k, i in enumerate(sorted(ids))
            if k % keep_every == 0 or i in closure_nodes]
    keep_set = set(keep)
    # walk neighbor chains, composing transforms across removed nodes
    nxt = {}
    for l in links:
        if l.type in (LINK_NEIGHBOR, LINK_NEIGHBOR_MERGED) and l.from_id < l.to_id:
            nxt[l.from_id] = l
    out_links, seen_pairs = [], set()
    for l in links:
        pair = (min(l.from_id, l.to_id), max(l.from_id, l.to_id))
        if (l.type not in (LINK_NEIGHBOR, LINK_NEIGHBOR_MERGED)
                and l.from_id in keep_set and l.to_id in keep_set
                and pair not in seen_pairs):
            seen_pairs.add(pair)
            out_links.append(l)
    for a in sorted(keep_set):
        lk = nxt.get(a)
        if lk is None:
            continue
        Tab = jnp.asarray(lk.transform)
        info = lk.information
        b = lk.to_id
        merged = False
        while b not in keep_set and b in nxt:
            lk2 = nxt[b]
            Tab = T.compose(Tab, jnp.asarray(lk2.transform))
            info = np.minimum(info, lk2.information)
            b = lk2.to_id
            merged = True
        if b in keep_set and b != a:
            out_links.append(Link(a, b,
                                  LINK_NEIGHBOR_MERGED if merged else lk.type,
                                  np.asarray(Tab), info))
    by_from: dict = {}
    for l in out_links:
        by_from.setdefault(l.from_id, {})[l.to_id] = l
    dst = Database(dst_path, async_writes=False)
    for i in keep:
        sig = src.load_signature(i)
        if sig is not None:
            sig.links = by_from.get(i, {})
            dst.save_signature(sig)
    admin = src.load_admin()
    dst.save_admin(params=admin.get("parameters"))
    dst.flush()
    print(f"reduced {len(ids)} -> {len(keep)} nodes, "
          f"{len(links)} -> {len(out_links)} links -> {dst_path}")
    src.close()
    dst.close()
    return len(keep)


def tool_lidar_mapping(argv: List[str]):
    """LiDAR mapping example (reference: examples/LidarMapping/main.cpp).

    With no arguments runs the analytic box-room LiDAR simulator (no
    Velodyne hardware on a TPU host); prints ATE and map stats.
    Usage: lidar_mapping [n_frames] [--noise s] [--verbose]
    """
    from rtabmap_tpu.tools.lidar_mapping import run_synthetic

    n = 40
    noise = 0.0
    verbose = False
    rest = []
    it = iter(argv)
    for a in it:
        if a == "--noise":
            noise = float(next(it))
        elif a == "--verbose":
            verbose = True
        else:
            rest.append(a)
    if rest:
        n = int(rest[0])
    out = run_synthetic(n_frames=n, noise=noise, verbose=verbose)
    print(f"nodes: {out['nodes']}  loop closures: {len(out['closures'])}  "
          f"lost: {out['lost']}")
    if "ate_slam" in out:
        print(f"ATE RMSE (slam): {out['ate_slam']:.4f} m  "
              f"(odom: {out['ate_odom']:.4f} m)")
    if "occupied_voxels" in out:
        print(f"occupied voxels: {out['occupied_voxels']}")
    return out


def tool_matcher(argv: List[str]):
    """Match two images and estimate their relative pose
    (reference: tools/Matcher/main.cpp). Usage:
    matcher imgA imgB [--Vis/... v]; prints matches/inliers/transform."""
    import jax
    import jax.numpy as jnp
    from PIL import Image

    from rtabmap_tpu.core.frame import extract_features
    from rtabmap_tpu.geometry import camera as C
    from rtabmap_tpu.ops import epipolar as EP
    from rtabmap_tpu.ops import image as im
    from rtabmap_tpu.ops import matching as M
    from rtabmap_tpu.utils.params import Parameters

    params, rest = Parameters.parse_arguments(argv)
    pa, pb = rest[0], rest[1]
    max_kp = int(params["Vis/MaxFeatures"]) or 512
    nndr = float(params["Vis/CorNNDR"])

    def load(p):
        a = np.asarray(Image.open(p))
        g = im.rgb_to_gray(jnp.asarray(a)) if a.ndim == 3 else jnp.asarray(
            a, jnp.float32) / 255.0
        return g

    ga, gb = load(pa), load(pb)
    H, W = np.asarray(ga).shape
    cam = C.CameraModel.make(W, W, W / 2 - 0.5, H / 2 - 0.5, W, H)
    from rtabmap_tpu.core.frame import FeatureExtractor

    fe = FeatureExtractor(cam, params, max_kp=max_kp)
    (fa, dfa), (fb, dfb) = fe.extract(ga), fe.extract(gb)
    if int(params["Vis/CorNNType"]) == 6 and dfa is not None:
        # learned attentional matcher (reference: Matcher tool's PyMatcher
        # option) — the bundled trained weights
        from rtabmap_tpu.models.superglue import SuperGlueMatcher

        sgm = SuperGlueMatcher.distilled()
        sc = jnp.full((fa.uv.shape[0],), 0.5, jnp.float32)
        idx, okm, _conf = sgm.match(
            dfa, fa.uv, sc, fa.valid, dfb, fb.uv, sc, fb.valid,
            image_wh=(float(cam.width), float(cam.height)),
            threshold=float(params["PyMatcher/Threshold"]))
        m = M.Matches(idx=idx, dist=jnp.zeros_like(sc),
                      second=jnp.zeros_like(sc), valid=okm)
    else:
        m = M.match_mutual_nndr(fa.desc, fa.valid, fb.desc, fb.valid,
                                nndr=nndr)
    nm = int(np.asarray(m.valid).sum())
    ok, F, inl = EP.check_hypothesis(fa.uv, fb.uv[m.idx], m.valid,
                                     jax.random.PRNGKey(0))
    print(f"features: {int(np.asarray(fa.valid).sum())} / "
          f"{int(np.asarray(fb.valid).sum())}")
    print(f"mutual NNDR matches: {nm}")
    print(f"epipolar inliers: {int(np.asarray(inl).sum())} "
          f"(geometry {'OK' if bool(ok) else 'REJECTED'})")
    return {"matches": nm, "inliers": int(np.asarray(inl).sum()),
            "ok": bool(ok)}


def tool_calibration(argv: List[str]):
    """Camera calibration from chessboard images
    (reference: tools/Calibration + guilib CalibrationDialog.cpp).
    Usage: calibration <image_dir> <cols>x<rows> <square_m> [out.json]
           calibration --stereo <left_dir> <right_dir> <cols>x<rows> <square_m> [out.json]
    <cols>x<rows> counts interior corners."""
    from rtabmap_tpu.ops import calibration as CAL
    from rtabmap_tpu.sensors.capture import CameraImages

    stereo = argv and argv[0] == "--stereo"
    if stereo:
        left_dir, right_dir = argv[1], argv[2]
        pat_s, square = argv[3], float(argv[4])
        out = argv[5] if len(argv) > 5 else None
    else:
        left_dir, right_dir = argv[0], None
        pat_s, square = argv[1], float(argv[2])
        out = argv[3] if len(argv) > 3 else None
    cols, rows = (int(x) for x in pat_s.lower().split("x"))
    pattern = (cols, rows)

    def corners_from_dir(d):
        pts, size = [], None
        for sd in CameraImages(d):
            g = np.asarray(sd.gray)
            size = (g.shape[1], g.shape[0])
            c = CAL.find_chessboard(g, pattern)
            if c is not None:
                pts.append(c.astype(np.float32))
        return pts, size

    obj = CAL.chessboard_object_points(pattern, square)
    if stereo:
        lp, size = corners_from_dir(left_dir)
        rp, _ = corners_from_dir(right_dir)
        n = min(len(lp), len(rp))
        if n < 3:
            print(f"not enough detections (L={len(lp)} R={len(rp)})")
            return 1
        res = CAL.stereo_calibrate(obj, lp[:n], rp[:n], size)
        doc = {
            "left": {"fx": float(res.left.camera.fx), "fy": float(res.left.camera.fy),
                     "cx": float(res.left.camera.cx), "cy": float(res.left.camera.cy),
                     "dist": np.asarray(res.left.camera.dist).tolist()},
            "right": {"fx": float(res.right.camera.fx), "fy": float(res.right.camera.fy),
                      "cx": float(res.right.camera.cx), "cy": float(res.right.camera.cy),
                      "dist": np.asarray(res.right.camera.dist).tolist()},
            "extrinsics": res.extrinsics.tolist(),
            "baseline_m": res.baseline, "rms_px": res.rms,
            "image_size": list(size), "views": n,
        }
    else:
        pts, size = corners_from_dir(left_dir)
        if len(pts) < 3:
            print(f"not enough detections ({len(pts)}; need >= 3 views)")
            return 1
        res = CAL.calibrate_camera(obj, pts, size)
        doc = {
            "fx": float(res.camera.fx), "fy": float(res.camera.fy),
            "cx": float(res.camera.cx), "cy": float(res.camera.cy),
            "dist": np.asarray(res.camera.dist).tolist(),
            "rms_px": res.rms, "per_view_rms_px": res.per_view_rms.tolist(),
            "image_size": list(size), "views": len(pts),
        }
    print(json.dumps(doc, indent=2))
    if out:
        with open(out, "w") as f:
            json.dump(doc, f, indent=2)
        print(f"wrote {out}")
    return doc


def tool_cleanup_local_grids(argv: List[str]):
    """Remove dynamic obstacles from per-node local grids using the final
    optimized map (reference: tools/CleanupLocalGrids +
    Rtabmap::cleanupLocalGrids, Rtabmap.cpp:6467).
    Usage: cleanup_local_grids <db> [radius_cells=1] [--ground]"""
    from rtabmap_tpu.maps.grids import cleanup_local_grids
    from rtabmap_tpu.memory.db import Database

    filter_ground = "--ground" in argv
    argv = [a for a in argv if a != "--ground"]
    path = argv[0]
    radius = int(argv[1]) if len(argv) > 1 else 1
    db = Database(path, async_writes=False)
    admin = db.load_admin()
    poses = dict(admin["optimized_poses"])
    sigs, grids = {}, {}
    for sid in db.all_node_ids():
        sig = db.load_signature(sid)
        if sig is not None and sig.grid is not None:
            sigs[sid] = sig
            grids[sid] = sig.grid
            poses.setdefault(sid, sig.pose)
    cleaned, removed = cleanup_local_grids(poses, grids, radius=radius,
                                           filter_ground=filter_ground)
    for sid, g in cleaned.items():
        sigs[sid].grid = g
        db.save_signature(sigs[sid])
    db.flush()
    db.close()
    print(f"cleaned {len(cleaned)} grids; removed {removed} dynamic cells")
    return removed


def tool_data_recorder(argv: List[str]):
    """Record a sensor stream into a map store
    (reference: tools/DataRecorder/main.cpp + guilib DataRecorder).
    Usage: data_recorder <out.db> <driver> <driver-args...>
    e.g.  data_recorder out.db rgbd_images rgb_dir depth_dir"""
    from rtabmap_tpu.memory.db import Database
    from rtabmap_tpu.sensors.capture import create_camera

    out, driver = argv[0], argv[1]
    cam = create_camera(driver, *argv[2:])
    db = Database(out)
    n = 0
    for sd in cam:
        img = np.asarray(sd.gray)
        depth = None if sd.depth is None else np.asarray(sd.depth)
        db.save_raw_frame(sd.id or n + 1, stamp=sd.stamp, image=img,
                          depth=depth)
        n += 1
    db.save_admin()
    db.flush()
    db.close()
    print(f"recorded {n} frames -> {out}")
    return n


def tool_console_app(argv: List[str]):
    """Appearance-based loop-closure console with ground-truth scoring
    (reference: tools/ConsoleApp/main.cpp — feed an image directory
    through the appearance pipeline; with ``-gt matrix.bmp`` compute
    Recall at 100% Precision exactly like the reference's scoring loop,
    main.cpp:415-540; ``-createGT`` writes GroundTruth_generated.bmp).

    Usage: console_app <image_dir> [-gt path] [-createGT] [-quiet]
           [-skip N] [-start_at N] [-interactive] [--Param v ...]
    """
    import jax
    import jax.numpy as jnp

    from rtabmap_tpu.core.frame import FeatureExtractor
    from rtabmap_tpu.engine.rtabmap import Rtabmap
    from rtabmap_tpu.geometry import camera as C
    from rtabmap_tpu.sensors.capture import CameraImages
    from rtabmap_tpu.utils.params import Parameters

    params, rest = Parameters.parse_arguments(argv)
    gt_path, create_gt, quiet, interactive = None, False, False, False
    skip, start_at = 0, 0
    path = None
    it = iter(rest)
    for a in it:
        if a == "-gt":
            gt_path = next(it)
        elif a == "-createGT":
            create_gt = True
        elif a == "-quiet":
            quiet = True
        elif a == "-skip":
            skip = int(next(it))
        elif a == "-start_at":
            start_at = int(next(it))
        elif a == "-interactive":
            interactive = True
        else:
            path = a
    if path is None:
        print("usage: console_app <image_dir> [-gt path] [-createGT] "
              "[-quiet] [-skip N] [-start_at N] [--Param v ...]")
        return 1

    gt = None
    if gt_path:
        from PIL import Image

        gt = np.array(Image.open(gt_path).convert("L"))
        assert gt.shape[0] == gt.shape[1], "GT matrix must be square"
        if start_at or skip:
            print("Cannot input ground truth if start_at/skip are used.")
            gt = None

    src = CameraImages(path, start_id=start_at)
    slam, ext = None, None
    interactive = interactive and sys.stdin.isatty()
    # (value, gt_ok) samples for frames with a hypothesis (reference:
    # loopClosureStats map — dedup by value like std::map)
    lc_stats: dict = {}
    generated_gt: dict = {}
    count_loops = 0
    i = 0
    for sd in src:
        if skip and (i % (skip + 1)) != 0:
            i += 1
            continue
        if interactive:
            cmd = input(f"[frame {sd.id}] enter=process q=quit> ").strip()
            if cmd == "q":
                break
        g = jnp.asarray(sd.gray)
        if slam is None:
            H, W = np.asarray(g).shape
            cam = C.CameraModel.make(W, W, W / 2 - 0.5, H / 2 - 0.5, W, H)
            params.set("RGBD/Enabled", False)
            n_kp = int(params["Kp/MaxFeatures"])
            n_kp = 400 if n_kp <= 0 else n_kp
            slam = Rtabmap(cam, params, words_per_frame=n_kp)
            # Kp/DetectorStrategy dispatch: classical or SuperPoint (11)
            ext = FeatureExtractor(cam, params, max_kp=n_kp)
        fr, descf = ext.extract(g)
        st = slam.process(fr, np.eye(3, 4, dtype=np.float32),
                          stamp=float(sd.id), descf=descf)
        hyp_id, hyp_val = slam.last_hypothesis
        lc = int(st.get("Loop/Id/") or 0)
        if lc:
            count_loops += 1
            if create_gt:
                generated_gt[i] = lc - 1
        if gt is not None and hyp_val > 0 and hyp_id > 0:
            if i >= gt.shape[0] or hyp_id - 1 >= gt.shape[1]:
                print(f"ERROR: incompatible ground truth (size={gt.shape}, "
                      f"image={i}, loop index={hyp_id - 1})")
                return 1
            rejected = bool(st.get("Loop/RejectedHypothesis/", 0.0))
            if not rejected:
                lc_stats[hyp_val] = bool(gt[i, hyp_id - 1] == 255)
        if not quiet:
            print(f"frame {sd.id}: hypothesis {hyp_id} (p={hyp_val:.3f})"
                  + (f"  LOOP CLOSURE with {lc}" if lc else ""))
        i += 1

    print(f"Processing images completed. Loop closures found = {count_loops}")
    out = {"slam": slam, "loops": count_loops, "frames": i}
    if gt is not None and lc_stats:
        # walk hypothesis values from highest down while GT agrees —
        # Recall @ 100% Precision (reference main.cpp:509-540)
        good, loop_thr = 0, 0.0
        for v in sorted(lc_stats, reverse=True):
            if not lc_stats[v]:
                break
            loop_thr = v
            good += 1
        total_gt = int((gt == 255).any(axis=1).sum())
        recall = 100.0 * good / max(total_gt, 1)
        print(f" Recall (100% Precision): {recall:.2f}% "
              f"(with Rtabmap/LoopThr={loop_thr:.6f}, "
              f"accepted={good}/{total_gt})")
        out.update(recall_100p=recall, loop_thr=loop_thr,
                   accepted=good, total_gt=total_gt)
    if create_gt and i:
        from PIL import Image

        m = np.zeros((i, i), np.uint8)
        for r, c in generated_gt.items():
            m[r, c] = 255
        Image.fromarray(m).save("GroundTruth_generated.bmp")
        print(f"Generated ground truth file GroundTruth_generated.bmp, "
              f"size of {i}")
    return out


def tool_stereo_eval(argv: List[str]):
    """Evaluate stereo matching on a rectified pair
    (reference: tools/StereoEval/main.cpp). Usage:
    stereo_eval <left> <right> [max_disp=64]; prints sparse-LK and
    dense-SGBM disparity statistics and their agreement."""
    import jax
    import jax.numpy as jnp
    from PIL import Image

    from rtabmap_tpu.ops import features as F
    from rtabmap_tpu.ops import image as im
    from rtabmap_tpu.ops import stereo as S

    def load(p):
        a = np.asarray(Image.open(p))
        return im.rgb_to_gray(jnp.asarray(a)) if a.ndim == 3 else \
            jnp.asarray(a, jnp.float32) / 255.0

    left, right = load(argv[0]), load(argv[1])
    max_disp = int(argv[2]) if len(argv) > 2 else 64
    kps, _ = jax.jit(lambda g: F.detect_and_describe(g, 256))(left)
    disp, ok = S.lk_stereo_disparity(left, right, kps.uv, kps.valid,
                                     max_disparity=float(max_disp))
    dense = np.asarray(S.dense_sgbm_disparity(left, right, max_disparity=max_disp))
    d_sparse = np.asarray(disp)
    okn = np.asarray(ok)
    uv = np.asarray(kps.uv).astype(int)
    agree = []
    for i in np.where(okn)[0]:
        u, v = uv[i]
        if 0 <= v < dense.shape[0] and 0 <= u < dense.shape[1] and dense[v, u] > 0:
            agree.append(abs(dense[v, u] - d_sparse[i]))
    out = {
        "sparse_n": int(okn.sum()),
        "sparse_mean_disp": float(d_sparse[okn].mean()) if okn.any() else 0.0,
        "dense_density": float((dense > 0).mean()),
        "dense_mean_disp": float(dense[dense > 0].mean()) if (dense > 0).any() else 0.0,
        "sparse_dense_mad_px": float(np.mean(agree)) if agree else -1.0,
    }
    print(json.dumps(out, indent=2))
    return out


def tool_vocabulary_comparison(argv: List[str]):
    """Quantization behavior of the incremental vocabulary over an image
    set (reference: tools/VocabularyComparison/main.cpp). Usage:
    vocabulary_comparison <image_dir> [max_kp=400]; prints per-frame
    new-word / matched-word counts and the final dictionary size."""
    import jax
    import jax.numpy as jnp

    from rtabmap_tpu.ops import features as F
    from rtabmap_tpu.sensors.capture import CameraImages
    from rtabmap_tpu.vocab.dictionary import VWDictionary

    max_kp = int(argv[1]) if len(argv) > 1 else 400
    vw = VWDictionary()
    det = None
    rows = []
    for sd in CameraImages(argv[0]):
        g = jnp.asarray(sd.gray)
        if det is None:
            det = jax.jit(lambda x: F.detect_and_describe(x, max_kp))
        kps, desc = det(g)
        ids, new = vw.quantize(desc, kps.valid)
        n_new = int(np.asarray(new).sum())
        n_match = int((np.asarray(ids) >= 0).sum()) - n_new
        rows.append((sd.id, n_new, n_match))
        print(f"frame {sd.id}: new words {n_new}, matched {n_match}, "
              f"dict {vw.n_words}")
    print(f"final dictionary: {vw.n_words} words over {len(rows)} frames")
    return rows


def tool_epipolar_geometry(argv: List[str]):
    """Two-view epipolar geometry playground
    (reference: tools/EpipolarGeometry/main.cpp). Usage:
    epipolar_geometry <imgA> <imgB>; prints F, epipoles, inlier stats."""
    import jax
    import jax.numpy as jnp
    from PIL import Image

    from rtabmap_tpu.core.frame import extract_features
    from rtabmap_tpu.geometry import camera as C
    from rtabmap_tpu.ops import epipolar as EP
    from rtabmap_tpu.ops import image as im
    from rtabmap_tpu.ops import matching as M

    def load(p):
        a = np.asarray(Image.open(p))
        return im.rgb_to_gray(jnp.asarray(a)) if a.ndim == 3 else \
            jnp.asarray(a, jnp.float32) / 255.0

    ga, gb = load(argv[0]), load(argv[1])
    H, W = np.asarray(ga).shape
    cam = C.CameraModel.make(W, W, W / 2 - 0.5, H / 2 - 0.5, W, H)
    ext = jax.jit(lambda g: extract_features(g, jnp.zeros_like(g), cam, 512))
    fa, fb = ext(ga), ext(gb)
    m = M.match_mutual_nndr(fa.desc, fa.valid, fb.desc, fb.valid)
    ok, F_, inl = EP.check_hypothesis(fa.uv, fb.uv[m.idx], m.valid,
                                      jax.random.PRNGKey(0))
    Fm = np.asarray(F_)
    _, _, vt = np.linalg.svd(Fm)
    e1 = vt[-1]
    e1 = e1[:2] / e1[2] if abs(e1[2]) > 1e-9 else e1[:2]
    u, _, _ = np.linalg.svd(Fm)
    e2 = u[:, -1]
    e2 = e2[:2] / e2[2] if abs(e2[2]) > 1e-9 else e2[:2]
    print("F =\n", Fm)
    print(f"epipole A: {e1}, epipole B: {e2}")
    print(f"matches {int(np.asarray(m.valid).sum())}, inliers "
          f"{int(np.asarray(inl).sum())}, geometry "
          f"{'OK' if bool(ok) else 'REJECTED'}")
    return {"ok": bool(ok), "F": Fm.tolist()}


def tool_extract_object(argv: List[str]):
    """Extract the dominant above-plane object cluster from a cloud
    (reference: tools/ExtractObject/main.cpp — plane removal + Euclidean
    clustering). Usage: extract_object <in.ply> <out.ply> [cluster_vox=0.05]"""
    from rtabmap_tpu.maps.mesh import read_ply, write_ply
    from rtabmap_tpu.ops.ransac import fit_plane_ransac

    in_path, out_path = argv[0], argv[1]
    vox = float(argv[2]) if len(argv) > 2 else 0.05
    verts, _, colors = read_ply(in_path)
    import jax

    n_h, d_h, inliers = fit_plane_ransac(verts, jax.random.PRNGKey(0))
    rest = ~np.asarray(inliers)
    pts = verts[rest]
    cols = colors[rest] if colors is not None else None
    if len(pts) == 0:
        print("no off-plane points")
        return 0
    # Euclidean clustering on a voxel hash: union of adjacent occupied voxels
    q = np.floor(pts / vox).astype(np.int64)
    key = {tuple(c): i for i, c in enumerate(np.unique(q, axis=0))}
    parent = list(range(len(key)))

    def find(i):
        while parent[i] != i:
            parent[i] = parent[parent[i]]
            i = parent[i]
        return i

    for c in list(key):
        for dx in (-1, 0, 1):
            for dy in (-1, 0, 1):
                for dz in (-1, 0, 1):
                    nb = (c[0] + dx, c[1] + dy, c[2] + dz)
                    if nb in key:
                        a, b = find(key[c]), find(key[nb])
                        parent[a] = b
    labels = np.asarray([find(key[tuple(c)]) for c in q])
    best = np.bincount(labels).argmax()
    sel = labels == best
    write_ply(out_path, pts[sel], colors=cols[sel] if cols is not None else None)
    print(f"extracted {int(sel.sum())} pts (of {len(verts)}) -> {out_path}")
    return int(sel.sum())


def tool_images_joiner(argv: List[str]):
    """Join image pairs side by side (reference: tools/ImagesJoiner/main.cpp).
    Usage: images_joiner <dirA> <dirB> <out_dir>"""
    import os

    from PIL import Image

    from rtabmap_tpu.sensors.capture import _sorted_files

    da, db_, out = argv[0], argv[1], argv[2]
    os.makedirs(out, exist_ok=True)
    fa, fb = _sorted_files(da), _sorted_files(db_)
    n = 0
    for pa, pb in zip(fa, fb):
        a, b = Image.open(pa), Image.open(pb)
        h = max(a.height, b.height)
        canvas = Image.new("RGB", (a.width + b.width, h))
        canvas.paste(a, (0, 0))
        canvas.paste(b, (a.width, 0))
        canvas.save(os.path.join(out, f"{n:06d}.png"))
        n += 1
    print(f"joined {n} pairs -> {out}")
    return n


def tool_db_edit(argv: List[str]):
    """Offline map-store inspection/editing — the engine-facing surface of
    the reference's DatabaseViewer (guilib DatabaseViewer.cpp: graph view,
    constraint add/remove, link refining, label editing), as a CLI.

    Usage:
      db_edit <db> nodes                     list nodes (pose/weight/label)
      db_edit <db> links [type]              list links (optionally by type)
      db_edit <db> add_link <from> <to>      visual-register + add closure
      db_edit <db> remove_link <from> <to>   delete a constraint
      db_edit <db> refine_links              scan-ICP refine all closures
      db_edit <db> set_label <id> <label>
      db_edit <db> dot <out.dot>             GraphViz export
    All edit commands re-optimize and persist.
    """
    from rtabmap_tpu.engine.rtabmap import Rtabmap
    from rtabmap_tpu.geometry import camera as C
    from rtabmap_tpu.memory.db import Database
    from rtabmap_tpu.utils.params import Parameters

    params, rest = Parameters.parse_arguments(argv)
    path, cmd = rest[0], rest[1]
    db = Database(path)
    if cmd == "nodes":
        out = []
        for sid in db.all_node_ids():
            s = db.load_signature(sid)
            if s is None:
                continue
            p = np.asarray(s.pose)[:, 3]
            out.append({"id": sid, "map": s.map_id, "weight": s.weight,
                        "label": s.label,
                        "xyz": [round(float(v), 3) for v in p]})
        print(json.dumps(out, indent=1))
        db.close()
        return out
    if cmd == "links":
        links = db.all_links()
        if len(rest) > 2:
            links = [l for l in links if l.type == int(rest[2])]
        out = [{"from": l.from_id, "to": l.to_id, "type": l.type}
               for l in links]
        print(json.dumps(out, indent=1))
        db.close()
        return out

    cam = C.CameraModel.make(300.0, 300.0, 160.0, 120.0, 320, 240)
    slam = Rtabmap.load(db, cam, params, new_session=False)
    result = None
    if cmd == "add_link":
        result = slam.add_user_link(int(rest[2]), int(rest[3]))
        print(f"add_link: {'accepted' if result else 'rejected'}")
    elif cmd == "remove_link":
        slam.memory.remove_link(int(rest[2]), int(rest[3]))
        from rtabmap_tpu.utils.logging import Statistics
        slam._optimize(Statistics(), [])
        result = True
        print("removed")
    elif cmd == "refine_links":
        result = slam.refine_links()
        print(f"refined {result} links")
    elif cmd == "set_label":
        result = slam.set_label(int(rest[2]), rest[3])
        print(f"set_label: {result}")
    elif cmd == "dot":
        result = slam.generate_dot_graph(rest[2])
        print(f"wrote {result} edges -> {rest[2]}")
    else:
        raise SystemExit(f"unknown db_edit command {cmd}")
    slam.close()
    db.close()
    return result


def tool_fleet_demo(argv: List[str]):
    """Multi-session loop-closure serving demo (beyond the reference:
    parallel/fleet.py — B sessions tick as one jitted device step).
    Usage: fleet_demo [batch=8]"""
    from rtabmap_tpu.parallel.fleet import demo_fleet

    batch = int(argv[0]) if argv else 8
    best, best_p, state = demo_fleet(batch=batch)
    ok = bool((best == 3).all())
    print(json.dumps({
        "sessions": batch,
        "relocalized_at_place_3": ok,
        "posterior_peaks": best.tolist(),
        "confidence": [round(float(x), 3) for x in best_p],
    }))
    return ok


def tool_wifi_mapping(argv: List[str]):
    """User-data mapping example (reference: examples/WifiMapping).
    Usage: wifi_mapping [out_dir] [n_frames]"""
    from rtabmap_tpu.tools.wifi_mapping import run

    out = argv[0] if argv else "/tmp/wifi_mapping"
    n = int(argv[1]) if len(argv) > 1 else 24
    return run(out, n)


def tool_convert_model(argv: List[str]):
    """Convert pretrained learned-model checkpoints into flax npz weights
    (reference loads TorchScript/TF online — superpoint_torch/
    SuperPoint.cc:342; here conversion happens once, offline).
    Usage: convert_model superpoint <superpoint_v1.pt> <out.npz>
           convert_model superglue <superglue_indoor.pth> <out.npz>
           convert_model netvlad <ckpt.pt> <out.npz>"""
    if len(argv) < 3:
        print("usage: convert_model {superpoint|superglue|netvlad} "
              "<src> <out.npz>")
        return 1
    kind, src, out = argv[0], argv[1], argv[2]
    if kind == "superpoint":
        from rtabmap_tpu.models.convert import convert_superpoint_file

        convert_superpoint_file(src, out)
    elif kind == "superglue":
        from rtabmap_tpu.models.convert import convert_superglue
        from rtabmap_tpu.models.superglue_official import save_params

        save_params(convert_superglue(src), out)
    elif kind == "netvlad":
        from rtabmap_tpu.models.convert import convert_netvlad

        d = convert_netvlad(src)
        np.savez(out, **d)
    else:
        print(f"unknown model kind {kind!r}")
        return 1
    print(f"converted {kind} weights: {src} -> {out}")
    return 0


TOOLS = {
    "calibration": tool_calibration,
    "convert_model": tool_convert_model,
    "cleanup_local_grids": tool_cleanup_local_grids,
    "console_app": tool_console_app,
    "data_recorder": tool_data_recorder,
    "epipolar_geometry": tool_epipolar_geometry,
    "extract_object": tool_extract_object,
    "images_joiner": tool_images_joiner,
    "stereo_eval": tool_stereo_eval,
    "vocabulary_comparison": tool_vocabulary_comparison,
    "rgbd_dataset": tool_rgbd_dataset,
    "kitti_dataset": tool_kitti_dataset,
    "euroc_dataset": tool_euroc_dataset,
    "cid_sims_dataset": tool_cid_sims_dataset,
    "info": tool_info,
    "import_ref_db": tool_import_ref_db,
    "export_ref_db": tool_export_ref_db,
    "report": tool_report,
    "reprocess": tool_reprocess,
    "export": tool_export,
    "export_cloud": tool_export_cloud,
    "recovery": tool_recovery,
    "detect_more_loop_closures": tool_detect_more_loop_closures,
    "global_ba": tool_global_ba,
    "reduce_graph": tool_reduce_graph,
    "matcher": tool_matcher,
    "lidar_mapping": tool_lidar_mapping,
    "wifi_mapping": tool_wifi_mapping,
    "fleet_demo": tool_fleet_demo,
    "db_edit": tool_db_edit,
}


def main(argv=None):
    argv = argv if argv is not None else sys.argv[1:]
    if not argv or argv[0] not in TOOLS:
        print("usage: python -m rtabmap_tpu.tools.cli <tool> [args...]\n"
              f"tools: {', '.join(sorted(TOOLS))}")
        return 1
    return TOOLS[argv[0]](argv[1:])


if __name__ == "__main__":
    # tools return rich dicts for programmatic use; only ints are exit codes
    _ret = main()
    sys.exit(_ret if isinstance(_ret, int) else 0)
