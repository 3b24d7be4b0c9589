"""Report tool (tools/report.py) — reference tools/Report/main.cpp parity:
re-optimization + gt evaluation, pose exports, report.csv, loc stats."""
import os

import numpy as np
import pytest

from rtabmap_tpu.memory.db import Database
from rtabmap_tpu.memory.memory import (LINK_GLOBAL_CLOSURE, LINK_NEIGHBOR,
                                       Link, Signature)


def _pose(x, y, yaw):
    import jax.numpy as jnp

    from rtabmap_tpu.geometry import transform as T

    return np.asarray(
        T.from_xyzrpy(jnp.asarray([x, y, 0.0, 0.0, 0.0, yaw])), np.float32)


def _build_square_db(path, yaw_bias=0.04):
    """12-node square loop: exact gt, yaw-drifting odometry, one exact
    loop closure last->first. Optimization must beat raw odometry ATE."""
    import jax.numpy as jnp

    from rtabmap_tpu.geometry import transform as T

    db = Database(path, async_writes=False)
    n = 12
    gt, odom = [], []
    g = np.asarray(T.identity(), np.float32)
    o = np.asarray(T.identity(), np.float32)
    step = _pose(1.0, 0.0, 0.0)
    for k in range(n):
        gt.append(g)
        odom.append(o)
        turn = _pose(0.0, 0.0, np.pi / 2) if (k + 1) % 3 == 0 else None
        rel = step if turn is None else np.asarray(
            T.compose(jnp.asarray(step), jnp.asarray(turn)))
        noisy = np.asarray(T.compose(
            jnp.asarray(rel), jnp.asarray(_pose(0.0, 0.0, yaw_bias))))
        g = np.asarray(T.compose(jnp.asarray(g), jnp.asarray(rel)))
        o = np.asarray(T.compose(jnp.asarray(o), jnp.asarray(noisy)))
    info6 = np.eye(6, dtype=np.float32)
    for k in range(n):
        sig = Signature(id=k + 1, map_id=0, stamp=float(k), pose=odom[k],
                        weight=1)
        sig.gt_pose = gt[k]
        if k > 0:
            rel = np.asarray(T.relative(jnp.asarray(odom[k - 1]),
                                        jnp.asarray(odom[k])))
            sig.links[k] = Link(k, k + 1, LINK_NEIGHBOR, rel, info6)
        db.save_signature(sig)
        db.save_statistics(k + 1, float(k), {
            "Timing/Total/ms": 20.0 + k,
            "Gt/Translational rmse/m": 0.01 * (k + 1),
            "Odometry/TotalTime/ms": 5.0 + 0.1 * k,
        })
    gt_rel = np.asarray(T.relative(jnp.asarray(gt[-1]), jnp.asarray(gt[0])))
    db.save_signature_link = None
    # loop closure with the TRUE relative transform, strong information
    lc = Link(n, 1, LINK_GLOBAL_CLOSURE, gt_rel, info6 * 100.0)
    sig = db.load_signature(n)
    sig.links[1] = lc
    db.save_signature(sig)
    db.save_admin(optimized_poses={k + 1: odom[k] for k in range(n)})
    db.flush()
    db.close()
    return gt, odom


def test_report_reoptimizes_and_scores(tmp_path):
    from rtabmap_tpu.tools.report import run_report
    from rtabmap_tpu.utils.metrics import ate_rmse

    dbp = str(tmp_path / "square.db")
    gt, odom = _build_square_db(dbp)
    res = run_report(["--kitti", "--relative", "--loop", dbp])
    assert len(res) == 1
    r = res[0]
    assert r["nodes"] == 12
    assert r["loops"] == 1
    raw_ate = ate_rmse(np.stack(odom), np.stack(gt))
    # the re-optimized trajectory must beat raw odometry against gt
    assert r["rmse"] < raw_ate * 0.7
    assert r["rmse_odom"] == pytest.approx(raw_ate, abs=1e-3)
    assert r["rmse_max_online"] == pytest.approx(0.12, abs=1e-6)
    assert r["relative_t_err"] is not None
    assert r["kitti_t_err_pct"] is not None  # square too short for segments
    assert r["slam_time_ms"] == pytest.approx(np.mean(20.0 + np.arange(12)))
    assert r["odom_distance"] > 10.0


def test_report_pose_exports_and_csv(tmp_path, monkeypatch):
    from rtabmap_tpu.tools.report import run_report

    dbp = str(tmp_path / "square.db")
    _build_square_db(dbp)
    monkeypatch.chdir(tmp_path)
    res = run_report(["--poses", "--report", dbp])
    assert res[0]["rmse"] >= 0
    base = dbp[:-3]
    for suffix in ("_slam.txt", "_odom.txt", "_gt.txt"):
        out = base + suffix
        assert os.path.exists(out)
        lines = [l for l in open(out) if l.strip()]
        assert len(lines) == 12 and len(lines[0].split()) == 8  # TUM rows
    csv = (tmp_path / "report.csv").read_text().strip().splitlines()
    assert csv[0].startswith("name;")
    assert csv[1].startswith("square.db;")


def test_report_external_gt_interpolation(tmp_path):
    """--gt TUM file override: stamps offset by 0.25 exercise the
    bracketing interpolation (main.cpp:683 parity)."""
    import jax.numpy as jnp

    from rtabmap_tpu.geometry import transform as T
    from rtabmap_tpu.tools.report import run_report

    dbp = str(tmp_path / "square.db")
    gt, _odom = _build_square_db(dbp)
    gt_file = tmp_path / "gt.txt"
    with open(gt_file, "w") as f:
        f.write("# stamp tx ty tz qx qy qz qw\n")
        for k, P in enumerate(gt):
            q = np.asarray(T.to_quaternion(jnp.asarray(P)))
            t = P[:3, 3]
            for ds in (-0.25, 0.25):  # node stamps fall between gt rows
                f.write(f"{k + ds:.3f} {t[0]:.6f} {t[1]:.6f} {t[2]:.6f} "
                        f"{q[0]:.6f} {q[1]:.6f} {q[2]:.6f} {q[3]:.6f}\n")
    res = run_report(["--gt", str(gt_file), dbp])
    r = res[0]
    assert r["rmse"] >= 0 and r["rmse"] < 0.5


def test_report_loc_stats_and_listing(tmp_path, capsys):
    from rtabmap_tpu.tools.report import run_report

    dbp = str(tmp_path / "square.db")
    _build_square_db(dbp)
    # localization session: nodes in a map NOT present in the saved
    # optimized map -> their statistics aggregate per session
    db = Database(dbp, async_writes=False)
    for k in range(6):
        sig = Signature(id=100 + k, map_id=1, stamp=1000.0 + k * 100.0,
                        pose=_pose(float(k), 0.0, 0.0), weight=1)
        db.save_signature(sig)
        db.save_statistics(100 + k, 1000.0 + k * 100.0,
                           {"Loop/Odom correction norm/m": 0.1 * (k + 1)})
    db.flush()
    db.close()
    res = run_report(["Loop/Odom correction norm/m", "--loc", "63",
                      "--loc_delay", "60", dbp])
    ls = res[0]["loc_stats"]["Loop/Odom correction norm/m"]
    assert len(ls) == 6  # 100 s gaps split every tick into its own session
    assert ls[0]["total"] == 1
    out = capsys.readouterr().out
    assert "[loc]" in out and "mean=" in out

    res2 = run_report(["--stats", dbp])
    assert "Timing/Total/ms" in res2[0]["stats"]


def test_report_directory_scan_and_ignore_inter(tmp_path):
    from rtabmap_tpu.tools.report import run_report

    dbp = str(tmp_path / "square.db")
    _build_square_db(dbp)
    # mark node 6 as intermediate (weight -1): --ignore_inter_nodes must
    # still produce a connected, optimizable trajectory of 11 nodes
    db = Database(dbp, async_writes=False)
    sig = db.load_signature(6)
    sig.weight = -1
    db.save_signature(sig)
    db.flush()
    db.close()
    res = run_report(["--ignore_inter_nodes", str(tmp_path)])
    assert len(res) == 1  # directory scan found the db
    assert res[0]["nodes"] == 11
    assert res[0]["rmse"] < 0.5
