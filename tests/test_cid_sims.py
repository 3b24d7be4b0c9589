"""CID-SIMS dataset tool (reference tools/CidSimsDataset/main.cpp):
stamped color/depth layout, wheel-odometry dead reckoning, IMU filtering."""
import numpy as np
import pytest
from PIL import Image

from rtabmap_tpu.datasets import synthetic as S
from rtabmap_tpu.geometry import camera as C
from rtabmap_tpu.geometry import transform as T


def _make_cidsims_dir(tmp_path, n=8):
    """Render a synthetic sequence into the CID-SIMS on-disk layout at
    half resolution (the reader scales the published 640x480 calibration)."""
    from rtabmap_tpu.datasets.readers import CidSimsDataset

    fx, fy, cx, cy = CidSimsDataset.CALIB
    cam = C.CameraModel.make(fx / 2, fy / 2, cx / 2, cy / 2, 320, 240)
    root = tmp_path / "apartment9_9"
    (root / "color").mkdir(parents=True)
    (root / "depth").mkdir()
    poses = S.loop_trajectory(64)[:n]
    gt_lines, odom_lines, imu_lines = [], [], []
    for i in range(n):
        g, d = S.render(poses[i], cam)
        stamp = 500.0 + i * 0.1
        Image.fromarray((np.asarray(g) * 255).astype(np.uint8)).save(
            root / "color" / f"{stamp:.6f}.png")
        Image.fromarray((np.asarray(d) * 1000).astype(np.uint16)).save(
            root / "depth" / f"{stamp:.6f}.png")
        q = np.asarray(T.to_quaternion(poses[i]))
        t = np.asarray(T.translation(poses[i]))
        gt_lines.append(f"{stamp:.6f} {t[0]} {t[1]} {t[2]} "
                        f"{q[0]} {q[1]} {q[2]} {q[3]}")
        # 14-column wheel odometry rows: vx at col 8, vtheta at col 13
        row = [f"{stamp:.6f}"] + ["0"] * 13
        row[8], row[13] = "0.25", "0.0"
        odom_lines.append(" ".join(row))
        # two IMU samples per frame: stationary gravity-aligned readings
        for ds in (0.0, 0.05):
            imu_lines.append(f"{stamp + ds:.6f} 0 0 0 0 0 9.81")
    (root / "groundtruth.txt").write_text("\n".join(gt_lines) + "\n")
    (root / "odom.txt").write_text("\n".join(odom_lines) + "\n")
    (root / "imu.txt").write_text("\n".join(imu_lines) + "\n")
    return str(root)


def test_cidsims_reader_layout(tmp_path):
    from rtabmap_tpu.datasets.readers import CidSimsDataset

    root = _make_cidsims_dir(tmp_path, n=4)
    ds = CidSimsDataset(root, use_odom=True, use_imu=True)
    assert len(ds) == 4
    assert ds.camera.width == 320 and ds.camera.height == 240
    assert ds.camera.fx == pytest.approx(CidSimsDataset.CALIB[0] / 2)
    frames = list(ds)
    assert all(f.gt_pose is not None for f in frames)
    assert all(f.depth is not None for f in frames)
    # dead-reckoned wheel odometry: vx=0.25 over 0.3 s -> ~0.075 m forward
    assert frames[0].odom_pose is not None
    end = frames[-1].odom_pose
    assert end[0, 3] == pytest.approx(0.25 * 0.3, abs=1e-5)
    assert end[1, 3] == pytest.approx(0.0, abs=1e-6)
    # IMU batches cover every sample up to the last frame stamp exactly once
    # (2 per frame; the one after the last frame stamp is never consumed)
    total = sum(len(f.imu) for f in frames if f.imu)
    assert total == 2 * 4 - 1


def test_cidsims_wheel_dead_reckoning_turn(tmp_path):
    """vtheta integration: quarter-turn then straight ends off-axis."""
    from rtabmap_tpu.datasets.readers import CidSimsDataset

    root = _make_cidsims_dir(tmp_path, n=2)
    rows = []
    t0 = 500.0
    # 1 s straight at 1 m/s, then 1 s turning pi/2 rad/s, then 1 s straight
    for k in range(31):
        stamp = t0 + k * 0.1
        vx = "1.0" if k < 10 or k >= 20 else "0.0"
        vth = str(np.pi / 2) if 10 <= k < 20 else "0.0"
        row = [f"{stamp:.6f}"] + ["0"] * 13
        row[8], row[13] = vx, vth
        rows.append(" ".join(row))
    (pytest.importorskip("pathlib").Path(root) / "odom.txt").write_text(
        "\n".join(rows) + "\n")
    ds = CidSimsDataset(root, use_odom=True)
    x, y = ds.odom[-1][1][0, 3], ds.odom[-1][1][1, 3]
    # row k's velocity integrates over [k-1, k] (reference main.cpp:205-217):
    # rows 1-9 drive +x 0.9 m, rows 10-19 rotate pi/2 in place,
    # rows 20-30 drive +y 1.1 m
    assert x == pytest.approx(0.9, abs=1e-5)
    assert y == pytest.approx(1.1, abs=1e-5)


@pytest.mark.slow
def test_cid_sims_dataset_tool_end_to_end(tmp_path):
    from rtabmap_tpu.tools.cli import tool_cid_sims_dataset

    root = _make_cidsims_dir(tmp_path, n=8)
    db_path = str(tmp_path / "out.db")
    out = tool_cid_sims_dataset([
        "--Rtabmap/DetectionRate", "0", "--gt", "--odom", "--imu", "0",
        root, db_path])
    assert out["frames"] == 8
    assert out["lost"] == 0
    assert "ate_odom" in out and out["ate_odom"] < 0.3
