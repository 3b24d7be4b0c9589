"""Tools: TUM-format runner on synthetic data, export/import, info, reprocess."""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from PIL import Image

from rtabmap_tpu.datasets import synthetic as S
from rtabmap_tpu.geometry import camera as C
from rtabmap_tpu.geometry import transform as T


def make_tum_dir(tmp_path, n=10):
    """Render a synthetic sequence into TUM RGB-D on-disk layout."""
    cam = C.CameraModel.make(300.0, 300.0, 160.0, 120.0, 320, 240)
    root = tmp_path / "rgbd_dataset_freiburg2_synth"
    (root / "rgb").mkdir(parents=True)
    (root / "depth").mkdir()
    poses = S.loop_trajectory(64)[:n]
    rgb_lines, depth_lines, gt_lines = [], [], []
    for i in range(n):
        g, d = S.render(poses[i], cam)
        stamp = 1000.0 + i * 0.1
        rgb8 = (np.asarray(g) * 255).astype(np.uint8)
        Image.fromarray(rgb8).save(root / "rgb" / f"{stamp:.6f}.png")
        d16 = (np.asarray(d) * 5000).astype(np.uint16)
        Image.fromarray(d16).save(root / "depth" / f"{stamp:.6f}.png")
        rgb_lines.append(f"{stamp:.6f} rgb/{stamp:.6f}.png")
        depth_lines.append(f"{stamp:.6f} depth/{stamp:.6f}.png")
        q = np.asarray(T.to_quaternion(poses[i]))
        t = np.asarray(T.translation(poses[i]))
        gt_lines.append(f"{stamp:.6f} {t[0]} {t[1]} {t[2]} {q[0]} {q[1]} {q[2]} {q[3]}")
    (root / "rgb.txt").write_text("# rgb\n" + "\n".join(rgb_lines) + "\n")
    (root / "depth.txt").write_text("# depth\n" + "\n".join(depth_lines) + "\n")
    (root / "groundtruth.txt").write_text("# gt\n" + "\n".join(gt_lines) + "\n")
    return str(root)


@pytest.mark.slow
def test_rgbd_dataset_tool_roundtrip(tmp_path):
    from rtabmap_tpu.tools.cli import tool_info, tool_reprocess, tool_rgbd_dataset

    root = make_tum_dir(tmp_path, n=10)
    db_path = str(tmp_path / "out.db")
    out = tool_rgbd_dataset(["--Rtabmap/DetectionRate", "0", root, db_path])
    assert out["frames"] == 10
    assert out["lost"] == 0
    assert out["ate_odom"] < 0.2  # 8-bit gray + 16-bit depth quantization adds drift

    info = tool_info([db_path])
    assert info["nodes"] == 10
    assert info["vocabulary_words"] > 500

    # reprocess regression harness: re-run from the stored features
    slam2 = tool_reprocess(["--Rtabmap/DetectionRate", "0", db_path])
    assert len(slam2.stats_history) == 10

    # multi-database reprocess: the SAME db twice as ';'-separated inputs
    # appends the second pass as a NEW SESSION (Reprocess/main.cpp:94)
    out2 = str(tmp_path / "merged.db")
    slam3 = tool_reprocess(["--Rtabmap/DetectionRate", "0",
                            f"{db_path};{db_path}", out2])
    assert len(slam3.stats_history) == 20
    map_ids = {s.map_id for s in slam3.memory.signatures.values()}
    assert len(map_ids) == 2, map_ids


def test_export_import_formats(tmp_path):
    from rtabmap_tpu.memory.memory import Link
    from rtabmap_tpu.tools.export_poses import export_poses, import_poses

    poses = {i: np.asarray(T.from_xyzrpy(jnp.array([i * 0.1, 0.0, 0.0, 0.0, 0.0, i * 0.05])))
             for i in range(5)}
    links = [Link(i, i + 1, 0, poses[1], np.eye(6, dtype=np.float32)) for i in range(4)]
    for fmt in (0, 1, 2, 3, 4):
        path = str(tmp_path / f"poses_{fmt}.txt")
        export_poses(path, fmt, poses, links=links)
        got = import_poses(path, fmt)
        assert len(got) == 5
        keys = sorted(got)
        for k, i in enumerate(sorted(poses)):
            np.testing.assert_allclose(got[keys[k]], poses[i], atol=1e-4)


@pytest.mark.slow
def test_profiler_trace_and_textured_export_from_dataset(tmp_path):
    """Tpu/ProfileDir writes a JAX trace (SURVEY 5.1); dataset runs keep
    raw frames (Mem/BinDataKept) so rtabmap-export --texture works on the
    resulting store."""
    from rtabmap_tpu.tools.cli import tool_export_cloud, tool_rgbd_dataset

    root = make_tum_dir(tmp_path, n=6)
    db_path = str(tmp_path / "out.db")
    prof = str(tmp_path / "trace")
    out = tool_rgbd_dataset(["--Rtabmap/DetectionRate", "0",
                             "--Tpu/ProfileDir", prof, root, db_path])
    assert out["frames"] == 6
    trace_files = []
    for dirpath, _, files in os.walk(prof):
        trace_files += [f for f in files if "trace" in f or f.endswith(".pb")]
    assert trace_files, "no profiler trace written"

    obj = str(tmp_path / "scene.obj")
    nf = tool_export_cloud([db_path, obj, "--mesh", "--texture",
                            "--cam", "300,300,160,120,320,240",
                            "--voxel", "0.08"])
    assert nf > 20
    assert os.path.exists(str(tmp_path / "scene.png"))
