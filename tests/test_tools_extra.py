"""reduce_graph and matcher CLI tools."""
import numpy as np
import pytest

from rtabmap_tpu.memory.db import Database
from rtabmap_tpu.memory.memory import (
    LINK_GLOBAL_CLOSURE, LINK_NEIGHBOR, LINK_NEIGHBOR_MERGED, Link, Signature,
)
from rtabmap_tpu.tools.cli import tool_matcher, tool_reduce_graph


def _chain_db(path, n=9):
    """Nodes 1..n in a line (neighbor step +1m in x), loop link n<->1."""
    db = Database(path, async_writes=False)
    step = np.eye(3, 4, dtype=np.float32)
    step[0, 3] = 1.0
    for i in range(1, n + 1):
        pose = np.eye(3, 4, dtype=np.float32)
        pose[0, 3] = float(i - 1)
        sig = Signature(id=i, map_id=0, stamp=float(i), pose=pose, weight=0)
        if i < n:
            sig.links[i + 1] = Link(i, i + 1, LINK_NEIGHBOR, step.copy(),
                                    np.eye(6, dtype=np.float32))
        db.save_signature(sig)
    loop_sig = db.load_signature(n)
    loop = np.eye(3, 4, dtype=np.float32)
    loop[0, 3] = -(n - 1.0)
    loop_sig.links[1] = Link(n, 1, LINK_GLOBAL_CLOSURE, loop,
                             np.eye(6, dtype=np.float32))
    db.save_signature(loop_sig)
    db.flush()
    db.close()


def test_reduce_graph_composes_neighbors(tmp_path):
    src = str(tmp_path / "src.db")
    dst = str(tmp_path / "dst.db")
    _chain_db(src, n=9)
    kept = tool_reduce_graph([src, dst, "2"])
    db = Database(dst, async_writes=False)
    ids = db.all_node_ids()
    assert len(ids) == kept and kept < 9
    assert 1 in ids and 9 in ids  # closure anchors preserved
    links = db.all_links()
    merged = [l for l in links if l.type == LINK_NEIGHBOR_MERGED]
    assert merged, "composed neighbor links expected"
    # composed transform spans the removed node: |t| == 2 m
    for l in merged:
        assert abs(abs(l.transform[0, 3]) - (l.to_id - l.from_id)) < 1e-5
    # closure link survived
    assert any(l.type == LINK_GLOBAL_CLOSURE for l in links)
    # graph is still connected 1 -> 9 through neighbor(+merged) links
    adj = {}
    for l in links:
        if l.type in (LINK_NEIGHBOR, LINK_NEIGHBOR_MERGED):
            adj.setdefault(l.from_id, set()).add(l.to_id)
            adj.setdefault(l.to_id, set()).add(l.from_id)
    seen, stack = set(), [1]
    while stack:
        u = stack.pop()
        if u in seen:
            continue
        seen.add(u)
        stack += list(adj.get(u, ()))
    assert 9 in seen
    db.close()


def test_matcher_tool(tmp_path):
    from PIL import Image

    rng = np.random.default_rng(0)
    base = (rng.random((120, 160)) * 60).astype(np.uint8)
    base[30:90:6, 40:120] += 120
    base[30:90, 40:120:6] += 120
    a = str(tmp_path / "a.png")
    b = str(tmp_path / "b.png")
    Image.fromarray(base).save(a)
    Image.fromarray(np.roll(base, 3, axis=1)).save(b)  # 3px shift
    out = tool_matcher([a, b])
    assert out["matches"] > 20
    assert out["inliers"] > 15 and out["ok"]


def test_kitti_dataset_tool_synthetic(tmp_path):
    """KITTI-layout stereo benchmark end-to-end: synthetic stereo pair
    rendering -> reader -> stereo VO -> KITTI t_err/r_err + ATE
    (reference: tools/KittiDataset/main.cpp)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from PIL import Image

    from rtabmap_tpu.datasets import synthetic as S
    from rtabmap_tpu.geometry import camera as C
    from rtabmap_tpu.geometry import transform as T
    from rtabmap_tpu.tools.cli import tool_kitti_dataset

    cam = C.CameraModel.make(300.0, 300.0, 160.0, 120.0, 320, 240)
    baseline = 0.12
    n = 8
    seq = tmp_path / "00"
    (seq / "image_0").mkdir(parents=True)
    (seq / "image_1").mkdir()
    poses = S.loop_trajectory(64)[:n]
    shift = np.eye(3, 4, dtype=np.float32)
    shift[0, 3] = baseline
    gt_rows = []
    for i in range(n):
        g0, _ = S.render(poses[i], cam)
        right_pose = np.asarray(T.compose(jnp.asarray(poses[i]),
                                          jnp.asarray(shift)))
        g1, _ = S.render(right_pose, cam)
        Image.fromarray((np.asarray(g0) * 255).astype(np.uint8)).save(
            seq / "image_0" / f"{i:06d}.png")
        Image.fromarray((np.asarray(g1) * 255).astype(np.uint8)).save(
            seq / "image_1" / f"{i:06d}.png")
        rel = np.asarray(T.relative(jnp.asarray(poses[0]),
                                    jnp.asarray(poses[i])))
        gt_rows.append(rel.reshape(-1))
    (seq / "times.txt").write_text("\n".join(f"{0.1*i:.6f}" for i in range(n)))
    (seq / "calib.txt").write_text(
        "P0: 300 0 160 0 0 300 120 0 0 0 1 0\n"
        f"P1: 300 0 160 {-300*baseline} 0 300 120 0 0 0 1 0\n")
    poses_file = str(tmp_path / "00.txt")
    np.savetxt(poses_file, np.stack(gt_rows))

    out = tool_kitti_dataset(["--Rtabmap/DetectionRate", "0",
                              str(seq), poses_file])
    assert out["frames"] == n and out["lost"] == 0
    assert out["ate_odom"] < 0.35
    assert "kitti_t_err_pct" in out


def test_euroc_reader_layout(tmp_path):
    """EuRoC ASL directory parsing: cam0/cam1 CSV streams + nearest
    ground-truth association (reference: tools/EurocDataset/main.cpp)."""
    import numpy as np
    from PIL import Image

    from rtabmap_tpu.datasets.readers import EurocDataset

    root = tmp_path / "MH01"
    for c in ("cam0", "cam1"):
        (root / "mav0" / c / "data").mkdir(parents=True)
    (root / "mav0" / "state_groundtruth_estimate0").mkdir()
    rng = np.random.RandomState(0)
    rows = ["#timestamp,filename"]
    gt_rows = ["#ts,x,y,z,qw,qx,qy,qz"]
    for i in range(5):
        ts = 1403636579763555584 + i * 50_000_000
        name = f"{ts}.png"
        img = (rng.rand(48, 75) * 255).astype(np.uint8)
        for c in ("cam0", "cam1"):
            Image.fromarray(img).save(root / "mav0" / c / "data" / name)
        rows.append(f"{ts},{name}")
        # gt offset by 3ms (association must still find it)
        gt_rows.append(f"{ts + 3_000_000},{0.1*i},0,0,1,0,0,0")
    (root / "mav0" / "cam0" / "data.csv").write_text("\n".join(rows))
    (root / "mav0" / "cam1" / "data.csv").write_text("\n".join(rows))
    (root / "mav0" / "state_groundtruth_estimate0" / "data.csv").write_text(
        "\n".join(gt_rows))

    ds = EurocDataset(str(root))
    assert len(ds) == 5
    frames = list(ds)
    assert all(f.right is not None for f in frames)
    assert all(f.gt_pose is not None for f in frames)
    assert abs(frames[3].gt_pose[0, 3] - 0.3) < 1e-5
    assert ds.camera.width == 752 and abs(ds.stereo.baseline - 0.11) < 1e-6
