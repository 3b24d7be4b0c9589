"""Dataset-format proof fixtures: synthetic sequences rendered into the
REAL on-disk layouts of TUM RGB-D (rgb.txt/depth.txt/groundtruth.txt),
KITTI odometry (image_0/image_1 + calib.txt + times.txt + poses) and
EuRoC ASL (mav0/cam0,cam1 data.csv + sensor.yaml + ground-truth csv),
then run the ACTUAL CLI tools end-to-end with ATE gates — proving
`tool_rgbd/kitti/euroc_dataset` are runnable the day a real dataset
appears (VERDICT r3 #6; reference: tools/RgbdDataset/main.cpp:150-231,
tools/KittiDataset, tools/EurocDataset/main.cpp:284-307)."""
import numpy as np
import pytest
from PIL import Image

from rtabmap_tpu.datasets import synthetic as S
from rtabmap_tpu.geometry import camera as C
from rtabmap_tpu.geometry import transform as T

N_FRAMES = 8


def _save_gray(path, g):
    Image.fromarray((np.asarray(g) * 255).astype(np.uint8)).save(path)


def _trajectory(n):
    import jax.numpy as jnp

    return S.loop_trajectory(64)[:n]


def _right_pose(pose, baseline):
    import jax.numpy as jnp

    off = np.eye(3, 4, dtype=np.float32)
    off[0, 3] = baseline
    return np.asarray(T.compose(jnp.asarray(pose), jnp.asarray(off)))


# ----------------------------------------------------------------- TUM RGB-D


def _make_tum_dir(tmp_path, n=N_FRAMES):
    from rtabmap_tpu.datasets.readers import TUM_CALIB

    fx, fy, cx, cy = TUM_CALIB[2]
    cam = C.CameraModel.make(fx / 2, fy / 2, cx / 2, cy / 2, 320, 240)
    root = tmp_path / "rgbd_dataset_freiburg2_synth"
    (root / "rgb").mkdir(parents=True)
    (root / "depth").mkdir()
    poses = _trajectory(n)
    rgb_lines, depth_lines, gt_lines = [], [], []
    for i in range(n):
        g, d = S.render(poses[i], cam)
        stamp = 1000.0 + i * 0.1
        _save_gray(root / "rgb" / f"{stamp:.6f}.png", g)
        Image.fromarray((np.asarray(d) * 5000).astype(np.uint16)).save(
            root / "depth" / f"{stamp:.6f}.png")
        rgb_lines.append(f"{stamp:.6f} rgb/{stamp:.6f}.png")
        depth_lines.append(f"{stamp:.6f} depth/{stamp:.6f}.png")
        q = np.asarray(T.to_quaternion(poses[i]))
        t = np.asarray(T.translation(poses[i]))
        gt_lines.append(f"{stamp:.6f} {t[0]} {t[1]} {t[2]} "
                        f"{q[0]} {q[1]} {q[2]} {q[3]}")
    (root / "rgb.txt").write_text("# rgb\n" + "\n".join(rgb_lines) + "\n")
    (root / "depth.txt").write_text("# depth\n" + "\n".join(depth_lines) + "\n")
    (root / "groundtruth.txt").write_text(
        "# gt\n" + "\n".join(gt_lines) + "\n")
    return str(root), poses


@pytest.mark.slow
def test_tum_layout_end_to_end(tmp_path):
    from rtabmap_tpu.tools.cli import tool_rgbd_dataset

    root, _poses = _make_tum_dir(tmp_path)
    out = tool_rgbd_dataset(["--Rtabmap/DetectionRate", "0", root])
    assert out["frames"] == N_FRAMES and out["lost"] == 0
    assert "ate_slam" in out
    assert out["ate_slam"] < 0.10, out["ate_slam"]


# ------------------------------------------------------------ KITTI odometry


def _make_kitti_dir(tmp_path, n=N_FRAMES):
    fx = fy = 160.0
    cx, cy = 159.5, 119.5
    baseline = 0.54
    root = tmp_path / "sequences" / "00"
    (root / "image_0").mkdir(parents=True)
    (root / "image_1").mkdir()
    poses = _trajectory(n)
    P0 = np.array([[fx, 0, cx, 0], [0, fy, cy, 0], [0, 0, 1, 0]], np.float64)
    P1 = P0.copy()
    P1[0, 3] = -fx * baseline
    with open(root / "calib.txt", "w") as f:
        for name, P in (("P0", P0), ("P1", P1)):
            f.write(f"{name}: " + " ".join(f"{v:.6e}" for v in P.ravel())
                    + "\n")
    cam = C.CameraModel.make(fx, fy, cx, cy, 320, 240)
    times, pose_rows = [], []
    for i in range(n):
        g, _ = S.render(poses[i], cam)
        gr, _ = S.render(_right_pose(poses[i], baseline), cam)
        _save_gray(root / "image_0" / f"{i:06d}.png", g)
        _save_gray(root / "image_1" / f"{i:06d}.png", gr)
        times.append(f"{i * 0.1:.6e}")
        pose_rows.append(" ".join(
            f"{v:.6e}" for v in np.asarray(poses[i]).ravel()))
    (root / "times.txt").write_text("\n".join(times) + "\n")
    poses_dir = tmp_path / "poses"
    poses_dir.mkdir()
    (poses_dir / "00.txt").write_text("\n".join(pose_rows) + "\n")
    return str(root), str(poses_dir / "00.txt")


@pytest.mark.slow
def test_kitti_layout_end_to_end(tmp_path):
    from rtabmap_tpu.tools.cli import tool_kitti_dataset

    seq, poses_file = _make_kitti_dir(tmp_path)
    out = tool_kitti_dataset(["--Rtabmap/DetectionRate", "0", seq, poses_file])
    assert out["frames"] == N_FRAMES and out["lost"] == 0
    assert "ate_slam" in out and "kitti_t_err_pct" in out
    assert out["ate_slam"] < 0.15, out["ate_slam"]


# --------------------------------------------------------------- EuRoC ASL


def _make_euroc_dir(tmp_path, n=N_FRAMES):
    fx = fy = 160.0
    cx, cy = 159.5, 119.5
    baseline = 0.11
    cam = C.CameraModel.make(fx, fy, cx, cy, 320, 240)
    root = tmp_path / "MH_synth"
    poses = _trajectory(n)
    gt_rows = ["#timestamp, p_x, p_y, p_z, q_w, q_x, q_y, q_z"]
    for cname in ("cam0", "cam1"):
        (root / "mav0" / cname / "data").mkdir(parents=True)
        (root / "mav0" / cname / "sensor.yaml").write_text(
            "sensor_type: camera\n"
            f"resolution: [320, 240]\n"
            f"intrinsics: [{fx}, {fy}, {cx}, {cy}]\n"
            "distortion_coefficients: [0.0, 0.0, 0.0, 0.0]\n"
            f"baseline: {baseline}\n")
    (root / "mav0" / "state_groundtruth_estimate0").mkdir()
    cam0_rows = ["#timestamp [ns],filename"]
    for i in range(n):
        ns = 1000000000 * (100 + i)
        g, _ = S.render(poses[i], cam)
        gr, _ = S.render(_right_pose(poses[i], baseline), cam)
        _save_gray(root / "mav0" / "cam0" / "data" / f"{ns}.png", g)
        _save_gray(root / "mav0" / "cam1" / "data" / f"{ns}.png", gr)
        cam0_rows.append(f"{ns},{ns}.png")
        q = np.asarray(T.to_quaternion(poses[i]))  # (qx, qy, qz, qw)
        t = np.asarray(T.translation(poses[i]))
        gt_rows.append(f"{ns},{t[0]},{t[1]},{t[2]},"
                       f"{q[3]},{q[0]},{q[1]},{q[2]}")
    (root / "mav0" / "cam0" / "data.csv").write_text(
        "\n".join(cam0_rows) + "\n")
    (root / "mav0" / "cam1" / "data.csv").write_text(
        "\n".join(cam0_rows) + "\n")
    (root / "mav0" / "state_groundtruth_estimate0" / "data.csv").write_text(
        "\n".join(gt_rows) + "\n")
    return str(root)


@pytest.mark.slow
def test_euroc_layout_end_to_end(tmp_path):
    from rtabmap_tpu.tools.cli import tool_euroc_dataset

    root = _make_euroc_dir(tmp_path)
    out = tool_euroc_dataset(["--Rtabmap/DetectionRate", "0", root])
    assert out["frames"] == N_FRAMES and out["lost"] == 0
    assert "ate_slam" in out
    assert out["ate_slam"] < 0.15, out["ate_slam"]


def test_use_odom_features_param_changes_map_words(tmp_path):
    """Mem/UseOdomFeatures=false gives the map node its own Kp/MaxFeatures
    budget instead of reusing the odometry frame's full set (reference:
    Memory.cpp:5025 createSignature)."""
    from rtabmap_tpu.datasets.readers import TumRgbdDataset
    from rtabmap_tpu.tools.dataset_runner import run_dataset
    from rtabmap_tpu.utils.params import Parameters

    root, _ = _make_tum_dir(tmp_path, n=3)
    ds = TumRgbdDataset(root)
    p = Parameters({"Rtabmap/DetectionRate": 0,
                    "Mem/UseOdomFeatures": False,
                    "Kp/MaxFeatures": 100})
    out = run_dataset(iter(ds), ds.camera, p, max_kp=256, verbose=False)
    st = out["slam"].stats_history[-1]
    assert st.get("Keypoint/Current frame/words") <= 100
    # default: odometry features reused -> full budget
    ds2 = TumRgbdDataset(root)
    out2 = run_dataset(iter(ds2), ds2.camera,
                       Parameters({"Rtabmap/DetectionRate": 0}),
                       max_kp=256, verbose=False)
    st2 = out2["slam"].stats_history[-1]
    assert st2.get("Keypoint/Current frame/words") > 100
