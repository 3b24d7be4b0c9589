"""Meshing/export + marker detection."""
import numpy as np
import pytest

from rtabmap_tpu.geometry import camera as C
from rtabmap_tpu.datasets import synthetic as S
from rtabmap_tpu.maps import mesh as M

CAM = C.CameraModel.make(300.0, 300.0, 160.0, 120.0, 320, 240)


def test_organized_fast_mesh_and_export(tmp_path):
    pose = S.loop_trajectory(64)[0]
    gray, depth = S.render(pose, CAM)
    verts, faces, fvalid = M.organized_fast_mesh(depth, CAM, decimation=4)
    assert int(fvalid.sum()) > 1000
    normals = M.mesh_normals(verts, faces, fvalid)
    v, f, _ = M.compact_mesh(verts, faces, fvalid)
    assert f.max() < len(v)
    # export + header check
    ply = str(tmp_path / "m.ply")
    M.write_ply(ply, v, f)
    nv, nf = M.read_ply_counts(ply)
    assert nv == len(v) and nf == len(f)
    M.write_obj(str(tmp_path / "m.obj"), v, f)
    assert (tmp_path / "m.obj").stat().st_size > 1000


def test_mesh_rejects_depth_jumps():
    # two fronto-parallel planes with a big depth step
    depth = np.full((64, 64), 2.0, np.float32)
    depth[:, 32:] = 5.0
    import jax.numpy as jnp

    verts, faces, fvalid = M.organized_fast_mesh(jnp.asarray(depth), CAM, decimation=1)
    v = np.asarray(verts)
    f = np.asarray(faces)[np.asarray(fvalid)]
    # no face may straddle the jump: all 3 vertices on the same side
    xs = v[f][:, :, 2]  # z values
    same = np.all(np.abs(xs - xs[:, :1]) < 0.5, axis=1)
    assert same.all()


def test_gain_compensation():
    # image 1 is 20% darker than 0; 2 matches 0
    overlaps = [(0, 1, 1.0, 0.8), (0, 2, 1.0, 1.0), (1, 2, 0.8, 1.0)]
    g = M.gain_compensation(overlaps, 3)
    np.testing.assert_allclose(g[0], 1.0, atol=1e-6)
    np.testing.assert_allclose(g[1] * 0.8, g[0] * 1.0, atol=0.05)


def test_marker_detection():
    from rtabmap_tpu.ops.markers import MarkerDetector, draw_marker

    det = MarkerDetector("4X4_50", marker_length=0.2)
    img = np.full((480, 640), 255, np.uint8)
    m = draw_marker("4X4_50", 7, 160)
    img[160:320, 240:400] = m
    cam = C.CameraModel.make(500.0, 500.0, 320.0, 240.0, 640, 480)
    found = det.detect(img, cam)
    assert len(found) == 1
    lm = found[0]
    assert lm.id == 7
    # marker is centered and fronto-parallel; 160px/0.2m at f=500 -> z=0.625
    assert abs(lm.transform[2, 3] - 0.625) < 0.08, lm.transform
    assert abs(lm.transform[0, 3]) < 0.05 and abs(lm.transform[1, 3]) < 0.05


def test_engine_landmark_closure_corrects_drift():
    """Stage H: re-observing a fiducial landmark after odometric drift must
    pull the trajectory back (reference: Rtabmap.cpp:3203 landmark
    closures; landmarks are negative-id graph nodes)."""
    import jax
    from rtabmap_tpu.core.frame import extract_features
    from rtabmap_tpu.engine.rtabmap import Rtabmap
    from rtabmap_tpu.geometry import transform as T
    from rtabmap_tpu.ops.markers import Landmark
    from rtabmap_tpu.utils.params import Parameters

    import jax.numpy as jnp

    cam = C.CameraModel.make(160.0, 160.0, 79.5, 59.5, 160, 120)
    slam = Rtabmap(cam, Parameters(), node_capacity=32, words_per_frame=256)
    extract = jax.jit(lambda g, d: extract_features(g, d, cam, 256))

    gt = S.loop_trajectory(8)  # a loop: last pose returns near the first
    n = 8
    # odometry with injected drift: shift all poses after the first by dx
    drift = np.eye(3, 4, dtype=np.float32)
    marker_world = np.asarray(gt[0])  # landmark sits at the start pose
    for i in range(n):
        g, d = S.render(gt[i], cam)
        frame = extract(g, d)
        odom = np.asarray(gt[i]).copy()
        if i > 0:
            odom[0, 3] += 0.3  # constant offset = accumulated drift
        lms = None
        if i in (0, n - 1):
            # marker observed from the true pose: T_cam_marker
            t_cm = np.asarray(T.relative(gt[i], jnp.asarray(marker_world)))
            lms = [Landmark(id=7, transform=t_cm, size=0.2,
                            variance_linear=0.001, variance_angular=0.001)]
        slam.process(frame, odom, stamp=float(i + 1), landmarks=lms,
                     covariance=np.eye(6) * 0.01)  # soft odometry vs
        # stiff landmark (var 1e-3): the closure should absorb the drift

    assert -7 in slam.landmark_poses, "landmark node not in optimized graph"
    # the optimizer anchors the NEWEST node (gauge root), so the correction
    # shows up in the relative geometry: first-vs-last optimized relative
    # translation must match GT (raw odometry is off by the 0.3m drift)
    first_id, last_id = slam.memory.stm[0], slam.memory.stm[-1]
    if first_id not in slam.optimized_poses:
        first_id = sorted(slam.optimized_poses)[0]
    rel_opt = np.asarray(T.relative(
        jnp.asarray(slam.optimized_poses[last_id]),
        jnp.asarray(slam.optimized_poses[first_id])))
    rel_gt = np.asarray(T.relative(gt[n - 1], gt[0]))
    err = np.linalg.norm(rel_opt[:, 3] - rel_gt[:, 3])
    assert err < 0.12, err
    # landmark sits at the right place relative to the anchored last node
    rel_lm = np.asarray(T.relative(
        jnp.asarray(slam.optimized_poses[last_id]),
        jnp.asarray(slam.landmark_poses[-7])))
    rel_lm_gt = np.asarray(T.relative(gt[n - 1], jnp.asarray(marker_world)))
    lm_err = np.linalg.norm(rel_lm[:, 3] - rel_lm_gt[:, 3])
    assert lm_err < 0.12, lm_err
    slam.close()


def test_apriltag_detection_and_index_dictionaries():
    """AprilTag family + the reference's integer Marker/Dictionary indices
    (Parameters.h kMarkerDictionary: 17=APRILTAG_16h5 ... 20=36h11)."""
    from rtabmap_tpu.ops.markers import DICT_BY_INDEX, MarkerDetector, draw_marker

    assert DICT_BY_INDEX[17] == "APRILTAG_16h5"
    det = MarkerDetector(20, marker_length=0.2)  # APRILTAG_36h11 by index
    img = np.full((480, 640), 255, np.uint8)
    m = draw_marker("APRILTAG_36h11", 3, 160)
    img[160:320, 240:400] = m
    cam = C.CameraModel.make(500.0, 500.0, 320.0, 240.0, 640, 480)
    found = det.detect(img, cam)
    assert len(found) == 1 and found[0].id == 3
    assert abs(found[0].transform[2, 3] - 0.625) < 0.08
