"""RGBD/NeighborLinkRefining: scan-ICP polish of odometry neighbor links."""
import jax
import jax.numpy as jnp
import numpy as np

from rtabmap_tpu.core.frame import extract_features
from rtabmap_tpu.core.laser_scan import ScanFormat, make_scan
from rtabmap_tpu.datasets import synthetic as S
from rtabmap_tpu.engine.rtabmap import Rtabmap
from rtabmap_tpu.geometry import camera as C
from rtabmap_tpu.geometry import transform as T
from rtabmap_tpu.memory.memory import LINK_NEIGHBOR
from rtabmap_tpu.utils.params import Parameters


def _room_scan(pose_wc, n=512, seed=0):
    """Synthetic 2D-ish lidar: points on a square room boundary, expressed
    in the sensor frame at pose_wc."""
    rng = np.random.default_rng(seed)
    ang = rng.uniform(0, 2 * np.pi, n)
    # unit square room of half-size 3 centered at origin (world)
    dx, dz = np.cos(ang), np.sin(ang)
    t = np.minimum(3.0 / np.maximum(np.abs(dx), 1e-6),
                   3.0 / np.maximum(np.abs(dz), 1e-6))
    pts_w = np.stack([dx * t, rng.uniform(-0.1, 0.1, n), dz * t], 1).astype(np.float32)
    Tcw = np.asarray(T.inverse(jnp.asarray(pose_wc)))
    pts_c = pts_w @ Tcw[:, :3].T + Tcw[:, 3]
    return make_scan(jnp.asarray(pts_c), fmt=ScanFormat.XYZ,
                     valid=jnp.ones(n, bool))


def test_neighbor_link_scan_refining():
    cam = C.CameraModel.make(160.0, 160.0, 79.5, 59.5, 160, 120)
    poses = S.loop_trajectory(64)[:3]
    grays, depths = S.render_sequence(poses, cam)
    ext = jax.jit(lambda g, d: extract_features(g, d, cam, 256))
    p = Parameters({"RGBD/NeighborLinkRefining": True,
                    "Rtabmap/DetectionRate": 0})
    slam = Rtabmap(cam, p, node_capacity=64, words_per_frame=256)
    # odometry pose for frame 1 is biased; scans are exact -> ICP should
    # pull the neighbor link back toward the true relative transform
    true_rel = np.asarray(T.relative(poses[0], poses[1]))
    bias = np.asarray(T.se3_exp(jnp.asarray([0.04, 0.0, -0.03, 0.0, 0.0, 0.0])))
    odom1 = np.asarray(T.compose(poses[1], jnp.asarray(bias)))
    slam.process(ext(grays[0], depths[0]), np.asarray(poses[0]),
                 np.eye(6) * 1e-4, stamp=1.0, scan=_room_scan(poses[0]))
    st = slam.process(ext(grays[1], depths[1]), odom1,
                      np.eye(6) * 1e-4, stamp=2.0,
                      scan=_room_scan(poses[1], seed=1))  # sensed at TRUE pose
    assert st.get("Odometry/Refined by scan/", 0) == 1
    sig2 = slam.memory.get(st.ref_id)
    prev = slam.memory.get(st.ref_id - 1)
    lk = prev.links[st.ref_id]
    assert lk.type == LINK_NEIGHBOR
    # refined link closer to truth than the biased odometry link
    biased_rel = np.asarray(T.relative(jnp.asarray(poses[0]), jnp.asarray(odom1)))
    err_ref = np.linalg.norm(lk.transform[:, 3] - true_rel[:, 3])
    err_biased = np.linalg.norm(biased_rel[:, 3] - true_rel[:, 3])
    assert err_ref < err_biased * 0.7, (err_ref, err_biased)


def test_proximity_scan_multi_closure():
    """Scan-matching proximity vs the assembled local scan map
    (reference: Memory::computeIcpTransformMulti, Rtabmap.cpp:3038):
    with feature-poor frames (no visual registration possible) a
    loop-return is still closed through multi-scan ICP."""
    cam = C.CameraModel.make(160.0, 160.0, 79.5, 59.5, 160, 120)
    rng = np.random.default_rng(0)
    ext = jax.jit(lambda g, d: extract_features(g, d, cam, 128))
    p = Parameters({
        "Rtabmap/DetectionRate": 0,
        "RGBD/LocalRadius": 2.0,
        "Rtabmap/LoopThr": 2.0,        # disable appearance closures
        "Icp/MaxCorrespondenceDistance": 0.5,
    })
    slam = Rtabmap(cam, p, node_capacity=64, words_per_frame=128)

    # square path that returns near the start; random images (features
    # won't re-match visually), exact scans of the shared room
    wp = np.array([[0, 0], [0.8, 0], [1.7, 0], [2.5, 0],
                   [2.5, 0.8], [2.5, 1.7], [2.5, 2.5],
                   [1.7, 2.5], [0.8, 2.5], [0, 2.5],
                   [0, 1.7], [0, 0.8], [0.3, 0.2]], np.float32)
    poses = []
    for x, z in wp:
        P = np.eye(3, 4, dtype=np.float32)
        P[0, 3], P[2, 3] = x, z
        poses.append(P)
    icp_multi = 0
    for k, P in enumerate(poses):
        g = jnp.asarray(rng.random((120, 160), np.float32))
        d = jnp.asarray(1.0 + rng.random((120, 160), np.float32))
        st = slam.process(ext(g, d), P, np.eye(6) * 1e-4, stamp=float(k + 1),
                          scan=_room_scan(jnp.asarray(P), seed=k))
        icp_multi += st.get("Proximity/Space detections added icp multi/", 0)
    assert icp_multi >= 1, "no scan-multi proximity closure added"
