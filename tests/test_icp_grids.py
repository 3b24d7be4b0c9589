"""ICP registration + cloud utils + occupancy grids."""
import jax
import jax.numpy as jnp
import numpy as np

from rtabmap_tpu.geometry import camera as C
from rtabmap_tpu.geometry import transform as T
from rtabmap_tpu.ops import cloud as CL
from rtabmap_tpu.ops import icp as ICP
from rtabmap_tpu.datasets import synthetic as S

CAM = C.CameraModel.make(300.0, 300.0, 160.0, 120.0, 320, 240)


def box_cloud(key, n=1200):
    """Points on two perpendicular walls + floor (well-constrained for ICP)."""
    k1, k2, k3 = jax.random.split(key, 3)
    w1 = jnp.stack([jax.random.uniform(k1, (n // 3,)) * 4, jnp.zeros(n // 3),
                    jax.random.uniform(k2, (n // 3,)) * 2], -1)
    w2 = jnp.stack([jnp.zeros(n // 3), jax.random.uniform(k2, (n // 3,)) * 4,
                    jax.random.uniform(k3, (n // 3,)) * 2], -1)
    fl = jnp.stack([jax.random.uniform(k3, (n - 2 * (n // 3),)) * 4,
                    jax.random.uniform(k1, (n - 2 * (n // 3),)) * 4,
                    jnp.zeros(n - 2 * (n // 3))], -1)
    return jnp.concatenate([w1, w2, fl])


def test_icp_point_to_point():
    key = jax.random.PRNGKey(0)
    dst = box_cloud(key)
    gt = T.from_xyzrpy(jnp.array([0.08, -0.05, 0.03, 0.02, -0.01, 0.04]))
    src = T.apply(T.inverse(gt)[None], dst[None])[0]
    valid = jnp.ones((dst.shape[0],), bool)
    res = ICP.icp(src, valid, dst, valid, iters=25, max_corr_dist=0.5)
    assert bool(res.valid)
    err = float(jnp.linalg.norm(T.se3_log(T.relative(gt, res.transform))))
    assert err < 0.01, err


def test_icp_point_to_plane_faster_convergence():
    key = jax.random.PRNGKey(1)
    dst = box_cloud(key)
    gt = T.from_xyzrpy(jnp.array([0.15, -0.1, 0.05, 0.03, 0.02, -0.05]))
    src = T.apply(T.inverse(gt)[None], dst[None])[0]
    valid = jnp.ones((dst.shape[0],), bool)
    res, cov = ICP.register_scans(src, valid, dst, valid, voxel=0.0,
                                  point_to_plane=True, iters=12)
    assert bool(res.valid)
    err = float(jnp.linalg.norm(T.se3_log(T.relative(gt, res.transform))))
    assert err < 0.02, err
    assert np.isfinite(np.asarray(cov)).all()


def test_voxel_filter_reduces():
    key = jax.random.PRNGKey(2)
    pts = jax.random.uniform(key, (2000, 3)) * 1.0
    valid = jnp.ones((2000,), bool)
    kept = CL.voxel_filter(pts, valid, voxel=0.2)
    assert int(kept.sum()) < 2000
    # roughly one point per occupied voxel (5^3 = max 125 cells)
    assert int(kept.sum()) <= 150


def test_normals_on_plane():
    key = jax.random.PRNGKey(3)
    xy = jax.random.uniform(key, (256, 2)) * 2
    pts = jnp.concatenate([xy, jnp.zeros((256, 1))], -1)
    valid = jnp.ones((256,), bool)
    normals, curv = CL.estimate_normals(pts, valid, k=8,
                                        viewpoint=jnp.array([0.0, 0.0, 5.0]))
    nz = np.abs(np.asarray(normals[:, 2]))
    assert (nz > 0.99).mean() > 0.95
    assert float(jnp.max(curv)) < 0.05


def test_local_grid_and_occupancy():
    from rtabmap_tpu.maps import grids as G

    cam_pose = S.loop_trajectory(64)[0]
    gray, depth = S.render(cam_pose, CAM)
    lg = G.local_grid_from_depth(depth, CAM, cell_size=0.1)
    assert int(lg.obstacles_valid.sum()) > 50
    assert int(lg.empty_valid.sum()) > 100

    # the grid expects BASE poses; synthetic world is y-up
    base_T_cam = jnp.asarray(
        [[0.0, 0.0, 1.0, 0.0], [-1.0, 0.0, 0.0, 0.0], [0.0, -1.0, 0.0, 0.0]],
        jnp.float32)
    pose = np.asarray(T.compose(cam_pose, T.inverse(base_T_cam)))
    occ = G.OccupancyGrid(cell_size=0.1, size_m=20.0, up_axis=1)
    occ.update(1, np.asarray(pose), lg)
    m = occ.to_occupancy()
    assert (m == 100).sum() > 20      # some occupied
    assert (m == 0).sum() > 50        # some free
    assert (m == -1).sum() > m.size // 2  # mostly unknown

    # re-assembly at a shifted pose moves cells without duplication
    shifted = np.asarray(T.compose(T.from_xyzrpy(jnp.array([1.0, 0, 0, 0, 0, 0])), jnp.asarray(pose)))
    occ.assemble({1: shifted})
    m2 = occ.to_occupancy()
    assert abs(int((m2 == 100).sum()) - int((m == 100).sum())) < max(60, (m == 100).sum())


def test_cloud_map_assemble():
    from rtabmap_tpu.maps.grids import CloudMap

    cm = CloudMap(voxel=0.1)
    pts = np.random.RandomState(0).rand(500, 3).astype(np.float32)
    cm.update(1, np.eye(3, 4, dtype=np.float32), pts, np.ones(500, bool))
    cm.update(2, np.eye(3, 4, dtype=np.float32), pts, np.ones(500, bool))  # duplicate
    cloud = cm.assemble()
    assert 0 < len(cloud) <= 1000
    # voxel dedupe collapses the duplicate node
    assert len(cloud) < 600
