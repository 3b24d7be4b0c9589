"""3D voxel occupancy map + elevation map."""
import jax.numpy as jnp
import numpy as np

from rtabmap_tpu.geometry import transform as T
from rtabmap_tpu.maps.voxel import BLOCK, ElevationMap, VoxelOccupancyMap


def _wall_cloud(n=400, z=3.0, seed=0):
    rng = np.random.default_rng(seed)
    pts = np.stack([rng.uniform(-1, 1, n), rng.uniform(-1, 1, n),
                    np.full(n, z)], axis=1).astype(np.float32)
    return pts


def test_voxel_occupied_and_free():
    m = VoxelOccupancyMap(voxel=0.1, max_range=10.0)
    pts = _wall_cloud()
    m.update(1, np.eye(3, 4, dtype=np.float32), pts, np.ones(len(pts), bool))
    # endpoints occupied
    p_occ = m.query(pts)
    assert (p_occ > 0.6).mean() > 0.9
    # mid-ray free
    p_free = m.query(pts * 0.5)
    assert (p_free < 0.4).mean() > 0.9
    # untouched space unknown
    p_unk = m.query(np.array([[5.0, 5.0, -3.0]]))
    np.testing.assert_allclose(p_unk, 0.5)
    centers, probs, _ = m.occupied_voxels()
    assert len(centers) > 50
    assert np.all(probs >= 0.65)
    # occupied voxels lie near the wall plane
    assert np.all(np.abs(centers[:, 2] - 3.0) < 0.2)


def test_voxel_reassemble_moves_map():
    m = VoxelOccupancyMap(voxel=0.1)
    pts = _wall_cloud(n=200)
    m.update(1, np.eye(3, 4, dtype=np.float32), pts, np.ones(len(pts), bool))
    c1, _, _ = m.occupied_voxels()
    # shift the node 1m in +x and re-assemble
    pose2 = np.eye(3, 4, dtype=np.float32)
    pose2[0, 3] = 1.0
    m.assemble({1: pose2})
    c2, _, _ = m.occupied_voxels()
    assert abs(np.median(c2[:, 0]) - np.median(c1[:, 0]) - 1.0) < 0.15


def test_voxel_colors():
    m = VoxelOccupancyMap(voxel=0.1)
    pts = _wall_cloud(n=100)
    cols = np.full((100, 3), 200, np.uint8)
    m.update(1, np.eye(3, 4, dtype=np.float32), pts, np.ones(100, bool), colors=cols)
    _, _, c = m.occupied_voxels()
    assert len(c) and (c == 200).all()


def test_elevation_map():
    m = ElevationMap(cell_size=0.25, size_m=10.0, up_axis=2)
    rng = np.random.default_rng(0)
    n = 500
    pts = np.stack([rng.uniform(-2, 2, n), rng.uniform(-2, 2, n),
                    rng.uniform(0.0, 0.3, n)], axis=1).astype(np.float32)
    # a "table" bump in one corner
    bump = (pts[:, 0] > 1.0) & (pts[:, 1] > 1.0)
    pts[bump, 2] += 1.0
    m.update(1, np.eye(3, 4, dtype=np.float32), pts, np.ones(n, bool))
    hmax, hmean, known = m.arrays()
    assert known.sum() > 20
    # cells over the bump are ~1m higher
    cell = lambda x, y: (int((y + 5.0) / 0.25), int((x + 5.0) / 0.25))
    iy, ix = cell(1.5, 1.5)
    jy, jx = cell(-1.5, -1.5)
    assert hmax[iy, ix] > hmax[jy, jx] + 0.6
    # mean <= max where known
    assert np.all(hmean[known] <= hmax[known] + 1e-5)


def test_elevation_reassemble():
    m = ElevationMap(cell_size=0.25, size_m=10.0)
    pts = np.array([[0.0, 0.0, 0.5]], np.float32)
    m.update(7, np.eye(3, 4, dtype=np.float32), pts, np.ones(1, bool))
    pose2 = np.eye(3, 4, dtype=np.float32)
    pose2[2, 3] = 1.0  # raise node by 1m
    m.assemble({7: pose2})
    hmax, _, known = m.arrays()
    assert np.nanmax(hmax[known]) > 1.4
