"""TSDF fusion + surface-net extraction + vertex coloring."""
import jax.numpy as jnp
import numpy as np

from rtabmap_tpu.geometry import camera as C
from rtabmap_tpu.maps.tsdf import TSDFVolume, color_vertices


CAM = C.CameraModel.make(60.0, 60.0, 31.5, 23.5, 64, 48)


def _wall_depth(z=1.0):
    return jnp.full((48, 64), z, jnp.float32)


def test_tsdf_wall_reconstruction():
    vol = TSDFVolume(origin=(-1.0, -1.0, 0.0), size_m=(2.0, 2.0, 2.0),
                     voxel=0.05)
    pose = np.eye(3, 4, dtype=np.float32)  # camera at origin looking +z
    for _ in range(3):
        vol.integrate(_wall_depth(1.0), pose, CAM)
    verts, faces = vol.extract_mesh()
    assert len(verts) > 50 and len(faces) > 50
    # surface sits at z == 1.0 (within a voxel)
    assert abs(np.median(verts[:, 2]) - 1.0) < 0.06
    # faces index valid vertices
    assert faces.max() < len(verts) and faces.min() >= 0
    # mesh should be a connected sheet facing the camera: spread in x/y
    assert verts[:, 0].std() > 0.1 and verts[:, 1].std() > 0.1


def test_tsdf_fusion_averages_noise():
    rng = np.random.default_rng(0)
    vol = TSDFVolume(origin=(-1.0, -1.0, 0.0), size_m=(2.0, 2.0, 2.0),
                     voxel=0.05)
    pose = np.eye(3, 4, dtype=np.float32)
    for _ in range(12):
        noisy = 1.0 + rng.normal(0, 0.02, (48, 64)).astype(np.float32)
        vol.integrate(jnp.asarray(noisy), pose, CAM)
    verts, _ = vol.extract_mesh()
    assert abs(np.median(verts[:, 2]) - 1.0) < 0.06
    assert np.std(verts[:, 2]) < 0.05


def test_vertex_coloring():
    vol = TSDFVolume(origin=(-1.0, -1.0, 0.0), size_m=(2.0, 2.0, 2.0),
                     voxel=0.05)
    pose = np.eye(3, 4, dtype=np.float32)
    vol.integrate(_wall_depth(1.0), pose, CAM)
    verts, _ = vol.extract_mesh()
    gray = jnp.full((48, 64), 0.75, jnp.float32)
    col, seen = color_vertices(verts, [pose], [gray], CAM)
    assert seen.mean() > 0.8
    np.testing.assert_allclose(col[seen], 0.75, atol=1e-5)
