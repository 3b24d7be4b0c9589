"""Synthetic RGB-D world: procedurally-textured box room + analytic renderer.

Role: the test/benchmark fixture generator. The reference validates with
recorded datasets (TUM/KITTI/EuRoC + data/samples, see SURVEY.md §4); in
this sandbox no recorded data exists, so sequences with exact ground-truth
poses and depth are rendered analytically. Ray-casting a box room against
5 planes is fully vectorized (one jit per frame) and the multi-octave value
noise texture gives dense trackable corners.

Camera convention: optical frame (x right, y down, z forward), pose =
camera-in-world (3,4).
"""
from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from rtabmap_tpu.geometry import camera as C
from rtabmap_tpu.geometry import transform as T


class World(NamedTuple):
    half_extent: jnp.ndarray  # (3,) box half-sizes (room walls at +-h)
    seed: int = 0


DEFAULT_WORLD = World(half_extent=jnp.array([4.0, 3.0, 4.0]), seed=0)


# ----------------------------------------------------------------- value noise


def _hash2(ix, iy, seed):
    u = lambda v: jnp.uint32(v)
    h = ix.astype(jnp.uint32) * u(374761393) + iy.astype(jnp.uint32) * u(668265263) + u(seed % (2**31)) * u(144665)
    h = (h ^ (h >> u(13))) * u(1274126177)
    return ((h ^ (h >> u(16))) & u(0xFFFF)).astype(jnp.float32) / 65535.0


def value_noise(x, y, seed: int, octaves: int = 4, base_freq: float = 2.0):
    """Multi-octave bilinear value noise over continuous coords (any shape)."""
    out = jnp.zeros_like(x)
    amp = 1.0
    total = 0.0
    for o in range(octaves):
        f = base_freq * (2.0 ** o)
        xs, ys = x * f, y * f
        ix, iy = jnp.floor(xs), jnp.floor(ys)
        fx, fy = xs - ix, ys - iy
        fx = fx * fx * (3 - 2 * fx)
        fy = fy * fy * (3 - 2 * fy)
        ixi, iyi = ix.astype(jnp.int32), iy.astype(jnp.int32)
        s = seed * 7919 + o * 104729
        v00 = _hash2(ixi, iyi, s)
        v10 = _hash2(ixi + 1, iyi, s)
        v01 = _hash2(ixi, iyi + 1, s)
        v11 = _hash2(ixi + 1, iyi + 1, s)
        v = (v00 * (1 - fx) + v10 * fx) * (1 - fy) + (v01 * (1 - fx) + v11 * fx) * fy
        out = out + amp * v
        total += amp
        amp *= 0.55
    return out / total


# ------------------------------------------------------------------- renderer


def render(pose_wc, cam: C.CameraModel, world: World = DEFAULT_WORLD):
    """Render (gray, depth) for a camera pose (3,4 camera-in-world).

    Gray in [0,1] (H,W); depth in meters (H,W), 0 where no hit.
    """
    H, W = cam.height, cam.width
    vv, uu = jnp.meshgrid(jnp.arange(H, dtype=jnp.float32), jnp.arange(W, dtype=jnp.float32), indexing="ij")
    dirs_cam = jnp.stack(
        [(uu - cam.cx) / cam.fx, (vv - cam.cy) / cam.fy, jnp.ones_like(uu)], axis=-1
    )  # (H,W,3) unnormalized: z-depth = t for ray p = o + t*dir
    Rwc = T.rotation(pose_wc)
    origin = T.translation(pose_wc)
    dirs = jnp.einsum("ij,hwj->hwi", Rwc, dirs_cam)

    he = world.half_extent
    best_t = jnp.full((H, W), jnp.inf)
    best_col = jnp.zeros((H, W))
    # 6 box planes: axis a at +-he[a]; texture on the two in-plane coords
    for axis in range(3):
        for sgn in (-1.0, 1.0):
            denom = dirs[..., axis]
            denom = jnp.where(jnp.abs(denom) < 1e-9, 1e-9, denom)
            t = (sgn * he[axis] - origin[axis]) / denom
            hit = origin[None, None, :] + t[..., None] * dirs
            a1, a2 = [i for i in range(3) if i != axis]
            inside = (
                (t > 0.05)
                & (jnp.abs(hit[..., a1]) <= he[a1] + 1e-4)
                & (jnp.abs(hit[..., a2]) <= he[a2] + 1e-4)
            )
            tex = value_noise(
                hit[..., a1] * 0.5, hit[..., a2] * 0.5,
                seed=world.seed * 31 + axis * 2 + (1 if sgn > 0 else 0),
            )
            closer = inside & (t < best_t)
            best_t = jnp.where(closer, t, best_t)
            best_col = jnp.where(closer, tex, best_col)

    depth = jnp.where(jnp.isfinite(best_t), best_t, 0.0)
    return best_col, depth


# ----------------------------------------------------------------- trajectories


def loop_trajectory(n: int, radius: float = 1.5, height: float = 0.0,
                    world: World = DEFAULT_WORLD):
    """Closed loop inside the room: camera orbits the center looking outward.

    Returns (n,3,4) camera-in-world poses; frame 0 and frame n-1 coincide in
    viewpoint -> guaranteed loop-closure opportunity.
    """
    poses = []
    for i in range(n):
        a = 2.0 * np.pi * i / n
        pos = np.array([radius * np.cos(a), height, radius * np.sin(a)], np.float32)
        # look outward from center
        fwd = pos / np.linalg.norm(pos)
        up = np.array([0.0, -1.0, 0.0], np.float32)  # y-down optical
        right = np.cross(up, fwd)
        right /= np.linalg.norm(right)
        upv = np.cross(fwd, right)
        Rcw = np.stack([right, upv, fwd], axis=1)  # columns: camera axes in world
        poses.append(np.concatenate([Rcw, pos[:, None]], axis=1))
    return jnp.asarray(np.stack(poses))


def corridor_trajectory(n: int, length: float = 5.0, world: World = DEFAULT_WORLD):
    """Straight dolly move toward a wall (no loop)."""
    poses = []
    for i in range(n):
        z = -length / 2 + length * i / max(n - 1, 1)
        R = np.eye(3, dtype=np.float32)
        poses.append(np.concatenate([R, np.array([[0.0], [0.0], [z]], np.float32)], axis=1))
    return jnp.asarray(np.stack(poses))


def render_sequence(poses, cam: C.CameraModel, world: World = DEFAULT_WORLD,
                    depth_noise: float = 0.0, key=None):
    """Host helper: render a full sequence -> (grays (N,H,W), depths (N,H,W))."""
    rfn = jax.jit(lambda p: render(p, cam, world))
    grays, depths = [], []
    for i in range(poses.shape[0]):
        g, d = rfn(poses[i])
        if depth_noise > 0.0 and key is not None:
            key, sub = jax.random.split(key)
            d = jnp.where(d > 0, d + depth_noise * d * jax.random.normal(sub, d.shape), 0.0)
        grays.append(g)
        depths.append(d)
    return jnp.stack(grays), jnp.stack(depths)


# ----------------------------------------------------------------- lidar


def lidar_scan(pose_sw, n_azimuth: int = 360, n_rings: int = 8,
               room_half=(4.0, 3.0, 1.5), pillars=((1.5, 0.8, 0.4), (-2.0, -1.2, 0.5)),
               elev_span: float = 0.35, noise: float = 0.0, key=None):
    """Analytic multi-ring 360-degree LiDAR in a box room with cylindrical
    pillars (synthetic stand-in for a VLP-16 stream; reference:
    examples/LidarMapping uses a live Velodyne). Returns (N,3) points in
    the SENSOR frame + validity mask, N = n_azimuth * n_rings.

    ``pose_sw``: (3,4) sensor-in-world. Room is the axis-aligned box
    |x|<hx, |y|<hy, |z|<hz; pillars are vertical cylinders (cx, cy, r).
    """
    hx, hy, hz = room_half
    az = jnp.linspace(0.0, 2.0 * jnp.pi, n_azimuth, endpoint=False)
    el = jnp.linspace(-elev_span, elev_span, n_rings)
    azg, elg = jnp.meshgrid(az, el, indexing="ij")
    d_s = jnp.stack([jnp.cos(elg) * jnp.cos(azg),
                     jnp.cos(elg) * jnp.sin(azg),
                     jnp.sin(elg)], axis=-1).reshape(-1, 3)   # sensor frame
    R = pose_sw[:, :3]
    o = pose_sw[:, 3]
    d = d_s @ R.T                                             # world frame

    # exit distance through the box (sensor is inside): per-axis slab exit
    half = jnp.asarray([hx, hy, hz])
    safe = jnp.where(jnp.abs(d) < 1e-9, 1e-9, d)
    t_axis = (jnp.sign(safe) * half - o) / safe
    t = jnp.min(t_axis, axis=-1)

    # cylinder pillars: |o_xy + t d_xy - c|^2 = r^2, keep nearest positive hit
    for (cx, cy, r) in pillars or ():
        oc = o[:2] - jnp.asarray([cx, cy])
        a = jnp.sum(d[:, :2] ** 2, axis=-1)
        b = 2.0 * (d[:, :2] @ oc)
        c = jnp.sum(oc ** 2) - r * r
        disc = b * b - 4 * a * c
        hit = disc > 0
        tc = (-b - jnp.sqrt(jnp.where(hit, disc, 0.0))) / jnp.maximum(2 * a, 1e-12)
        t = jnp.where(hit & (tc > 0.05) & (tc < t), tc, t)

    pts_w = o[None] + t[:, None] * d
    if noise > 0.0 and key is not None:
        pts_w = pts_w + noise * jax.random.normal(key, pts_w.shape)
    pts_s = (pts_w - o[None]) @ R                             # back to sensor
    valid = (t > 0.05) & jnp.isfinite(t)
    return pts_s, valid


def lidar_trajectory(n: int, radius: float = 2.0, room_half=(4.0, 3.0, 1.5)):
    """Closed planar loop for the LiDAR sim: sensor circles the room center,
    x-axis tangent to the motion. Returns (n,3,4) sensor-in-world poses."""
    poses = []
    for i in range(n):
        a = 2.0 * np.pi * i / n
        pos = np.array([radius * np.cos(a), radius * np.sin(a), 0.0], np.float32)
        fwd = np.array([-np.sin(a), np.cos(a), 0.0], np.float32)
        up = np.array([0.0, 0.0, 1.0], np.float32)
        left = np.cross(up, fwd)
        Rsw = np.stack([fwd, left, up], axis=1)
        poses.append(np.concatenate([Rsw, pos[:, None]], axis=1))
    return jnp.asarray(np.stack(poses))


class FeatureWorld:
    """Render-free synthetic world for engine-level tests: a bank of
    landmark features spread along a straight corridor, each with a fixed
    ±1 descriptor and 3D position; the camera visits integer waypoints
    0.3 m apart and frame ``way`` sees the K features whose bank indices
    start at ``way * (K - overlap)`` (consecutive frames share ``overlap``
    features, so tf-idf likelihoods are graded like real data). Pixels are
    exact pinhole projections + noise, so PnP registration between
    revisits recovers near-identity transforms — loop closures close
    metrically, not just topologically.

    The cheap path to a deterministic multi-frame SLAM scenario (the
    image-rendering path in ``render()`` costs a feature-extraction
    compile; this feeds FrameFeatures directly)."""

    def __init__(self, cam: C.CameraModel, n_ways: int = 32, K: int = 128,
                 overlap: int = 64, desc_dim: int = 256, seed: int = 7,
                 step: float = 0.3):
        self.cam, self.K, self.step = cam, K, step
        self.S = K - overlap
        r = np.random.RandomState(seed)
        n_feat = n_ways * self.S + K
        self.desc = np.where(r.rand(n_feat, desc_dim) > 0.5, 1, -1).astype(np.int8)
        self.pos = np.stack([
            step * np.arange(n_feat) / self.S + r.uniform(-0.1, 0.1, n_feat),
            r.uniform(-0.8, 0.8, n_feat),
            r.uniform(2.0, 4.0, n_feat),
        ], axis=1).astype(np.float32)

    def pose(self, way: int, nudge: float = 0.0) -> np.ndarray:
        p = np.eye(3, 4, dtype=np.float32)
        p[0, 3] = self.step * way + nudge
        return p

    def frame(self, way: int, noise_seed: int = 0, px_noise: float = 0.2):
        from rtabmap_tpu.core.frame import FrameFeatures

        cam, K = self.cam, self.K
        f0 = way * self.S
        idx = np.arange(f0, f0 + K)
        pts = self.pos[idx].copy()
        pts[:, 0] -= self.step * way
        rn = np.random.RandomState(100000 + noise_seed)
        uv = np.stack([pts[:, 0] / pts[:, 2] * cam.fx + cam.cx,
                       pts[:, 1] / pts[:, 2] * cam.fy + cam.cy], axis=1)
        uv = (uv + rn.randn(K, 2) * px_noise).astype(np.float32)
        ones = np.ones((K,), bool)
        return FrameFeatures(
            uv=jnp.asarray(uv), desc=jnp.asarray(self.desc[idx]),
            pts3d=jnp.asarray(pts), valid=jnp.asarray(ones),
            valid3d=jnp.asarray(ones), angle=jnp.zeros((K,)),
            response=jnp.zeros((K,)))
