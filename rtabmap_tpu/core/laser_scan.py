"""LaserScan: typed fixed-capacity point-cloud buffer.

Capability parity: the reference's ``LaserScan``
(/root/reference/corelib/include/rtabmap/core/LaserScan.h:37 — typed
formats XYZ/XYZI/XYZRGB/XYZNormal..., 2D or 3D, max points/range, local
transform). Slab design: (N,C) float array + channel layout tag +
validity mask, so scans drop straight into the ICP / occupancy kernels.
"""
from __future__ import annotations

from enum import IntEnum
from typing import NamedTuple, Optional

import jax.numpy as jnp
import numpy as np


class ScanFormat(IntEnum):
    XYZ = 0
    XYZI = 1
    XYZRGB = 2
    XYZN = 3        # + normals
    XYZIN = 4
    XY = 10         # 2D
    XYI = 11
    XYN = 13


_CHANNELS = {
    ScanFormat.XYZ: 3, ScanFormat.XYZI: 4, ScanFormat.XYZRGB: 6,
    ScanFormat.XYZN: 6, ScanFormat.XYZIN: 7,
    ScanFormat.XY: 2, ScanFormat.XYI: 3, ScanFormat.XYN: 4,
}


class LaserScan(NamedTuple):
    data: jnp.ndarray            # (N, C)
    valid: jnp.ndarray           # (N,)
    format: int
    max_range: float = 0.0
    local_transform: Optional[jnp.ndarray] = None  # (3,4) sensor in base

    @property
    def is_2d(self) -> bool:
        return self.format >= ScanFormat.XY

    @property
    def has_normals(self) -> bool:
        return self.format in (ScanFormat.XYZN, ScanFormat.XYZIN, ScanFormat.XYN)

    def xyz(self) -> jnp.ndarray:
        if self.is_2d:
            z = jnp.zeros((self.data.shape[0], 1), self.data.dtype)
            return jnp.concatenate([self.data[:, :2], z], axis=-1)
        return self.data[:, :3]

    def normals(self) -> Optional[jnp.ndarray]:
        if not self.has_normals:
            return None
        if self.format == ScanFormat.XYN:
            n2 = self.data[:, 2:4]
            return jnp.concatenate([n2, jnp.zeros((n2.shape[0], 1))], axis=-1)
        off = 4 if self.format == ScanFormat.XYZIN else 3
        return self.data[:, off:off + 3]


def make_scan(points, fmt: ScanFormat = ScanFormat.XYZ, valid=None,
              max_range: float = 0.0, capacity: Optional[int] = None,
              local_transform=None) -> LaserScan:
    pts = jnp.asarray(points, jnp.float32)
    n = pts.shape[0]
    if valid is None:
        valid = jnp.ones((n,), bool)
    if capacity is not None and capacity != n:
        if capacity < n:
            pts, valid = pts[:capacity], valid[:capacity]
        else:
            pts = jnp.pad(pts, ((0, capacity - n), (0, 0)))
            valid = jnp.pad(valid, (0, capacity - n))
    assert pts.shape[1] == _CHANNELS[fmt], (pts.shape, fmt)
    return LaserScan(data=pts, valid=valid, format=int(fmt),
                     max_range=max_range,
                     local_transform=None if local_transform is None
                     else jnp.asarray(local_transform))


def scan_from_depth(depth, cam, decimation: int = 8, max_range: float = 8.0,
                    capacity: int = 4096) -> LaserScan:
    """Depth image -> 3D scan slab (reference: util3d::scanFromDepth /
    SensorCaptureThread scan-from-depth option)."""
    from rtabmap_tpu.ops import cloud as CL

    pts, ok = CL.cloud_from_depth(depth, cam, decimation=decimation,
                                  max_depth=max_range)
    import jax

    prio = ok.astype(jnp.float32) - jnp.arange(pts.shape[0]) * 1e-9
    _, idx = jax.lax.top_k(prio, min(capacity, pts.shape[0]))
    return make_scan(pts[idx], ScanFormat.XYZ, ok[idx], max_range, capacity)
