"""Surface reconstruction: organized fast mesh, gain compensation, export.

Capability parity: the reference's surface pipeline
(/root/reference/corelib/src/util3d_surface.cpp — ``organizedFastMesh``
(depth-grid triangulation with depth-discontinuity rejection), normals,
mesh cleanup, texture/color mapping — and ``GainCompensator.cpp``
(pairwise exposure gain least-squares for seamless blending); exports
used by rtabmap-export / ExportCloudsDialog).

The triangulation is one vectorized pass over the depth grid (two
triangles per quad, masked by validity + edge-length), jit-friendly; the
gain solve is a small dense normal system.
"""
from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from rtabmap_tpu.geometry import camera as C


def organized_fast_mesh(depth, cam: C.CameraModel, decimation: int = 2,
                        max_edge_ratio: float = 0.05,
                        min_depth: float = 0.1, max_depth: float = 20.0):
    """Triangulate an organized depth image.

    Returns (vertices (H*W,3) camera frame, faces (M,3) int32, face_valid
    (M,)). Faces touching invalid depth or depth discontinuities
    (|dz| > max_edge_ratio * z) are masked (reference:
    organizedFastMesh quad split + depth-jump rejection).
    """
    from rtabmap_tpu.ops import cloud as CL

    d = depth[::decimation, ::decimation]
    H, W = d.shape
    pts, ok = CL.cloud_from_depth(depth, cam, decimation=decimation,
                                  min_depth=min_depth, max_depth=max_depth)
    idx = jnp.arange(H * W).reshape(H, W)
    # quads: (r,c) (r,c+1) (r+1,c) (r+1,c+1)
    a = idx[:-1, :-1].reshape(-1)
    b = idx[:-1, 1:].reshape(-1)
    c = idx[1:, :-1].reshape(-1)
    e = idx[1:, 1:].reshape(-1)
    z = d.reshape(-1)

    def edge_ok(i, j):
        zi, zj = z[i], z[j]
        return (jnp.abs(zi - zj) < max_edge_ratio * jnp.maximum(zi, zj))

    okf = ok.reshape(-1)
    tri1 = jnp.stack([a, c, b], axis=-1)
    tri1_ok = okf[a] & okf[b] & okf[c] & edge_ok(a, b) & edge_ok(a, c) & edge_ok(b, c)
    tri2 = jnp.stack([b, c, e], axis=-1)
    tri2_ok = okf[b] & okf[c] & okf[e] & edge_ok(b, c) & edge_ok(b, e) & edge_ok(c, e)
    faces = jnp.concatenate([tri1, tri2], axis=0).astype(jnp.int32)
    face_valid = jnp.concatenate([tri1_ok, tri2_ok], axis=0)
    return pts, faces, face_valid


def mesh_normals(vertices, faces, face_valid):
    """Area-weighted per-vertex normals from valid faces."""
    v0 = vertices[faces[:, 0]]
    v1 = vertices[faces[:, 1]]
    v2 = vertices[faces[:, 2]]
    fn = jnp.cross(v1 - v0, v2 - v0)
    fn = jnp.where(face_valid[:, None], fn, 0.0)
    vn = jnp.zeros_like(vertices)
    for k in range(3):
        vn = vn.at[faces[:, k]].add(fn)
    return vn / jnp.maximum(jnp.linalg.norm(vn, axis=-1, keepdims=True), 1e-12)


def compact_mesh(vertices, faces, face_valid, colors=None):
    """Host-side: drop unused vertices + invalid faces -> (V,F[,C]) numpy."""
    vertices = np.asarray(vertices)
    faces = np.asarray(faces)[np.asarray(face_valid)]
    used = np.unique(faces)
    remap = np.full(len(vertices), -1, np.int64)
    remap[used] = np.arange(len(used))
    out_v = vertices[used]
    out_f = remap[faces]
    out_c = None if colors is None else np.asarray(colors)[used]
    return out_v, out_f, out_c


# ------------------------------------------------------------------- exports


def write_ply(path: str, vertices, faces=None, colors=None, normals=None):
    """ASCII PLY export (reference: export tools write PLY via PCL)."""
    vertices = np.asarray(vertices)
    n = len(vertices)
    with open(path, "w") as f:
        f.write("ply\nformat ascii 1.0\n")
        f.write(f"element vertex {n}\n")
        f.write("property float x\nproperty float y\nproperty float z\n")
        if normals is not None:
            f.write("property float nx\nproperty float ny\nproperty float nz\n")
        if colors is not None:
            f.write("property uchar red\nproperty uchar green\nproperty uchar blue\n")
        if faces is not None:
            f.write(f"element face {len(faces)}\n")
            f.write("property list uchar int vertex_indices\n")
        f.write("end_header\n")
        cols = [vertices]
        if normals is not None:
            cols.append(np.asarray(normals))
        rows = np.concatenate(cols, axis=1)
        for i in range(n):
            line = " ".join(f"{v:.5f}" for v in rows[i])
            if colors is not None:
                c = np.asarray(colors[i]).astype(int)
                line += f" {c[0]} {c[1]} {c[2]}"
            f.write(line + "\n")
        if faces is not None:
            for tri in np.asarray(faces):
                f.write(f"3 {tri[0]} {tri[1]} {tri[2]}\n")


def write_obj(path: str, vertices, faces):
    with open(path, "w") as f:
        for v in np.asarray(vertices):
            f.write(f"v {v[0]:.5f} {v[1]:.5f} {v[2]:.5f}\n")
        for tri in np.asarray(faces):
            f.write(f"f {tri[0]+1} {tri[1]+1} {tri[2]+1}\n")


def read_ply_counts(path: str) -> Tuple[int, int]:
    nv = nf = 0
    with open(path) as f:
        for line in f:
            if line.startswith("element vertex"):
                nv = int(line.split()[-1])
            elif line.startswith("element face"):
                nf = int(line.split()[-1])
            elif line.startswith("end_header"):
                break
    return nv, nf


def read_ply(path: str):
    """ASCII PLY import (vertices + optional faces/colors), the inverse of
    :func:`write_ply`. Returns (vertices (N,3), faces (M,3) or None,
    colors (N,3) uint8 or None)."""
    props: list = []
    nv = nf = 0
    with open(path) as f:
        in_vertex = False
        for line in f:
            t = line.split()
            if not t:
                continue
            if t[0] == "element":
                in_vertex = t[1] == "vertex"
                if t[1] == "vertex":
                    nv = int(t[2])
                elif t[1] == "face":
                    nf = int(t[2])
            elif t[0] == "property" and in_vertex and t[1] != "list":
                props.append(t[2])
            elif t[0] == "end_header":
                break
        rows = [f.readline().split() for _ in range(nv)]
        faces = None
        if nf:
            faces = np.asarray(
                [[int(x) for x in f.readline().split()[1:4]] for _ in range(nf)],
                np.int32)
    arr = np.asarray(rows, np.float64)
    ix = [props.index(c) for c in ("x", "y", "z")]
    verts = arr[:, ix].astype(np.float32)
    colors = None
    if "red" in props:
        ic = [props.index(c) for c in ("red", "green", "blue")]
        colors = arr[:, ic].astype(np.uint8)
    return verts, faces, colors


# ------------------------------------------------------------ gain compensation


def gain_compensation(overlaps: List[Tuple[int, int, float, float]], n: int,
                      anchor: int = 0):
    """Solve per-image exposure gains from pairwise overlap statistics.

    ``overlaps``: (i, j, mean_i, mean_j) intensity means over the common
    region. Minimizes sum (g_i * m_i - g_j * m_j)^2 with g_anchor = 1
    (reference: GainCompensator.cpp pairwise least squares).
    Returns (n,) gains.
    """
    A = np.zeros((len(overlaps) + 1, n))
    b = np.zeros(len(overlaps) + 1)
    for k, (i, j, mi, mj) in enumerate(overlaps):
        A[k, i] = mi
        A[k, j] = -mj
    A[-1, anchor] = 1.0
    b[-1] = 1.0
    g, *_ = np.linalg.lstsq(A, b, rcond=None)
    return g
