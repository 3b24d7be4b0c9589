"""Mesh texture mapping + multiband blending + textured OBJ export.

Capability parity: the reference's texture pipeline in
``/root/reference/corelib/src/util3d_surface.cpp`` — ``createTextureMesh``
(per-face camera assignment by viewing angle/distance with occlusion
handling), ``mergeTextures`` / multiband texturing (frequency-band
blending across cameras into one atlas, exposure-gain compensated via
``GainCompensator.cpp``), consumed by ExportCloudsDialog and
``tools/Export/main.cpp``.

TPU-native design: instead of PCL's per-face scalar loops + OpenCV seam
blending, every face gets a fixed ``texel x texel`` block in a square
atlas. Baking is one jitted pass: barycentric sample grids are batched
matmuls (F, P^2, 3), camera projection + bilinear sampling are the
one-hot-matmul samplers from ``ops/image.py``, and multiband blending is
a two-band split (low band = visibility-weighted average over all
cameras of the blurred images; high band = sharp detail from the single
best camera) — the standard Laplacian-blend approximation, exact in the
two-camera case the gain solver is calibrated on.
"""
from __future__ import annotations

from typing import List, NamedTuple, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from rtabmap_tpu.geometry import camera as C
from rtabmap_tpu.geometry import transform as T
from rtabmap_tpu.ops import image as IM


class TexturedMesh(NamedTuple):
    vertices: np.ndarray    # (V, 3) world
    faces: np.ndarray       # (F, 3) int32
    uvs: np.ndarray         # (F, 3, 2) per-corner atlas UV in [0,1]
    atlas: np.ndarray       # (A, A) or (A, A, 3) float32 in [0,1]
    face_camera: np.ndarray  # (F,) int32 best camera id, -1 = unobserved


def _face_grid(texel: int):
    """Barycentric coordinates of a texel x texel block.

    The face triangle maps to block corners (0,0),(1,0),(0,1); texels in
    the upper half extrapolate (clamped) so the block has no empty seam.
    """
    u = (np.arange(texel, dtype=np.float32) + 0.5) / texel
    uu, vv = np.meshgrid(u, u, indexing="xy")
    b1 = uu.reshape(-1)
    b2 = vv.reshape(-1)
    s = np.maximum(b1 + b2, 1.0)
    b1, b2 = b1 / s, b2 / s          # clamp to the triangle
    b0 = 1.0 - b1 - b2
    return np.stack([b0, b1, b2], axis=-1)  # (P^2, 3)


def face_camera_scores(vertices, faces, poses, cam: C.CameraModel,
                       depths=None, max_angle_deg: float = 85.0,
                       depth_tol: float = 0.10):
    """Score each (camera, face) pair; jittable.

    Score = cos(angle between face normal and view ray) / z^2 for faces
    whose centroid projects in-bounds, is in front of the camera, faces
    it, and (when ``depths`` is given) passes the occlusion test
    |z - depth(u,v)| < depth_tol * z (reference: createTextureMesh
    maxAngle / maxDistance / occlusion culling).

    Returns scores (Ncam, F); unobservable pairs get -1.
    """
    verts = jnp.asarray(vertices, jnp.float32)
    f = jnp.asarray(faces, jnp.int32)
    v0, v1, v2 = verts[f[:, 0]], verts[f[:, 1]], verts[f[:, 2]]
    centroid = (v0 + v1 + v2) / 3.0
    n = jnp.cross(v1 - v0, v2 - v0)
    n = n / jnp.maximum(jnp.linalg.norm(n, axis=-1, keepdims=True), 1e-9)
    cos_max = float(np.cos(np.deg2rad(max_angle_deg)))
    W, H = int(cam.width), int(cam.height)

    def one_cam(pose, depth):
        Tcw = T.inverse(pose)
        pc = T.apply(Tcw[None], centroid[None])[0]
        z = pc[:, 2]
        uv, _ = C.project(pc, cam)
        inb = C.in_image(uv, W, H, border=1.0) & (z > 1e-3)
        # view ray from camera center to centroid, world frame
        cam_pos = pose[:, 3]
        ray = centroid - cam_pos[None]
        ray = ray / jnp.maximum(jnp.linalg.norm(ray, axis=-1, keepdims=True), 1e-9)
        # signed: normals are oriented toward the viewpoint that created
        # the surface (organized mesh / surface nets convention), so a
        # front-facing face has n . ray < 0; back-faces are culled.
        cosang = -jnp.sum(n * ray, axis=-1)
        ok = inb & (cosang > cos_max)
        if depth is not None:
            dz = IM.bilinear_sample(depth, uv, pad_value=0.0)
            ok = ok & ((dz <= 0) | (jnp.abs(dz - z) < depth_tol * z))
        return jnp.where(ok, cosang / jnp.maximum(z * z, 1e-6), -1.0)

    pz = jnp.stack([jnp.asarray(p, jnp.float32) for p in poses])
    if depths is not None:
        dz = jnp.stack([jnp.asarray(d, jnp.float32) for d in depths])
        return jax.vmap(one_cam)(pz, dz)
    return jax.vmap(lambda p: one_cam(p, None))(pz)


def _sample_image(img, uv):
    if img.ndim == 2:
        return IM.bilinear_sample(img, uv, pad_value=0.0)[..., None]
    return jnp.stack(
        [IM.bilinear_sample(img[..., c], uv, pad_value=0.0)
         for c in range(img.shape[-1])], axis=-1)


def bake_face_atlas(vertices, faces, poses, cam: C.CameraModel, images,
                    scores=None, depths=None, texel: int = 8,
                    gains: Optional[np.ndarray] = None,
                    blur_sigma: float = 2.0, multiband: bool = True):
    """Bake a per-face texel-block atlas with two-band blending.

    ``images``: list of (H,W) gray or (H,W,3) color float arrays in [0,1].
    Returns TexturedMesh. The bake itself is a single jitted computation.
    """
    verts = np.asarray(vertices, np.float32)
    f = np.asarray(faces, np.int32)
    F = len(f)
    if scores is None:
        scores = face_camera_scores(verts, f, poses, cam, depths=depths)
    scores = jnp.asarray(scores)                      # (Ncam, F)
    best_cam = jnp.argmax(scores, axis=0)             # (F,)
    observed = jnp.max(scores, axis=0) > 0

    bary = jnp.asarray(_face_grid(texel))             # (P2, 3)
    v0 = jnp.asarray(verts[f[:, 0]])
    v1 = jnp.asarray(verts[f[:, 1]])
    v2 = jnp.asarray(verts[f[:, 2]])
    # (F, P2, 3) sample points: batched matmul over barycentric weights
    pts = (bary[None, :, 0:1] * v0[:, None] + bary[None, :, 1:2] * v1[:, None]
           + bary[None, :, 2:3] * v2[:, None])
    P2 = bary.shape[0]
    pts_flat = pts.reshape(F * P2, 3)

    imgs = [jnp.asarray(im, jnp.float32) for im in images]
    ch = 1 if imgs[0].ndim == 2 else imgs[0].shape[-1]
    g = (jnp.asarray(gains, jnp.float32) if gains is not None
         else jnp.ones(len(imgs), jnp.float32))
    pz = jnp.stack([jnp.asarray(p, jnp.float32) for p in poses])
    img_stack = jnp.stack(imgs)
    blur = (jax.vmap(lambda im: IM.gaussian_blur(im, blur_sigma))(img_stack)
            if ch == 1 else
            jnp.stack([jnp.stack([IM.gaussian_blur(im[..., c], blur_sigma)
                                  for c in range(ch)], axis=-1)
                       for im in imgs]))

    def one_cam(pose, img, img_blur, gain):
        Tcw = T.inverse(pose)
        pc = T.apply(Tcw[None], pts_flat[None])[0]
        uv, _ = C.project(pc, cam)
        inb = (C.in_image(uv, int(cam.width), int(cam.height), border=1.0)
               & (pc[:, 2] > 1e-3))
        sharp = _sample_image(img, uv) * gain          # (F*P2, ch)
        low = _sample_image(img_blur, uv) * gain
        return sharp, low, inb

    sharp_all, low_all, inb_all = jax.vmap(one_cam)(pz, img_stack, blur, g)
    # per-texel camera weights: face-level score, zeroed off-image
    w = jnp.maximum(scores, 0.0)[:, :, None]           # (Ncam, F, 1)
    w = jnp.broadcast_to(w, (len(imgs), F, P2)).reshape(len(imgs), F * P2)
    w = w * inb_all
    wsum = jnp.maximum(jnp.sum(w, axis=0, keepdims=True), 1e-9)
    low_blend = jnp.sum(low_all * (w / wsum)[..., None], axis=0)  # (F*P2, ch)

    onehot = jax.nn.one_hot(best_cam, len(imgs), axis=0)  # (Ncam, F)
    sel = jnp.broadcast_to(onehot[:, :, None],
                           (len(imgs), F, P2)).reshape(len(imgs), F * P2)
    best_sharp = jnp.sum(sharp_all * sel[..., None], axis=0)
    best_low = jnp.sum(low_all * sel[..., None], axis=0)
    if multiband:
        texelv = low_blend + (best_sharp - best_low)   # low band + detail
    else:
        texelv = best_sharp
    texelv = jnp.clip(texelv, 0.0, 1.0)
    texelv = texelv * jnp.repeat(observed, P2)[:, None]

    # assemble square atlas of K x K blocks
    K = int(np.ceil(np.sqrt(F)))
    A = K * texel
    pad = K * K - F
    blocks = jnp.concatenate(
        [texelv.reshape(F, texel, texel, ch),
         jnp.zeros((pad, texel, texel, ch), texelv.dtype)], axis=0)
    atlas = blocks.reshape(K, K, texel, texel, ch).transpose(0, 2, 1, 3, 4)
    atlas = atlas.reshape(A, A, ch)
    atlas_np = np.asarray(atlas)
    if ch == 1:
        atlas_np = atlas_np[..., 0]

    # per-corner UVs: triangle corners of each block, half-texel inset
    fi = np.arange(F)
    bx = (fi % K) * texel
    by = (fi // K) * texel
    h = 0.5
    corners = np.array([[h, h], [texel - h, h], [h, texel - h]], np.float32)
    uvs = (np.stack([bx, by], axis=-1)[:, None, :] + corners[None]) / A

    return TexturedMesh(verts, f, uvs.astype(np.float32), atlas_np,
                        np.where(np.asarray(observed),
                                 np.asarray(best_cam), -1).astype(np.int32))


def texture_mesh(vertices, faces, poses, cam: C.CameraModel, images,
                 depths=None, texel: int = 8, compensate_gains: bool = True,
                 multiband: bool = True) -> TexturedMesh:
    """Full pipeline: camera assignment -> gain compensation -> multiband
    atlas bake (reference: createTextureMesh + GainCompensator +
    mergeTextures)."""
    from rtabmap_tpu.maps.mesh import gain_compensation

    scores = np.asarray(face_camera_scores(vertices, faces, poses, cam,
                                           depths=depths))
    gains = None
    if compensate_gains and len(images) > 1:
        # per-camera mean intensity over faces observed by both cameras
        bary = _face_grid(4)
        verts = np.asarray(vertices, np.float32)
        f = np.asarray(faces, np.int32)
        cent = verts[f].transpose(0, 2, 1) @ bary.mean(0)
        overlaps = []
        means = _per_camera_face_means(cent, poses, cam, images)
        n = len(images)
        for i in range(n):
            for j in range(i + 1, n):
                both = (scores[i] > 0) & (scores[j] > 0)
                cnt = int(both.sum())
                if cnt >= 3:
                    mi = float(means[i][both].mean())
                    mj = float(means[j][both].mean())
                    if mi > 1e-6 and mj > 1e-6:
                        overlaps.append((i, j, mi, mj))
        if overlaps:
            gains = gain_compensation(overlaps, n)
    return bake_face_atlas(vertices, faces, poses, cam, images,
                           scores=scores, depths=depths, texel=texel,
                           gains=gains, multiband=multiband)


def _per_camera_face_means(centroids, poses, cam: C.CameraModel, images):
    """Mean image intensity at each face centroid per camera (host helper
    for the gain solve)."""
    out = []
    cent = jnp.asarray(centroids, jnp.float32)
    for pose, img in zip(poses, images):
        Tcw = T.inverse(jnp.asarray(pose, jnp.float32))
        pc = T.apply(Tcw[None], cent[None])[0]
        uv, _ = C.project(pc, cam)
        im = jnp.asarray(img, jnp.float32)
        if im.ndim == 3:
            im = im.mean(axis=-1)
        out.append(np.asarray(IM.bilinear_sample(im, uv, pad_value=0.0)))
    return out


# ------------------------------------------------------------------ export

def write_png(path: str, img: np.ndarray) -> None:
    """Minimal PNG encoder (stdlib zlib): 8-bit gray or RGB."""
    import struct
    import zlib

    a = np.asarray(img)
    if a.dtype != np.uint8:
        a = (np.clip(a, 0.0, 1.0) * 255.0 + 0.5).astype(np.uint8)
    if a.ndim == 2:
        color_type, nch = 0, 1
        a = a[..., None]
    else:
        color_type, nch = 2, 3
        if a.shape[-1] != 3:
            a = np.repeat(a[..., :1], 3, axis=-1)
    h, w = a.shape[:2]

    def chunk(tag, data):
        body = tag + data
        return (struct.pack(">I", len(data)) + body
                + struct.pack(">I", zlib.crc32(body) & 0xFFFFFFFF))

    raw = b"".join(b"\x00" + a[r].tobytes() for r in range(h))
    with open(path, "wb") as fp:
        fp.write(b"\x89PNG\r\n\x1a\n")
        fp.write(chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8,
                                            color_type, 0, 0, 0)))
        fp.write(chunk(b"IDAT", zlib.compress(raw, 6)))
        fp.write(chunk(b"IEND", b""))


def read_png(path: str) -> np.ndarray:
    """Minimal PNG reader for files written by write_png (8-bit, filter 0
    or 1)."""
    import struct
    import zlib

    with open(path, "rb") as fp:
        data = fp.read()
    assert data[:8] == b"\x89PNG\r\n\x1a\n"
    pos, idat, w = 8, b"", 0
    while pos < len(data):
        (ln,) = struct.unpack(">I", data[pos:pos + 4])
        tag = data[pos + 4:pos + 8]
        body = data[pos + 8:pos + 8 + ln]
        if tag == b"IHDR":
            w, h, depth, ctype = struct.unpack(">IIBB", body[:10])
        elif tag == b"IDAT":
            idat += body
        pos += 12 + ln
    raw = zlib.decompress(idat)
    nch = 3 if ctype == 2 else 1
    stride = w * nch
    rows = []
    prev = np.zeros(stride, np.uint8)
    for r in range(h):
        off = r * (stride + 1)
        filt = raw[off]
        row = np.frombuffer(raw[off + 1:off + 1 + stride], np.uint8).copy()
        if filt == 1:
            for i in range(nch, stride):
                row[i] = (int(row[i]) + int(row[i - nch])) & 0xFF
        elif filt == 2:
            row = ((row.astype(np.int32) + prev) & 0xFF).astype(np.uint8)
        elif filt != 0:
            raise ValueError(f"unsupported PNG filter {filt}")
        rows.append(row)
        prev = row
    a = np.stack(rows).reshape(h, w, nch)
    return a[..., 0] if nch == 1 else a


def write_textured_obj(path: str, mesh: TexturedMesh) -> None:
    """OBJ + MTL + atlas PNG (reference: util3d_surface exports consumed
    by rtabmap-export --texture)."""
    import os

    base = os.path.splitext(path)[0]
    name = os.path.basename(base)
    write_png(base + ".png", mesh.atlas)
    with open(base + ".mtl", "w") as fp:
        fp.write("newmtl atlas\nKa 1 1 1\nKd 1 1 1\n"
                 f"map_Kd {name}.png\n")
    with open(path, "w") as fp:
        fp.write(f"mtllib {name}.mtl\nusemtl atlas\n")
        for v in mesh.vertices:
            fp.write(f"v {v[0]:.6f} {v[1]:.6f} {v[2]:.6f}\n")
        for f in range(len(mesh.faces)):
            for c in range(3):
                u, v = mesh.uvs[f, c]
                fp.write(f"vt {u:.6f} {1.0 - v:.6f}\n")
        for f, tri in enumerate(mesh.faces):
            t = 3 * f
            fp.write(f"f {tri[0]+1}/{t+1} {tri[1]+1}/{t+2} "
                     f"{tri[2]+1}/{t+3}\n")


def read_textured_obj(path: str):
    """Parse back vertices/faces/uvs + atlas (test/tooling helper)."""
    import os

    verts, uvs, faces, fuv = [], [], [], []
    with open(path) as fp:
        for line in fp:
            p = line.split()
            if not p:
                continue
            if p[0] == "v":
                verts.append([float(x) for x in p[1:4]])
            elif p[0] == "vt":
                uvs.append([float(p[1]), 1.0 - float(p[2])])
            elif p[0] == "f":
                vi, ti = zip(*[(int(a.split("/")[0]) - 1,
                                int(a.split("/")[1]) - 1) for a in p[1:4]])
                faces.append(list(vi))
                fuv.append(list(ti))
    atlas = read_png(os.path.splitext(path)[0] + ".png")
    uvs = np.asarray(uvs, np.float32)
    return (np.asarray(verts, np.float32), np.asarray(faces, np.int32),
            uvs[np.asarray(fuv, np.int32)], atlas)
