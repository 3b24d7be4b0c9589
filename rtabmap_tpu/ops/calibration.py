"""Camera calibration: chessboard detection + Zhang intrinsics + stereo.

Capability parity: the reference's calibration surface
(/root/reference/guilib/src/CalibrationDialog.cpp — chessboard corner
detection, mono intrinsics with plumb-bob distortion, stereo extrinsics —
and /root/reference/tools/Calibration/main.cpp), which delegates to
OpenCV ``findChessboardCorners`` / ``calibrateCamera`` /
``stereoCalibrate``.

TPU-first re-design:

* corner response is a **saddle-point detector** (negative Hessian
  determinant of the smoothed image) computed with depthwise
  convolutions — one fused XLA graph, no per-corner loops;
* per-view homographies are **batched normalized DLT** solves (stacked
  SVDs on the MXU);
* intrinsic bootstrap is Zhang's closed form (V·b = 0);
* joint refinement is a **jitted Levenberg–Marquardt** over intrinsics,
  distortion (k1,k2,p1,p2,k3) and all view poses at once — the Jacobian
  comes from ``jax.jacfwd`` of the batched projection, so every view's
  residual block is evaluated in one vmapped pass.

Grid *ordering* of detected saddle points is host-side numpy (tooling,
not a hot path): a lattice-vector BFS assigns integer board coordinates.
"""
from __future__ import annotations

from typing import List, NamedTuple, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from rtabmap_tpu.geometry import camera as C
from rtabmap_tpu.geometry import transform as T


# --------------------------------------------------------------------- corners


def _gauss_kernel1d(sigma: float, radius: int) -> jnp.ndarray:
    x = jnp.arange(-radius, radius + 1, dtype=jnp.float32)
    k = jnp.exp(-0.5 * (x / sigma) ** 2)
    return k / k.sum()


def _sep_conv(img: jnp.ndarray, k: jnp.ndarray) -> jnp.ndarray:
    """Separable 2D convolution (SAME) of a (H,W) image."""
    r = (k.shape[0] - 1) // 2
    x = img[None, None]
    kx = k[None, None, None, :]
    ky = k[None, None, :, None]
    x = jax.lax.conv_general_dilated(x, kx, (1, 1), [(0, 0), (r, r)])
    x = jax.lax.conv_general_dilated(x, ky, (1, 1), [(r, r), (0, 0)])
    return x[0, 0]


def _conv1d(img: jnp.ndarray, k: jnp.ndarray, axis: int) -> jnp.ndarray:
    """1D convolution of a (H,W) image along one axis (SAME)."""
    r = (k.shape[0] - 1) // 2
    x = img[None, None]
    if axis == 1:
        kern = k[None, None, None, :]
        pad = [(0, 0), (r, r)]
    else:
        kern = k[None, None, :, None]
        pad = [(r, r), (0, 0)]
    return jax.lax.conv_general_dilated(x, kern, (1, 1), pad)[0, 0]


def saddle_response(gray: jnp.ndarray, sigma: float = 2.0) -> jnp.ndarray:
    """Chessboard-corner response: ``-det(Hessian)`` of the blurred image.

    Interior chessboard corners are saddle points of intensity, where
    ``Ixx*Iyy - Ixy^2`` is strongly negative; blobs/edges score <= 0.
    """
    g = _sep_conv(gray, _gauss_kernel1d(sigma, int(3 * sigma)))
    d = jnp.asarray([0.5, 0.0, -0.5], jnp.float32)  # central difference
    gxx = _conv1d(_conv1d(g, d, 1), d, 1)
    gyy = _conv1d(_conv1d(g, d, 0), d, 0)
    gxy = _conv1d(_conv1d(g, d, 1), d, 0)
    resp = -(gxx * gyy - gxy * gxy)
    return jnp.maximum(resp, 0.0)


def _nms_topk(resp: jnp.ndarray, k: int, radius: int = 5):
    """Grayscale-dilation NMS then top-k peaks. Returns (uv[k,2], score[k])."""
    H, W = resp.shape
    dil = jax.lax.reduce_window(
        resp, -jnp.inf, jax.lax.max,
        (2 * radius + 1, 2 * radius + 1), (1, 1), "SAME")
    peaks = jnp.where(resp >= dil, resp, 0.0)
    flat = peaks.reshape(-1)
    score, idx = jax.lax.top_k(flat, k)
    vv, uu = idx // W, idx % W
    return jnp.stack([uu, vv], -1).astype(jnp.float32), score


def _subpixel(resp: jnp.ndarray, uv: jnp.ndarray) -> jnp.ndarray:
    """Quadratic-fit subpixel offset around integer peaks (batched)."""
    H, W = resp.shape
    u = jnp.clip(uv[:, 0].astype(jnp.int32), 1, W - 2)
    v = jnp.clip(uv[:, 1].astype(jnp.int32), 1, H - 2)

    def at(dv, du):
        return resp[v + dv, u + du]

    dx = 0.5 * (at(0, 1) - at(0, -1))
    dy = 0.5 * (at(1, 0) - at(-1, 0))
    dxx = at(0, 1) + at(0, -1) - 2 * at(0, 0)
    dyy = at(1, 0) + at(-1, 0) - 2 * at(0, 0)
    ox = jnp.where(jnp.abs(dxx) > 1e-9, -dx / dxx, 0.0)
    oy = jnp.where(jnp.abs(dyy) > 1e-9, -dy / dyy, 0.0)
    ox = jnp.clip(ox, -0.5, 0.5)
    oy = jnp.clip(oy, -0.5, 0.5)
    return jnp.stack([u + ox, v + oy], -1)


def detect_saddle_points(gray: jnp.ndarray, max_pts: int, sigma: float = 2.0,
                         nms_radius: int = 5):
    """Jittable saddle-point detector: response -> NMS top-k -> subpixel."""
    resp = saddle_response(gray, sigma)
    uv, score = _nms_topk(resp, max_pts, nms_radius)
    uv = _subpixel(resp, uv)
    return uv, score


def order_chessboard_grid(uv: np.ndarray, score: np.ndarray,
                          pattern: Tuple[int, int],
                          min_rel_score: float = 0.08) -> Optional[np.ndarray]:
    """Order candidate saddle points into a (rows*cols, 2) grid, row-major.

    Host-side lattice recovery: seed at the strongest corner, estimate the
    two dominant lattice vectors from its nearest neighbors, then BFS over
    the point set assigning integer board coordinates with a locally
    updated affine-lattice prediction (tolerates perspective).
    Returns None if a full ``pattern`` = (cols, rows) grid is not found.
    """
    cols, rows = pattern
    uv = np.asarray(uv, np.float64)
    score = np.asarray(score, np.float64)
    keep = score > min_rel_score * score.max() if score.max() > 0 else score > 0
    uv = uv[keep]
    sc = score[keep]
    if len(uv) < cols * rows:
        return None
    # de-dup (NMS can leak adjacent peaks)
    order = np.argsort(-sc)
    uv, sc = uv[order], sc[order]
    taken = np.zeros(len(uv), bool)
    pts, psc = [], []
    for i in range(len(uv)):
        if taken[i]:
            continue
        d = np.linalg.norm(uv - uv[i], axis=1)
        taken |= d < 3.0
        pts.append(uv[i])
        psc.append(sc[i])
    pts = np.asarray(pts)
    psc = np.asarray(psc)
    if len(pts) < cols * rows:
        return None

    # seed: point nearest the centroid (lattice is most regular there)
    seed = int(np.argmin(np.linalg.norm(pts - pts.mean(0), axis=1)))
    d = np.linalg.norm(pts - pts[seed], axis=1)
    d[seed] = np.inf
    nn = np.argsort(d)[:8]
    # lattice vector 1: shortest neighbor displacement
    v1 = pts[nn[0]] - pts[seed]
    # lattice vector 2: shortest displacement not collinear with v1
    v2 = None
    for j in nn[1:]:
        cand = pts[j] - pts[seed]
        cosang = abs(np.dot(cand, v1)) / (
            np.linalg.norm(cand) * np.linalg.norm(v1) + 1e-12)
        if cosang < 0.7:
            v2 = cand
            break
    if v2 is None:
        return None

    A = np.stack([v1, v2], axis=1)  # 2x2: px = A @ (i,j)
    if abs(np.linalg.det(A)) < 1e-9:
        return None
    coords = {seed: (0, 0)}
    frontier = [seed]
    tol = 0.35  # fraction of a lattice step
    used = np.zeros(len(pts), bool)
    used[seed] = True
    while frontier:
        cur = frontier.pop()
        ci, cj = coords[cur]
        for di, dj in ((1, 0), (-1, 0), (0, 1), (0, -1)):
            pred = pts[cur] + A @ np.array([di, dj], np.float64)
            dd = np.linalg.norm(pts - pred, axis=1)
            j = int(np.argmin(dd))
            step = np.linalg.norm(A @ np.array([di, dj], np.float64))
            if dd[j] < tol * step and not used[j]:
                used[j] = True
                coords[j] = (ci + di, cj + dj)
                frontier.append(j)
        # local lattice refresh: re-fit A from assigned coords near cur
        if len(coords) >= 6 and len(coords) % 8 == 0:
            idxs = np.array(list(coords.keys()))
            ij = np.array([coords[k] for k in idxs], np.float64)
            P = pts[idxs]
            ijh = np.concatenate([ij, np.ones((len(ij), 1))], 1)
            sol, *_ = np.linalg.lstsq(ijh, P, rcond=None)
            A = sol[:2].T

    if len(coords) < cols * rows:
        return None
    idxs = np.array(list(coords.keys()))
    ij = np.array([coords[k] for k in idxs], int)
    # pick the best (cols x rows) / (rows x cols) complete window by total
    # saddle score: interior 4-square junctions out-score board-edge saddles,
    # so the true interior block wins over windows shifted into the margin.
    grid_map = {}
    for k, (ii, jj) in zip(idxs, ij):
        grid_map[(ii, jj)] = k
    imin, jmin = ij[:, 0].min(), ij[:, 1].min()
    imax, jmax = ij[:, 0].max(), ij[:, 1].max()
    best, best_score = None, -np.inf
    for (nc, nr), transpose in (((cols, rows), False), ((rows, cols), True)):
        for i0 in range(imin, imax - nc + 2):
            for j0 in range(jmin, jmax - nr + 2):
                cells = [(i0 + a, j0 + b) for b in range(nr) for a in range(nc)]
                if not all(c in grid_map for c in cells):
                    continue
                total = sum(psc[grid_map[c]] for c in cells)
                if total > best_score:
                    best_score = total
                    best = (cells, nc, nr, transpose)
    if best is None:
        return None
    cells, nc, nr, transpose = best
    out = np.array([pts[grid_map[c]] for c in cells])
    g = out.reshape(nr, nc, 2)
    if transpose:
        g = g.transpose(1, 0, 2)
    # canonical orientation: row direction = +u, col = +v
    if g[0, -1, 0] < g[0, 0, 0]:
        g = g[:, ::-1]
    if g[-1, 0, 1] < g[0, 0, 1]:
        g = g[::-1]
    return np.ascontiguousarray(g.reshape(-1, 2))


def find_chessboard(gray, pattern: Tuple[int, int],
                    max_pts: Optional[int] = None) -> Optional[np.ndarray]:
    """Detect the interior-corner grid of a chessboard. ``pattern`` is
    (cols, rows) of interior corners; returns (cols*rows, 2) pixel coords
    row-major, or None."""
    cols, rows = pattern
    cap = max_pts or min(4 * cols * rows, 512)
    uv, score = jax.jit(detect_saddle_points, static_argnums=(1,))(
        jnp.asarray(gray, jnp.float32), cap)
    return order_chessboard_grid(np.asarray(uv), np.asarray(score), pattern)


def chessboard_object_points(pattern: Tuple[int, int],
                             square: float) -> np.ndarray:
    """Planar board model points (cols*rows, 3), z = 0, row-major."""
    cols, rows = pattern
    jj, ii = np.meshgrid(np.arange(rows), np.arange(cols), indexing="ij")
    return np.stack([ii * square, jj * square, np.zeros_like(ii, float)],
                    -1).reshape(-1, 3).astype(np.float32)


# ----------------------------------------------------------------- homography


def _normalize_pts(p):
    mean = p.mean(-2, keepdims=True)
    scale = jnp.sqrt(2.0) / (
        jnp.linalg.norm(p - mean, axis=-1).mean(-1)[..., None, None] + 1e-12)
    Tm = jnp.zeros(p.shape[:-2] + (3, 3), p.dtype)
    Tm = Tm.at[..., 0, 0].set(scale[..., 0, 0])
    Tm = Tm.at[..., 1, 1].set(scale[..., 0, 0])
    Tm = Tm.at[..., 0, 2].set(-scale[..., 0, 0] * mean[..., 0, 0])
    Tm = Tm.at[..., 1, 2].set(-scale[..., 0, 0] * mean[..., 0, 1])
    Tm = Tm.at[..., 2, 2].set(1.0)
    return (p - mean) * scale, Tm


def homography_dlt(src, dst):
    """Batched normalized DLT homography: src (...,N,2) -> dst (...,N,2)."""
    sn, Ts = _normalize_pts(src)
    dn, Td = _normalize_pts(dst)
    x, y = sn[..., 0], sn[..., 1]
    u, v = dn[..., 0], dn[..., 1]
    z = jnp.zeros_like(x)
    o = jnp.ones_like(x)
    r1 = jnp.stack([x, y, o, z, z, z, -u * x, -u * y, -u], -1)
    r2 = jnp.stack([z, z, z, x, y, o, -v * x, -v * y, -v], -1)
    Am = jnp.concatenate([r1, r2], -2)
    _, _, vt = jnp.linalg.svd(Am, full_matrices=True)
    h = vt[..., -1, :]
    Hn = h.reshape(h.shape[:-1] + (3, 3))
    H = jnp.linalg.inv(Td) @ Hn @ Ts
    return H / H[..., 2:3, 2:3]


# -------------------------------------------------------------- Zhang closed


def _vij(H, i, j):
    return jnp.stack([
        H[..., 0, i] * H[..., 0, j],
        H[..., 0, i] * H[..., 1, j] + H[..., 1, i] * H[..., 0, j],
        H[..., 1, i] * H[..., 1, j],
        H[..., 2, i] * H[..., 0, j] + H[..., 0, i] * H[..., 2, j],
        H[..., 2, i] * H[..., 1, j] + H[..., 1, i] * H[..., 2, j],
        H[..., 2, i] * H[..., 2, j],
    ], -1)


def intrinsics_from_homographies(Hs: jnp.ndarray):
    """Zhang's closed-form K from >=3 plane homographies (V b = 0)."""
    V = jnp.concatenate([_vij(Hs, 0, 1), _vij(Hs, 0, 0) - _vij(Hs, 1, 1)], 0)
    _, _, vt = jnp.linalg.svd(V, full_matrices=True)
    b = vt[-1]
    B11, B12, B22, B13, B23, B33 = b
    den = B11 * B22 - B12 * B12
    v0 = (B12 * B13 - B11 * B23) / den
    lam = B33 - (B13 * B13 + v0 * (B12 * B13 - B11 * B23)) / B11
    alpha = jnp.sqrt(jnp.abs(lam / B11))
    beta = jnp.sqrt(jnp.abs(lam * B11 / den))
    gamma = -B12 * alpha * alpha * beta / lam
    u0 = gamma * v0 / beta - B13 * alpha * alpha / lam
    return alpha, beta, u0, v0


def extrinsics_from_homography(H, K):
    """Plane pose [r1 r2 t] from H and K, orthonormalized via SVD."""
    M = jnp.linalg.inv(K) @ H
    lam = 1.0 / (jnp.linalg.norm(M[..., :, 0], axis=-1) + 1e-12)
    r1 = M[..., :, 0] * lam[..., None]
    r2 = M[..., :, 1] * lam[..., None]
    t = M[..., :, 2] * lam[..., None]
    r3 = jnp.cross(r1, r2)
    Q = jnp.stack([r1, r2, r3], -1)
    u, _, vt = jnp.linalg.svd(Q)
    R = u @ vt
    det = jnp.linalg.det(R)
    R = R * jnp.where(det < 0, -1.0, 1.0)[..., None, None]
    return jnp.concatenate([R, t[..., None]], -1)  # (...,3,4)


# ------------------------------------------------------------------ LM refine


class CalibResult(NamedTuple):
    camera: C.CameraModel
    poses: np.ndarray          # (V,3,4) board->camera
    rms: float                 # reprojection RMS (px)
    per_view_rms: np.ndarray   # (V,)


def _project_dist(pts_cam, fx, fy, cx, cy, dist):
    x = pts_cam[..., 0] / pts_cam[..., 2]
    y = pts_cam[..., 1] / pts_cam[..., 2]
    r2 = x * x + y * y
    k1, k2, p1, p2, k3 = dist
    radial = 1.0 + k1 * r2 + k2 * r2 * r2 + k3 * r2 * r2 * r2
    xd = x * radial + 2 * p1 * x * y + p2 * (r2 + 2 * x * x)
    yd = y * radial + p1 * (r2 + 2 * y * y) + 2 * p2 * x * y
    return jnp.stack([xd * fx + cx, yd * fy + cy], -1)


def _residuals(theta, obj, img):
    """theta = [fx,fy,cx,cy,k1,k2,p1,p2,k3, V*(rvec,tvec)]; obj (N,3);
    img (V,N,2). Returns (V,N,2) residuals."""
    fx, fy, cx, cy = theta[0], theta[1], theta[2], theta[3]
    dist = theta[4:9]
    Vn = img.shape[0]
    rt = theta[9:].reshape(Vn, 6)

    def one(rt_i, img_i):
        R = T.so3_exp(rt_i[:3])
        pc = obj @ R.T + rt_i[3:6]
        return _project_dist(pc, fx, fy, cx, cy, dist) - img_i

    return jax.vmap(one)(rt, img)


@jax.jit
def _lm_refine(theta0, obj, img, iters: int = 30):
    """Dense Levenberg–Marquardt on the full parameter vector."""

    def res_flat(th):
        return _residuals(th, obj, img).reshape(-1)

    def step(carry, _):
        th, lam = carry
        r = res_flat(th)
        J = jax.jacfwd(res_flat)(th)
        JTJ = J.T @ J
        g = J.T @ r
        n = th.shape[0]

        def try_lam(lm):
            d = jnp.linalg.solve(JTJ + lm * jnp.eye(n, dtype=th.dtype) *
                                 jnp.diag(JTJ).mean(), -g)
            return th + d

        th_new = try_lam(lam)
        c_old = (r * r).sum()
        r_new = res_flat(th_new)
        c_new = (r_new * r_new).sum()
        ok = c_new < c_old
        th = jnp.where(ok, th_new, th)
        lam = jnp.where(ok, lam * 0.5, lam * 4.0)
        return (th, lam), c_new

    (th, _), _ = jax.lax.scan(step, (theta0, jnp.float32(1e-3)), None,
                              length=iters)
    return th


def calibrate_camera(object_pts: np.ndarray,
                     image_pts: Sequence[np.ndarray],
                     image_size: Tuple[int, int],
                     fix_k3: bool = False) -> CalibResult:
    """Zhang calibration from V >= 3 views of a planar target.

    ``object_pts`` (N,3) with z=0; ``image_pts`` list of (N,2);
    ``image_size`` (width, height). Mirrors cv::calibrateCamera's
    contract (reference CalibrationDialog.cpp uses it directly).
    """
    obj = jnp.asarray(object_pts, jnp.float32)
    img = jnp.asarray(np.stack(image_pts), jnp.float32)
    Hs = homography_dlt(jnp.broadcast_to(obj[None, :, :2], img.shape), img)
    alpha, beta, u0, v0 = intrinsics_from_homographies(Hs)
    # guard degenerate closed form (near-frontoparallel sets): fall back to
    # a focal prior at the image diagonal
    w, h = image_size
    alpha = jnp.where(jnp.isfinite(alpha) & (alpha > 10), alpha,
                      jnp.float32(1.2 * max(w, h)))
    beta = jnp.where(jnp.isfinite(beta) & (beta > 10), beta, alpha)
    u0 = jnp.where(jnp.isfinite(u0) & (u0 > 0) & (u0 < w), u0, w / 2.0)
    v0 = jnp.where(jnp.isfinite(v0) & (v0 > 0) & (v0 < h), v0, h / 2.0)
    K = jnp.asarray([[alpha, 0, u0], [0, beta, v0], [0, 0, 1]], jnp.float32)
    P = extrinsics_from_homography(Hs, K)

    rvecs = jax.vmap(T.so3_log)(P[:, :, :3])
    theta0 = jnp.concatenate([
        jnp.stack([alpha, beta, u0, v0]),
        jnp.zeros(5, jnp.float32),
        jnp.concatenate([rvecs, P[:, :, 3]], -1).reshape(-1),
    ])
    theta = _lm_refine(theta0, obj, img)
    if fix_k3:
        theta = theta.at[8].set(0.0)
        theta = _lm_refine(theta, obj, img)

    r = np.asarray(_residuals(theta, obj, img))
    per_view = np.sqrt((r ** 2).sum(-1).mean(-1))
    rms = float(np.sqrt((r ** 2).sum(-1).mean()))
    th = np.asarray(theta)
    Vn = img.shape[0]
    rt = th[9:].reshape(Vn, 6)
    poses = np.stack([
        np.concatenate([np.asarray(T.so3_exp(jnp.asarray(rt[i, :3]))),
                        rt[i, 3:6, None]], 1)
        for i in range(Vn)])
    cam = C.CameraModel.make(th[0], th[1], th[2], th[3], w, h,
                             dist=jnp.asarray(th[4:9]))
    return CalibResult(cam, poses.astype(np.float32), rms, per_view)


class StereoCalibResult(NamedTuple):
    left: CalibResult
    right: CalibResult
    extrinsics: np.ndarray  # (3,4) left->right
    baseline: float
    rms: float


def stereo_calibrate(object_pts: np.ndarray,
                     left_pts: Sequence[np.ndarray],
                     right_pts: Sequence[np.ndarray],
                     image_size: Tuple[int, int]) -> StereoCalibResult:
    """Stereo calibration: per-camera Zhang + relative pose averaging.

    The fixed left->right transform is the chordal-L2 average of the
    per-view relative poses (SVD rotation averaging), matching
    cv::stereoCalibrate's role in the reference's stereo workflow
    (StereoCameraModel.cpp)."""
    L = calibrate_camera(object_pts, left_pts, image_size)
    Rr = calibrate_camera(object_pts, right_pts, image_size)
    rels = []
    for i in range(len(L.poses)):
        Tl = np.concatenate([L.poses[i], [[0, 0, 0, 1]]], 0)
        Tr = np.concatenate([Rr.poses[i], [[0, 0, 0, 1]]], 0)
        rels.append(Tr @ np.linalg.inv(Tl))
    rels = np.stack(rels)
    Rm = rels[:, :3, :3].mean(0)
    u, _, vt = np.linalg.svd(Rm)
    R = u @ vt
    if np.linalg.det(R) < 0:
        u[:, -1] *= -1
        R = u @ vt
    t = rels[:, :3, 3].mean(0)
    ext = np.concatenate([R, t[:, None]], 1).astype(np.float32)
    baseline = float(np.linalg.norm(t))
    rms = float(np.sqrt(0.5 * (L.rms ** 2 + Rr.rms ** 2)))
    return StereoCalibResult(L, Rr, ext, baseline, rms)
