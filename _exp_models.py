import sys, time, jax, jax.numpy as jnp, numpy as np
from rtabmap_tpu.core.frame import extract_features
from rtabmap_tpu.geometry import camera as C
from rtabmap_tpu.ops import matching as M, ransac as R

which = sys.argv[1]
iters = int(sys.argv[2])
cam = C.CameraModel.make(300.0, 300.0, 160.0, 120.0, 320, 240)
rng = np.random.RandomState(0)
ga = jnp.asarray(rng.rand(240, 320), jnp.float32)
dp = jnp.asarray(1.0 + rng.rand(240, 320), jnp.float32)
fa = extract_features(ga, dp, cam, 384)
fb = extract_features(jnp.asarray(rng.rand(240, 320), jnp.float32), dp, cam, 384)
m_ba = M.match_nndr(fb.desc, fb.valid, fa.desc, fa.valid & fa.valid3d)
mutual = M.cross_check(m_ba, M.match_nndr(fa.desc, fa.valid & fa.valid3d, fb.desc, fb.valid))
pts = jnp.asarray(fa.pts3d[m_ba.idx])
uv = jnp.asarray(fb.uv)
mutual = jnp.asarray(mutual)
q3 = jnp.where(fb.valid3d[:, None], fb.pts3d, 0.0)
keys = jax.random.split(jax.random.PRNGKey(0), 8)
xn = jnp.stack([(uv[..., 0] - cam.cx) / cam.fx, (uv[..., 1] - cam.cy) / cam.fy], -1)
thr_n = 3.0 / cam.fx


def models(key):
    n_dlt = iters // 2
    idx = R._sample_indices(key, mutual, n_dlt, 6)
    m1 = R._dlt_pnp(pts[idx], xn[idx])
    k2 = jax.random.fold_in(key, 1)
    idx3 = R._sample_indices(k2, mutual, iters - n_dlt, 3)
    m2 = R.rigid_from_correspondences(pts[idx3], q3[idx3], jnp.ones(idx3.shape))
    return jnp.concatenate([m1, m2], 0)


def eval_(key):
    mdl = models(key)
    res, depth = jax.vmap(lambda Mm: R._reproj_residuals(Mm, pts, xn))(mdl)
    err = jnp.linalg.norm(res, -1)
    inl = (err < thr_n) & mutual[None] & (depth > 0)
    return mdl[jnp.argmax(jnp.sum(inl, -1))]


fn = {"models": models, "eval": eval_}[which]
f = jax.jit(jax.vmap(fn))
out = f(keys); jax.tree_util.tree_map(lambda x: x.block_until_ready(), out)
ts = []
for _ in range(3):
    t0 = time.perf_counter()
    for _ in range(30):
        out = f(keys)
    jax.tree_util.tree_map(lambda x: x.block_until_ready(), out)
    ts.append((time.perf_counter() - t0) / 30 * 1e3)
print(which, iters, round(min(ts), 2), "ms", flush=True)
