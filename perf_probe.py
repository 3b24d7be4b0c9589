"""On-chip kernel timing probe (diagnostic; bench.py stays the one-line
driver benchmark).

Measures the SLAM stack's hot device kernels at deployment scale on the
attached TPU chip and prints one JSON dict. Timing methodology matches
bench.py: queued dispatches + one host fetch, minus measured tunnel RTT
(block_until_ready is unreliable through the tunneled platform).
"""
import json
import time

import numpy as np


def timeit(fn, args, rounds=10, fetch=None):
    import jax

    out = fn(*args)
    f = fetch(out) if fetch else out
    _ = np.asarray(jax.tree_util.tree_leaves(f)[0]).ravel()[:1]
    triv = jax.jit(lambda x: x + 1)
    leaf = jax.numpy.zeros(())
    _ = np.asarray(triv(leaf))
    t0 = time.perf_counter()
    _ = np.asarray(triv(leaf))
    rtt = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(rounds):
        out = fn(*args)
    f = fetch(out) if fetch else out
    _ = np.asarray(jax.tree_util.tree_leaves(f)[0]).ravel()[:1]
    dt = max(time.perf_counter() - t0 - rtt, 1e-9)
    return dt / rounds * 1e3  # ms


def main():
    import jax
    import jax.numpy as jnp

    rng = np.random.RandomState(0)
    res = {}

    # ---- local bundle adjustment (OdometryF2M scale: 20 kf x 2000 pts)
    from rtabmap_tpu.optim.ba import BAProblem, bundle_adjust

    Nc, Np, No = 20, 2000, 8000
    pts = rng.randn(Np, 3).astype(np.float32) + np.array([0, 0, 5], np.float32)
    poses = np.tile(np.eye(3, 4, dtype=np.float32), (Nc, 1, 1))
    poses[:, 0, 3] = np.linspace(0, 1, Nc)
    ci = rng.randint(0, Nc, No).astype(np.int32)
    pi = rng.randint(0, Np, No).astype(np.int32)
    pc = pts[pi] - poses[ci][:, :, 3] * 0
    uv = (pc[:, :2] / pc[:, 2:3] + 0.002 * rng.randn(No, 2)).astype(np.float32)
    prob = BAProblem(jnp.asarray(poses), jnp.asarray(pts), jnp.asarray(ci),
                     jnp.asarray(pi), jnp.asarray(uv),
                     jnp.ones(No, bool), jnp.zeros(Nc, bool).at[0].set(True))
    ITER = 10
    ms = timeit(lambda p: bundle_adjust(p, iters=ITER)[0].poses, (prob,),
                rounds=5)
    res["ba_local_20kf_2kpts_ms_per_iter"] = round(ms / ITER, 3)

    # ---- global bundle adjustment (implicit Schur-CG, map scale)
    from rtabmap_tpu.optim.ba import bundle_adjust_large

    Ncg, Npg, Nog = 256, 50000, 500000
    ptsg = (rng.randn(Npg, 3) * 3 + np.array([0, 0, 8])).astype(np.float32)
    posesg = np.tile(np.eye(3, 4, dtype=np.float32), (Ncg, 1, 1))
    posesg[:, 0, 3] = np.linspace(0, 10, Ncg)
    cig = rng.randint(0, Ncg, Nog).astype(np.int32)
    pig = rng.randint(0, Npg, Nog).astype(np.int32)
    pcg_ = ptsg[pig].copy()
    pcg_[:, 0] -= posesg[cig][:, 0, 3]
    uvg = (pcg_[:, :2] / np.maximum(pcg_[:, 2:3], 0.5)
           + 0.001 * rng.randn(Nog, 2)).astype(np.float32)
    probg = BAProblem(jnp.asarray(posesg), jnp.asarray(ptsg),
                      jnp.asarray(cig), jnp.asarray(pig), jnp.asarray(uvg),
                      jnp.ones(Nog, bool),
                      jnp.zeros(Ncg, bool).at[0].set(True))
    GIT = 3
    ms = timeit(lambda p: bundle_adjust_large(p, iters=GIT,
                                              cg_iters=20)[0].poses,
                (probg,), rounds=2)
    res["ba_global_256kf_50kpts_500kobs_ms_per_iter"] = round(ms / GIT, 2)

    # ---- pose graph optimization (1000 nodes, loop closures)
    from rtabmap_tpu.optim.pose_graph import make_graph, optimize_dense, optimize_pcg

    N = 1000
    t = np.linspace(0, 8 * np.pi, N)
    gt = np.tile(np.eye(3, 4, dtype=np.float32), (N, 1, 1))
    gt[:, 0, 3] = np.cos(t) * 10
    gt[:, 1, 3] = np.sin(t) * 10
    ef = np.arange(N - 1, dtype=np.int32)
    et = ef + 1
    # add 200 loop closures
    lf = rng.randint(0, N - 300, 200).astype(np.int32)
    lt = lf + 250
    ef = np.concatenate([ef, lf])
    et = np.concatenate([et, lt])
    meas = []
    for f, tt in zip(ef, et):
        A, Bp = gt[f], gt[tt]
        RA, RB = A[:, :3], Bp[:, :3]
        Rr = RA.T @ RB
        tr = RA.T @ (Bp[:, 3] - A[:, 3])
        meas.append(np.concatenate([Rr, tr[:, None]], axis=1))
    meas = np.stack(meas).astype(np.float32)
    noisy = gt + 0.05 * rng.randn(*gt.shape).astype(np.float32)
    g = make_graph(jnp.asarray(noisy), jnp.asarray(ef), jnp.asarray(et),
                   jnp.asarray(meas))
    GN = 10
    ms = timeit(lambda gg: optimize_dense(gg, iters=GN), (g,), rounds=3,
                fetch=lambda o: o[0] if isinstance(o, tuple) else o)
    res["posegraph_dense_1k_nodes_ms_per_iter"] = round(ms / GN, 3)
    ms = timeit(lambda gg: optimize_pcg(gg, iters=GN), (g,), rounds=3,
                fetch=lambda o: o[0] if isinstance(o, tuple) else o)
    res["posegraph_pcg_1k_nodes_ms_per_iter"] = round(ms / GN, 3)

    # ---- ICP point-to-plane iteration (8192 pts vs 8192 map)
    from rtabmap_tpu.ops.icp import icp

    sp = rng.randn(8192, 3).astype(np.float32)
    dp = (sp + 0.01).astype(np.float32)
    nrm = jnp.asarray(np.tile(np.array([0, 0, 1], np.float32), (8192, 1)))
    ones = jnp.ones(8192, bool)
    IC = 10
    ms = timeit(
        lambda a, b: icp(a, ones, b, ones, dst_normals=nrm,
                         point_to_plane=True, iters=IC).transform,
        (jnp.asarray(sp), jnp.asarray(dp)), rounds=3)
    res["icp_p2plane_8k_ms_per_iter"] = round(ms / IC, 3)

    # ---- vocabulary 2-NN + likelihood at engine scale
    from rtabmap_tpu.ops.pallas.vocab_knn import knn2

    slab = jnp.asarray(np.where(rng.rand(131072, 256) > 0.5, 1, -1), jnp.int8)
    q = jnp.asarray(np.where(rng.rand(512, 256) > 0.5, 1, -1), jnp.int8)
    valid = jnp.ones(131072, bool)
    kfn = jax.jit(lambda qq, ss: knn2(qq, ss, valid))
    ms = timeit(kfn, (q, slab), rounds=10)
    res["vocab_2nn_512q_131k_ms"] = round(ms, 3)

    # ---- single-session tf-idf likelihood (engine scale)
    from rtabmap_tpu.vocab.dictionary import tfidf_likelihood

    W1, N1, K1 = 131072, 1024, 512
    nwords = jnp.asarray(rng.randint(0, W1, (N1, K1)), jnp.int32)
    nvalid = jnp.ones((N1,), bool)
    nw1 = jnp.asarray(rng.randint(1, 9, (W1,)), jnp.float32)
    qw1 = jnp.asarray(rng.randint(0, W1, (K1,)), jnp.int32)
    lfn = jax.jit(lambda q: tfidf_likelihood(q, nwords, nvalid, nw1,
                                             jnp.float32(N1), W1))
    ms = timeit(lfn, (qw1,), rounds=10)
    res["tfidf_1ksession_ms"] = round(ms, 3)

    # ---- fleet loop-closure tick (32 sessions, serving shape)
    from rtabmap_tpu.bayes import filter as BF
    from rtabmap_tpu.parallel import fleet as FL

    B, K, W2, N2 = 32, 512, 131072, 1024
    st = FL.init_fleet(B, N2, K, W2)
    st = st._replace(
        node_words=jnp.asarray(rng.randint(0, W2, (B, N2, K)), jnp.int32),
        node_valid=jnp.ones((B, N2), bool),
        word_nw=jnp.asarray(rng.randint(1, 9, (B, W2)), jnp.float32))
    slab2 = jnp.asarray(np.where(rng.rand(W2, 256) > 0.5, 1, -1), jnp.int8)
    descs = jnp.asarray(np.where(rng.rand(B, K, 256) > 0.5, 1, -1), jnp.int8)
    kern = jnp.asarray(BF.DEFAULT_PREDICTION_LC)
    args_f = (st, descs, jnp.ones((B, K), bool), slab2,
              jnp.ones((W2,), bool), kern, jnp.float32(0.9))
    ms = timeit(lambda *a: FL.fleet_tick(*a, vocab_cap=W2)[1], args_f,
                rounds=5)
    res["fleet_tick_32sess_131kvocab_ms"] = round(ms, 3)
    res["fleet_ticks_per_s_per_chip"] = round(32 * 1000.0 / ms, 1)

    res["platform"] = jax.devices()[0].platform
    print(json.dumps(res))


if __name__ == "__main__":
    main()
