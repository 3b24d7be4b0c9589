"""Benchmark: flagship kernels + engine-scale ticks on one chip.

Primary metric (comparable across rounds): full visual-odometry device
step throughput — detect + describe + depth-3D + mutual NNDR matmul
matching + 192-hypothesis PnP-RANSAC, 320x240, 384 kp, over a batch of
32 DISTINCT frame pairs (vmapped end to end; the deployment shape of a
multi-camera rig / multi-session mapping fleet).

Variance control: the timed section runs REPEATS times and the BEST
(min-time) figure is reported with the observed spread — run-to-run
noise is no longer indistinguishable from regressions (round-2 lesson).

Also measured (extra JSON fields): the FULL SLAM engine tick
(likelihood -> Bayes posterior -> hypothesis -> transfer bookkeeping) at
1k and 4k resident WM nodes — the reference's bounded-update claim
surface (Rtabmap.cpp:4548-4710) — and the 32-session fleet loop-closure
tick (parallel/fleet.py).

``vs_baseline``: the reference (introlab/rtabmap) publishes no in-tree
numbers (BASELINE.md); its JFR-2018 real-time operating point is ~30 Hz
RGB-D visual odometry on a desktop CPU, so vs_baseline = fps / 30.

Prints ONE JSON line.
"""
import json
import os
import pathlib
import time

import numpy as np

# Persistent compilation cache for the TPU platform only (.jax_cache_tpu):
# remote-compile latency through the tunnel is volatile (17s..65s per
# kernel measured in-round) and a cold bench can blow its time budget.
# The CPU suite keeps the cache DISABLED — XLA:CPU executable
# (de)serialization segfaults on this host (see tests/conftest.py); the
# TPU executable path serialized fine across rounds.
_cache = pathlib.Path(__file__).resolve().parent / ".jax_cache_tpu"


def _sync(x):
    return np.asarray(x).ravel()[0]


def bench_vo_kernel(repeats: int = 5, rounds: int = 10):
    import jax
    import jax.numpy as jnp

    import __graft_entry__ as G

    fn, args = G.entry()
    B = 32
    rng = np.random.RandomState(0)
    H, W = 240, 320
    # device-native inputs (outputs of a jitted op stay resident; plain
    # np->jnp arrays are re-uploaded through the tunnel on every call)
    dev = jax.jit(lambda *xs: tuple(x + 0 for x in xs))
    ga, da, gb, db = dev(
        jnp.asarray(rng.rand(B, H, W), jnp.float32),
        jnp.asarray(1.0 + rng.rand(B, H, W), jnp.float32),
        jnp.asarray(rng.rand(B, H, W), jnp.float32),
        jnp.asarray(1.0 + rng.rand(B, H, W), jnp.float32),
    )
    keys = jax.jit(lambda k: jax.random.split(k, B))(args[-1])

    step = jax.jit(jax.vmap(fn))
    out = step(ga, da, gb, db, keys)
    # NOTE: through the tunneled TPU platform, block_until_ready() can
    # return before execution finishes — a host fetch of one output element
    # is the only trustworthy sync. Timing = queued dispatches + one final
    # fetch, with the tunnel round-trip measured separately and subtracted.
    _sync(out[1][0])
    triv = jax.jit(lambda x: x + 1)
    _sync(triv(out[1][0]))
    t0 = time.perf_counter()
    _sync(triv(out[1][0]))
    rtt = time.perf_counter() - t0

    times = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        for _ in range(rounds):
            out = step(ga, da, gb, db, keys)
        _sync(out[1][0])
        times.append(max(time.perf_counter() - t0 - rtt, 1e-9))
    best = min(times)
    spread = (max(times) - best) / best * 100.0
    return rounds * B / best, spread


def _populate_engine(n_nodes: int, node_capacity: int):
    """Engine with n_nodes resident WM nodes (synthetic features)."""
    import jax
    import jax.numpy as jnp

    from rtabmap_tpu.core.frame import FrameFeatures
    from rtabmap_tpu.engine.rtabmap import Rtabmap
    from rtabmap_tpu.geometry import camera as C
    from rtabmap_tpu.memory.memory import LINK_NEIGHBOR, Link
    from rtabmap_tpu.utils.params import Parameters
    from rtabmap_tpu.vocab.dictionary import DESC_DIM

    cam = C.CameraModel.make(300.0, 300.0, 160.0, 120.0, 320, 240)
    K = 256
    slam = Rtabmap(cam, Parameters(), node_capacity=node_capacity,
                   words_per_frame=K)
    rng = np.random.RandomState(1)

    def frame(seed):
        r = np.random.RandomState(seed)
        desc = np.where(r.rand(K, DESC_DIM) > 0.5, 1, -1).astype(np.int8)
        uv = (r.rand(K, 2) * [320, 240]).astype(np.float32)
        pts = r.randn(K, 3).astype(np.float32) + [0, 0, 3.0]
        ones = np.ones((K,), bool)
        return FrameFeatures(uv=jnp.asarray(uv), desc=jnp.asarray(desc),
                             pts3d=jnp.asarray(pts), valid=jnp.asarray(ones),
                             valid3d=jnp.asarray(ones),
                             angle=jnp.zeros((K,)), response=jnp.zeros((K,)))

    mem = slam.memory
    t = np.eye(3, 4, dtype=np.float32)
    t[0, 3] = 0.3
    inf = np.eye(6, dtype=np.float32)
    # bulk population: synthetic word ids straight into the slabs as ONE
    # device upload (per-node _insert_slab is dispatch-bound through the
    # TPU tunnel); the timed probe frames below still run the real path
    from rtabmap_tpu.memory.memory import Signature

    W = mem.vocab.capacity
    N = node_capacity
    all_words = rng.randint(0, W, (n_nodes, K)).astype(np.int32)
    all_uv = (rng.rand(n_nodes, K, 2) * [320, 240]).astype(np.float32)
    all_pts = (rng.randn(n_nodes, K, 3) + [0, 0, 3.0]).astype(np.float32)
    words_slab = np.full((N, K), -1, np.int32)
    uv_slab = np.zeros((N, K, 2), np.float32)
    pts_slab = np.zeros((N, K, 3), np.float32)
    valid_slab = np.zeros((N,), bool)
    words_slab[:n_nodes] = all_words
    uv_slab[:n_nodes] = all_uv
    pts_slab[:n_nodes] = all_pts
    valid_slab[:n_nodes] = True
    mem.node_words = jnp.asarray(words_slab)
    mem.node_uv = jnp.asarray(uv_slab)
    mem.node_pts = jnp.asarray(pts_slab)
    mem.node_valid = jnp.asarray(valid_slab)
    mem.host_valid = valid_slab.copy()
    mem.host_wm = valid_slab.copy()
    counts = np.zeros((W,), np.float32)
    for k in range(n_nodes):
        counts[np.unique(all_words[k])] += 1.0
    mem.word_nw = jnp.asarray(counts)
    mem._free_slots = list(range(N - 1, n_nodes - 1, -1))
    desc0 = np.asarray(frame(0).desc)
    prev = None
    for k in range(n_nodes):
        pose = np.eye(3, 4, dtype=np.float32)
        pose[0, 3] = 0.3 * k
        sid = mem._next_id
        mem._next_id += 1
        sig = Signature(
            id=sid, map_id=0, stamp=float(k), pose=pose,
            word_ids=all_words[k],
            desc=desc0, uv=all_uv[k],
            pts3d=all_pts[k], valid3d=np.ones((K,), bool), slot=k)
        mem._slot_to_id[k] = sid
        mem.signatures[sid] = sig
        mem.wm.append(sid)
        slam.optimized_poses[sid] = pose
        if prev is not None:
            mem.add_link(Link(prev, sid, LINK_NEIGHBOR, t, inf))
        prev = sid
    return slam, frame


def bench_engine_tick(n_nodes: int, node_capacity: int, ticks: int = 12):
    """Median full-engine-tick latency with n_nodes resident (ms)."""
    slam, frame = _populate_engine(n_nodes, node_capacity)
    pose = np.eye(3, 4, dtype=np.float32)
    times = []
    for k in range(ticks):
        pose = pose.copy()
        pose[0, 3] += 0.3
        t0 = time.perf_counter()
        slam.process(frame(10_000 + k), pose, stamp=float(1000 + k))
        times.append(time.perf_counter() - t0)
    return float(np.median(times) * 1000.0)


def bench_fleet_tick(batch: int = 32, repeats: int = 3):
    """32-session fleet loop-closure tick (ms) — shared vocab, per-session
    WM likelihood + Bayes posterior as ONE jitted device step."""
    try:
        import jax
        import jax.numpy as jnp

        from rtabmap_tpu.parallel import fleet as FL

        state, slab, word_valid = None, None, None
        K, W, N = 256, 32768, 512
        rng = np.random.RandomState(2)
        from rtabmap_tpu.vocab.dictionary import DESC_DIM

        slab = jnp.asarray(
            np.where(rng.rand(W, DESC_DIM) > 0.5, 1, -1).astype(np.int8))
        word_valid = jnp.ones((W,), bool)
        state = FL.init_fleet(batch, N, K, W)
        desc = jnp.asarray(
            np.where(rng.rand(batch, K, DESC_DIM) > 0.5, 1, -1).astype(np.int8))
        dv = jnp.ones((batch, K), bool)
        from rtabmap_tpu.bayes.filter import DEFAULT_PREDICTION_LC

        kernel = jnp.asarray(DEFAULT_PREDICTION_LC)
        out = FL.fleet_tick(state, desc, dv, slab, word_valid, kernel,
                            jnp.float32(0.9), W)
        _sync(out[0])
        times = []
        for _ in range(repeats):
            t0 = time.perf_counter()
            out = FL.fleet_tick(state, desc, dv, slab, word_valid, kernel,
                                jnp.float32(0.9), W)
            _sync(out[0])
            times.append(time.perf_counter() - t0)
        return float(min(times) * 1000.0)
    except Exception:
        return None


def main():
    import signal
    import sys

    # Hang watchdog: the tunneled TPU platform can wedge on backend init /
    # first compile (observed in-round); convert an indefinite hang into a
    # clean failure so the harness gets a diagnosis instead of a timeout.
    def _alarm(signum, frame):
        sys.stderr.write("bench: TPU backend unresponsive (watchdog fired) "
                         "— no measurement taken this run\n")
        sys.stderr.flush()
        os._exit(2)

    signal.signal(signal.SIGALRM, _alarm)
    signal.alarm(int(os.environ.get("BENCH_WATCHDOG_S", "480")))

    import jax

    if jax.default_backend() != "cpu":
        _cache.mkdir(exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", str(_cache))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    import time as _time

    t_start = _time.perf_counter()
    fps, spread = bench_vo_kernel()

    rec = {
        "metric": "vo_step_fps_1chip",
        "value": round(fps, 2),
        "unit": "frames/s",
        "vs_baseline": round(fps / 30.0, 3),
        "spread_pct": round(spread, 1),
    }

    # primary metric secured: if the extras below wedge the tunnel, the
    # watchdog must still emit the primary JSON line
    def _alarm_extras(signum, frame):
        sys.stderr.write("bench: extras watchdog fired — reporting primary "
                         "metric only\n")
        print(json.dumps(rec))
        sys.stdout.flush()
        os._exit(0)

    signal.signal(signal.SIGALRM, _alarm_extras)
    signal.alarm(max(int(520 - (_time.perf_counter() - t_start)), 30))

    # optional engine-scale phases: each pays fresh jit compiles through
    # the tunnel on a cold cache — run them only inside the time budget
    # and never let a failure eat the primary metric
    tick_1k = tick_4k = fleet_ms = None
    try:
        if _time.perf_counter() - t_start < 300:
            tick_1k = bench_engine_tick(1000, 2048, ticks=8)
        if _time.perf_counter() - t_start < 360:
            tick_4k = bench_engine_tick(4096, 6144, ticks=6)
        if _time.perf_counter() - t_start < 450:
            fleet_ms = bench_fleet_tick()
    except Exception:
        pass
    signal.alarm(0)

    if tick_1k is not None:
        rec["engine_tick_ms_wm1k"] = round(tick_1k, 2)
        rec["engine_ticks_per_s_wm1k"] = round(1000.0 / tick_1k, 2)
    if tick_4k is not None:
        rec["engine_tick_ms_wm4k"] = round(tick_4k, 2)
    if fleet_ms is not None:
        rec["fleet32_tick_ms"] = round(fleet_ms, 2)
    print(json.dumps(rec))


if __name__ == "__main__":
    main()
