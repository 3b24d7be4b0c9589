"""Benchmark: flagship kernels + engine-scale ticks on one chip.

Primary metric (comparable across rounds): full visual-odometry device
step throughput — detect + describe + depth-3D + mutual NNDR matmul
matching + 192-hypothesis PnP-RANSAC, 320x240, 384 kp, over a batch of
32 DISTINCT frame pairs (vmapped end to end; the deployment shape of a
multi-camera rig / multi-session mapping fleet).

Robustness (round-4 rework): the tunneled TPU backend can wedge on init
or first compile (round-3 post-mortem: a trivial jit took 167-240 s+
through the tunnel). Each phase therefore runs in its OWN subprocess
with a hard timeout; the primary retries with backoff across wedges; the
primary JSON line is printed (flushed) the moment it is measured; extras
are never skipped silently — every skipped phase is recorded in
``extras_skipped`` with its reason, and per-phase compile/run times are
reported. On total failure the final line is still machine-readable JSON
with an ``error`` field.

Extra phases: the FULL SLAM engine tick (likelihood -> Bayes posterior ->
hypothesis -> transfer bookkeeping) at 1k, 4k and 8k resident WM nodes —
the reference's bounded-update claim surface (Rtabmap.cpp:4548-4710) —
and the 32-session fleet loop-closure tick (parallel/fleet.py).

``vs_baseline``: the reference (introlab/rtabmap) publishes no in-tree
numbers (BASELINE.md); its JFR-2018 real-time operating point is ~30 Hz
RGB-D visual odometry on a desktop CPU, so vs_baseline = fps / 30.

The LAST stdout line is the full JSON record (primary + extras).
"""
import json
import os
import pathlib
import subprocess
import sys
import time

import numpy as np

# Persistent compilation cache for the TPU platform only (.jax_cache_tpu):
# remote-compile latency through the tunnel is volatile (17s..65s per
# kernel measured in-round) and a cold bench can blow its time budget.
# The CPU suite keeps the cache DISABLED — XLA:CPU executable
# (de)serialization segfaults on this host (see tests/conftest.py); the
# TPU executable path serialized fine across rounds.
_cache = pathlib.Path(__file__).resolve().parent / ".jax_cache_tpu"

PRIMARY_TIMEOUT_S = int(os.environ.get("BENCH_PRIMARY_TIMEOUT_S", "300"))
PRIMARY_RETRIES = int(os.environ.get("BENCH_PRIMARY_RETRIES", "3"))
EXTRA_TIMEOUT_S = int(os.environ.get("BENCH_EXTRA_TIMEOUT_S", "300"))
TOTAL_BUDGET_S = int(os.environ.get("BENCH_TOTAL_BUDGET_S", "2700"))


def _sync(x):
    return np.asarray(x).ravel()[0]


def _enable_cache():
    import jax

    if jax.default_backend() != "cpu":
        _cache.mkdir(exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", str(_cache))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)


# ------------------------------------------------------------------- phases


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

    t_c = time.perf_counter()
    step = jax.jit(jax.vmap(fn))
    out = step(ga, da, gb, db, keys)
    # NOTE: through the tunneled TPU platform, block_until_ready() can
    # return before execution finishes — a host fetch of one output element
    # is the only trustworthy sync. Timing = queued dispatches + one final
    # fetch, with the tunnel round-trip measured separately and subtracted.
    _sync(out[1][0])
    compile_s = time.perf_counter() - t_c
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
    return {
        "metric": "vo_step_fps_1chip",
        "value": round(rounds * B / best, 2),
        "unit": "frames/s",
        "vs_baseline": round(rounds * B / best / 30.0, 3),
        "spread_pct": round(spread, 1),
        "compile_s": round(compile_s, 1),
        "rtt_ms": round(rtt * 1000.0, 1),
    }


def _populate_engine(n_nodes: int, node_capacity: int, mesh=None):
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
                   words_per_frame=K, mesh=mesh)
    node_capacity = slam.memory.node_capacity  # mesh rounds capacity up
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
    if mesh is not None:
        # bulk upload must PRESERVE the slab partitioning
        from jax.sharding import NamedSharding, PartitionSpec as P

        ax = slam.memory.shard_axis
        mem.node_words = jax.device_put(
            jnp.asarray(words_slab), NamedSharding(mesh, P(ax, None)))
        mem.node_uv = jax.device_put(
            jnp.asarray(uv_slab), NamedSharding(mesh, P(ax, None, None)))
        mem.node_pts = jax.device_put(
            jnp.asarray(pts_slab), NamedSharding(mesh, P(ax, None, None)))
        mem.node_valid = jax.device_put(
            jnp.asarray(valid_slab), NamedSharding(mesh, P(ax)))
    else:
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


def bench_engine_tick(n_nodes: int, node_capacity: int, ticks: int = 12,
                      mesh_devices: int = 0):
    """Median full-engine-tick latency with n_nodes resident (ms).
    ``mesh_devices`` > 0 runs the ENGINE sharded over a virtual CPU mesh
    (the multi-chip configuration, slabs partitioned under GSPMD)."""
    mesh = None
    if mesh_devices:
        from rtabmap_tpu.parallel.sharded import make_mesh

        mesh = make_mesh(mesh_devices)
    t_c = time.perf_counter()
    slam, frame = _populate_engine(n_nodes, node_capacity, mesh=mesh)
    pose = np.eye(3, 4, dtype=np.float32)
    times = []
    setup_s = None
    for k in range(ticks):
        pose = pose.copy()
        pose[0, 3] += 0.3
        t0 = time.perf_counter()
        slam.process(frame(10_000 + k), pose, stamp=float(1000 + k))
        times.append(time.perf_counter() - t0)
        if setup_s is None:
            setup_s = time.perf_counter() - t_c  # populate + compile tick
    label = f"wm{n_nodes // 1000}k"
    if mesh_devices:
        label += f"_sh{mesh_devices}"
    ms = float(np.median(times) * 1000.0)
    rec = {
        f"engine_tick_ms_{label}": round(ms, 2),
        f"engine_setup_s_{label}": round(setup_s, 1),
    }
    if n_nodes <= 1000:
        rec[f"engine_ticks_per_s_{label}"] = round(1000.0 / ms, 2)
    return rec


def bench_fleet_tick(batch: int = 32, repeats: int = 3):
    """32-session fleet loop-closure tick (ms) — shared vocab, per-session
    WM likelihood + Bayes posterior as ONE jitted device step."""
    import jax.numpy as jnp

    from rtabmap_tpu.bayes.filter import DEFAULT_PREDICTION_LC
    from rtabmap_tpu.parallel import fleet as FL
    from rtabmap_tpu.vocab.dictionary import DESC_DIM

    K, W, N = 256, 32768, 512
    rng = np.random.RandomState(2)
    slab = jnp.asarray(
        np.where(rng.rand(W, DESC_DIM) > 0.5, 1, -1).astype(np.int8))
    word_valid = jnp.ones((W,), bool)
    state = FL.init_fleet(batch, N, K, W)
    desc = jnp.asarray(
        np.where(rng.rand(batch, K, DESC_DIM) > 0.5, 1, -1).astype(np.int8))
    dv = jnp.ones((batch, K), bool)
    kernel = jnp.asarray(DEFAULT_PREDICTION_LC)
    t_c = time.perf_counter()
    out = FL.fleet_tick(state, desc, dv, slab, word_valid, kernel,
                        jnp.float32(0.9), W)
    _sync(out[0])
    compile_s = time.perf_counter() - t_c
    times = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        out = FL.fleet_tick(state, desc, dv, slab, word_valid, kernel,
                            jnp.float32(0.9), W)
        _sync(out[0])
        times.append(time.perf_counter() - t0)
    return {"fleet32_tick_ms": round(float(min(times) * 1000.0), 2),
            "fleet_compile_s": round(compile_s, 1)}


PHASES = {
    "primary": bench_vo_kernel,
    "tick1k": lambda: bench_engine_tick(1000, 2048, ticks=8),
    "tick4k": lambda: bench_engine_tick(4096, 6144, ticks=6),
    "tick8k": lambda: bench_engine_tick(8192, 10240, ticks=5),
    # scale gauntlet — driver-captured since round 5 (VERDICT r4 next #6)
    "tick16k": lambda: bench_engine_tick(16384, 20480, ticks=4),
    "tick32k": lambda: bench_engine_tick(32768, 36864, ticks=3),
    "tick64k": lambda: bench_engine_tick(65536, 73728, ticks=3),
    # the ENGINE sharded over a virtual 8-device CPU mesh (multi-chip
    # configuration; bench host has 1 real chip — VERDICT r4 next #2)
    "tick4k_sharded8": lambda: bench_engine_tick(4096, 6144, ticks=4,
                                                 mesh_devices=8),
    "fleet": bench_fleet_tick,
}


def _run_phase_inline(name: str) -> None:
    """Child-process entry: run one phase, print its JSON record."""
    if "sharded" in name:
        # virtual CPU mesh BEFORE any jax import: the sharded phase
        # validates the multi-chip engine configuration on this
        # single-chip host
        os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                                   + " --xla_force_host_platform_device_count=8")
        import jax

        jax.config.update("jax_platforms", "cpu")
    _enable_cache()
    rec = PHASES[name]()
    print(json.dumps(rec))
    sys.stdout.flush()


def _spawn_phase(name: str, timeout_s: int):
    """Run a phase in a subprocess; returns (record | None, reason)."""
    t0 = time.perf_counter()
    try:
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--phase", name],
            capture_output=True, text=True, timeout=timeout_s,
            cwd=os.path.dirname(os.path.abspath(__file__)))
    except subprocess.TimeoutExpired:
        return None, f"timeout_{timeout_s}s"
    dt = time.perf_counter() - t0
    if proc.returncode != 0:
        tail = (proc.stderr or "").strip().splitlines()[-3:]
        return None, f"rc={proc.returncode}: {' | '.join(tail)[:300]}"
    for line in reversed((proc.stdout or "").strip().splitlines()):
        try:
            rec = json.loads(line)
            rec[f"phase_{name}_s"] = round(dt, 1)
            return rec, ""
        except (json.JSONDecodeError, ValueError):
            continue
    return None, "no JSON in phase output"


def main():
    t_start = time.perf_counter()

    def remaining():
        return TOTAL_BUDGET_S - (time.perf_counter() - t_start)

    # --- primary, with retry + backoff across backend wedges
    rec, fail_reasons = None, []
    for attempt in range(PRIMARY_RETRIES):
        rec, reason = _spawn_phase("primary", PRIMARY_TIMEOUT_S)
        if rec is not None:
            break
        fail_reasons.append(reason)
        sys.stderr.write(f"bench: primary attempt {attempt + 1} failed "
                         f"({reason}); retrying\n")
        time.sleep(15 * (attempt + 1))
    if rec is None:
        # machine-readable failure cause — never a bare watchdog message
        print(json.dumps({
            "metric": "vo_step_fps_1chip", "value": None, "unit": "frames/s",
            "vs_baseline": None,
            "error": "primary failed after retries",
            "attempts": fail_reasons,
        }))
        sys.exit(2)
    # primary secured: emit it IMMEDIATELY so a later wedge cannot eat it
    print(json.dumps(rec))
    sys.stdout.flush()

    # --- extras: each in its own subprocess; skips are always recorded
    skipped = {}
    _caps = {"tick8k": 2, "tick16k": 2, "tick64k": 3}
    for name in ("tick1k", "tick4k", "tick8k", "tick16k", "tick64k",
                 "tick4k_sharded8", "fleet"):
        # bigger ticks pay the largest populate + per-bucket compiles
        cap = EXTRA_TIMEOUT_S * _caps.get(name, 1)
        budget = int(min(cap, remaining() - 20))
        if budget < 60:
            skipped[name] = f"time_budget ({int(remaining())}s left)"
            continue
        extra, reason = _spawn_phase(name, budget)
        if extra is None:
            skipped[name] = reason
        else:
            rec.update(extra)
    if skipped:
        rec["extras_skipped"] = skipped
    rec["total_s"] = round(time.perf_counter() - t_start, 1)
    print(json.dumps(rec))


if __name__ == "__main__":
    if len(sys.argv) >= 3 and sys.argv[1] == "--phase":
        _run_phase_inline(sys.argv[2])
    else:
        main()
