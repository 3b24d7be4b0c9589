"""Benchmark: full visual-odometry device step throughput on one chip.

Measures the flagship jitted kernel (detect + describe + depth-3D + mutual
NNDR matmul matching + 192-hypothesis PnP-RANSAC, 320x240, 384 kp) —
the per-frame compute path of the SLAM engine — over a batch of 32
DISTINCT frame pairs (vmapped end to end, nothing shared between lanes:
the deployment shape of a multi-camera rig / multi-session mapping fleet).

``vs_baseline``: the reference (introlab/rtabmap) publishes no in-tree
numbers (BASELINE.md); its JFR-2018 real-time operating point is ~30 Hz
RGB-D visual odometry on a desktop CPU, so vs_baseline = fps / 30.

Prints ONE JSON line.
"""
import json
import time

import numpy as np


def main():
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
    # NOTE: through the tunneled TPU platform, block_until_ready() can return
    # before execution finishes — a host fetch of one output element is the
    # only trustworthy sync. Timing = queued dispatches + one final fetch,
    # with the tunnel round-trip measured separately and subtracted.
    _ = np.asarray(out[1][0])
    triv = jax.jit(lambda x: x + 1)
    _ = np.asarray(triv(out[1][0]))
    t0 = time.perf_counter()
    _ = np.asarray(triv(out[1][0]))
    rtt = time.perf_counter() - t0

    rounds = 20
    t0 = time.perf_counter()
    for _ in range(rounds):
        out = step(ga, da, gb, db, keys)
    _ = np.asarray(out[1][0])
    dt = max(time.perf_counter() - t0 - rtt, 1e-9)
    fps = rounds * B / dt

    print(json.dumps({
        "metric": "vo_step_fps_1chip",
        "value": round(fps, 2),
        "unit": "frames/s",
        "vs_baseline": round(fps / 30.0, 3),
    }))


if __name__ == "__main__":
    main()
