"""IncrementalNeighborTable must equal a from-scratch rebuild after any
mutation sequence (adds, removes, node eviction) — the per-tick Bayes
prediction correctness guarantee behind the O(neighborhood) update."""
import numpy as np

from rtabmap_tpu.bayes.filter import IncrementalNeighborTable, build_neighbor_table


def _edges_of(tbl):
    out = set()
    for a in range(tbl.n_slots):
        for b in tbl.adj[a]:
            out.add((min(a, b), max(a, b)))
    return out


def test_incremental_matches_full_rebuild():
    rng = np.random.default_rng(0)
    n_slots, depth, mn = 64, 4, 9
    tbl = IncrementalNeighborTable(n_slots, depth, mn)
    for s in range(n_slots):
        tbl.add_node(s)
    live_edges = set()
    for step in range(300):
        op = rng.random()
        a, b = rng.integers(0, n_slots, 2)
        if op < 0.55 and a != b:
            tbl.add_edge(int(a), int(b))
            live_edges.add((min(a, b), max(a, b)))
        elif op < 0.75 and live_edges:
            e = list(live_edges)[rng.integers(len(live_edges))]
            tbl.remove_edge(*e)
            live_edges.discard(e)
        else:
            s = int(a)
            tbl.remove_node(s)
            live_edges = {e for e in live_edges if s not in e}
            tbl.add_node(s)
        if step % 50 == 49:
            idx, margin = tbl.flush()
            ref_idx, ref_margin = build_neighbor_table(
                sorted(live_edges), n_slots, depth, mn)
            np.testing.assert_array_equal(idx, ref_idx)
            np.testing.assert_array_equal(margin, ref_margin)


def test_engine_posterior_unchanged():
    """Engine smoke: posterior path produces identical hypotheses with the
    incremental table (covered indirectly by the full suites; here just a
    short run for determinism)."""
    import jax
    import jax.numpy as jnp

    from rtabmap_tpu.core.frame import extract_features
    from rtabmap_tpu.datasets import synthetic as S
    from rtabmap_tpu.engine.rtabmap import Rtabmap
    from rtabmap_tpu.geometry import camera as C
    from rtabmap_tpu.utils.params import Parameters

    CAM = C.CameraModel.make(300.0, 300.0, 160.0, 120.0, 320, 240)
    n = 16
    poses = S.loop_trajectory(n)
    slam = Rtabmap(CAM, Parameters(), node_capacity=64, words_per_frame=256)
    ext = jax.jit(lambda g, d: extract_features(g, d, CAM, 256))
    for i in range(n):
        g, d = S.render(poses[i % (n // 2)], CAM)
        st = slam.process(ext(g, d), np.asarray(poses[i % (n // 2)]),
                          stamp=float(i))
    assert slam.last_hypothesis[0] > 0  # revisit produced a hypothesis
