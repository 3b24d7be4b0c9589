"""Rehearsal merge + online graph reduction (reference:
Memory::rehearsalMerge Memory.cpp:4274, Memory::reduceNode Memory.cpp:1306
behind Mem/ReduceGraph). The stationary-robot property: node count stays
bounded while weights grow."""
import jax
import jax.numpy as jnp
import numpy as np

from rtabmap_tpu.core.frame import extract_features
from rtabmap_tpu.datasets import synthetic as S
from rtabmap_tpu.engine.rtabmap import Rtabmap
from rtabmap_tpu.geometry import camera as C
from rtabmap_tpu.memory.memory import (
    LINK_GLOBAL_CLOSURE, LINK_NEIGHBOR, LINK_NEIGHBOR_MERGED, Link, Memory,
)
from rtabmap_tpu.utils.params import Parameters

CAM = C.CameraModel.make(300.0, 300.0, 160.0, 120.0, 320, 240)


def _run_stationary(n_frames: int, **param_over):
    p = Parameters()
    p.set("RGBD/Enabled", True)
    p.set("RGBD/LinearUpdate", 0.0)   # keep hypothesis stage active but
    p.set("RGBD/AngularUpdate", 0.0)  # default rehearsal distance gate off
    for k, v in param_over.items():
        p.set(k, v)
    slam = Rtabmap(CAM, p, node_capacity=128, words_per_frame=256)
    pose = S.loop_trajectory(8)[0]
    ext = jax.jit(lambda g, d: extract_features(g, d, CAM, 256))
    g, d = S.render(pose, CAM)
    fr = ext(g, d)
    for i in range(n_frames):
        slam.process(fr, np.asarray(pose), stamp=float(i))
    return slam


def test_stationary_robot_bounded_nodes_growing_weight():
    n = 12
    slam = _run_stationary(n, **{"Mem/RehearsalSimilarity": 0.3})
    # identical stationary frames merge: the graph must NOT grow ~n nodes
    total = len(slam.memory.signatures)
    assert total <= 3, f"stationary run grew {total} nodes"
    # weight accumulated on the surviving node
    w = max(s.weight for s in slam.memory.signatures.values())
    assert w >= n - 3, f"weight {w} did not accumulate"


def test_rehearsal_disabled_grows_nodes():
    n = 8
    slam = _run_stationary(n, **{"Mem/RehearsalSimilarity": 1.1})
    assert len(slam.memory.signatures) == n


def test_rehearsal_moving_no_merge():
    """With RehearsalWeightIgnoredWhileMoving and real motion, no merge."""
    p = Parameters()
    p.set("RGBD/Enabled", True)
    p.set("Mem/RehearsalSimilarity", 0.05)
    p.set("Mem/RehearsalWeightIgnoredWhileMoving", True)
    p.set("RGBD/LinearUpdate", 0.01)
    p.set("RGBD/AngularUpdate", 0.01)
    slam = Rtabmap(CAM, p, node_capacity=128, words_per_frame=256)
    poses = S.loop_trajectory(24)
    ext = jax.jit(lambda g, d: extract_features(g, d, CAM, 256))
    for i in range(8):
        g, d = S.render(poses[i], CAM)
        slam.process(ext(g, d), np.asarray(poses[i]), stamp=float(i))
    assert len(slam.memory.signatures) == 8


def test_rehearsal_id_updated_to_new_keeps_new():
    n = 6
    slam = _run_stationary(
        n, **{"Mem/RehearsalSimilarity": 0.3,
              "Mem/RehearsalIdUpdatedToNewOne": True})
    ids = sorted(slam.memory.signatures)
    assert len(ids) <= 3
    # surviving node must be a recent id (old ones merged away)
    assert ids[-1] >= n - 1


def test_reduce_node_rewires_closure_partner():
    mem = Memory(Parameters(), node_capacity=32, words_per_frame=16)
    # chain 1-2-3 with a closure 2->10 (10 in a separate chain 10-11)
    from rtabmap_tpu.core.frame import FrameFeatures

    from rtabmap_tpu.vocab.dictionary import DESC_DIM

    def frame():
        K = 16
        return FrameFeatures(
            uv=jnp.zeros((K, 2)), desc=jnp.ones((K, DESC_DIM), jnp.int8),
            pts3d=jnp.zeros((K, 3)), valid=jnp.ones((K,), bool),
            valid3d=jnp.ones((K,), bool), angle=jnp.zeros((K,)),
            response=jnp.zeros((K,)))

    eye = np.eye(3, 4, dtype=np.float32)
    sigs = {}
    for sid in range(1, 6):
        s = mem.create_signature(frame(), eye, float(sid))
        sigs[s.id] = s
    t = np.eye(3, 4, dtype=np.float32)
    t[0, 3] = 0.5
    inf = np.eye(6, dtype=np.float32)
    mem.add_link(Link(1, 2, LINK_NEIGHBOR, t, inf))
    mem.add_link(Link(2, 3, LINK_NEIGHBOR, t, inf))
    mem.add_link(Link(4, 5, LINK_NEIGHBOR, t, inf))
    closure_t = np.eye(3, 4, dtype=np.float32)
    mem.add_link(Link(2, 4, LINK_GLOBAL_CLOSURE, closure_t, inf))

    reduced_to = mem.reduce_node(2)
    assert reduced_to == 4
    assert 2 not in mem.signatures
    # closure partner 4 must now reach 2's neighbors 1 and 3 via merged links
    s4 = mem.signatures[4]
    assert s4.links[1].type == LINK_NEIGHBOR_MERGED
    assert s4.links[3].type == LINK_NEIGHBOR_MERGED
    # transform composition: T_4_1 = inv(T_2_4) . T_2_1
    np.testing.assert_allclose(s4.links[3].transform[0, 3], 0.5, atol=1e-5)
    np.testing.assert_allclose(s4.links[1].transform[0, 3], -0.5, atol=1e-5)


def test_reduce_graph_engine_bounded():
    """Mem/ReduceGraph keeps the graph small on a looping revisit."""
    n_loop = 24
    poses = jnp.concatenate(
        [S.loop_trajectory(n_loop), S.loop_trajectory(n_loop)], axis=0)
    p = Parameters()
    p.set("Mem/ReduceGraph", True)
    p.set("Mem/STMSize", 4)
    slam = Rtabmap(CAM, p, node_capacity=128, words_per_frame=256)
    ext = jax.jit(lambda g, d: extract_features(g, d, CAM, 256))
    loops = 0
    for i in range(2 * n_loop):
        g, d = S.render(poses[i], CAM)
        st = slam.process(ext(g, d), np.asarray(poses[i]), stamp=float(i))
        loops += int(st.loop_closure_id > 0)
    assert loops >= 1
    # second lap nodes that closed a loop get reduced on STM exit
    assert len(slam.memory.signatures) < 2 * n_loop
