"""Graph-optimization strategy surface.

Capability parity: the reference's ``Optimizer::create`` strategy factory
(/root/reference/corelib/src/optimizer/Optimizer.cpp — Optimizer/Strategy:
0=TORO, 1=g2o, 2=GTSAM, 3=Ceres, plus optimizeBA backends). All four are
third-party CPU solvers wrapping the same two problems (SE(2)/SE(3) pose
graphs and bundle adjustment); this framework ships its own TPU-native
solvers instead — batched dense Gauss-Newton/Cholesky and matrix-free
PCG for pose graphs (optim/pose_graph.py), Schur-complement LM for BA
(optim/ba.py) — so every strategy id resolves to a native backend rather
than an unavailable external library.
"""
from __future__ import annotations

from rtabmap_tpu.optim import ba  # noqa: F401
from rtabmap_tpu.optim import pose_graph  # noqa: F401
from rtabmap_tpu.optim.pose_graph import (  # noqa: F401
    PoseGraph, make_graph, optimize, optimize_dense, optimize_pcg,
)

# reference Optimizer/Strategy numbering -> native backend
_STRATEGY_BACKEND = {
    0: "dense",   # TORO slot (tree init + SGD in the reference)
    1: "dense",   # g2o slot
    2: "pcg",     # GTSAM slot (iSAM-ish incremental -> iterative solver)
    3: "pcg",     # Ceres slot
}


def create_optimizer(params=None, strategy=None):
    """Returns optimize_dense or optimize_pcg honoring Optimizer/Strategy."""
    if strategy is None:
        from rtabmap_tpu.utils.params import Parameters

        p = params or Parameters()
        strategy = int(p["Optimizer/Strategy"])
    name = _STRATEGY_BACKEND.get(int(strategy), "dense") \
        if not isinstance(strategy, str) else strategy
    return optimize_dense if name == "dense" else optimize_pcg
