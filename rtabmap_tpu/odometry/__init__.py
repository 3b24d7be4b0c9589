"""Odometry strategy factory.

Capability parity: the reference's ``Odometry::create`` strategy switch
(/root/reference/corelib/src/Odometry.cpp:91-160 — Odom/Strategy selects
F2M/F2F/Mono plus 12 external-library wrappers under corelib/src/odometry/:
FOVIS, viso2, DVO, ORB-SLAM, OKVIS, LOAM, FLOAM, MSCKF-VIO, VINS-Fusion,
OpenVINS, Open3D, cuVSLAM). The native TPU strategies are first-class;
the external wrappers are registered with explicit unavailability errors
(they bind CPU/CUDA libraries that have no place on a TPU host) so the
driver-selection surface matches.
"""
from __future__ import annotations

from typing import Callable, Dict, List

from rtabmap_tpu.odometry.f2f import OdometryF2F  # noqa: F401
from rtabmap_tpu.odometry.f2m import OdometryF2M  # noqa: F401
from rtabmap_tpu.odometry.mono import OdometryMono  # noqa: F401
from rtabmap_tpu.odometry.scan_f2m import OdometryScanF2M  # noqa: F401

# reference Odom/Strategy numbering (Parameters.h: 0=F2M 1=F2F ... 12=Open3D)
_STRATEGIES: Dict[int, str] = {
    0: "f2m", 1: "f2f", 2: "fovis", 3: "viso2", 4: "dvo", 5: "orbslam",
    6: "okvis", 7: "loam", 8: "msckf", 9: "vins", 10: "openvins",
    11: "floam", 12: "open3d",
}

_EXTERNAL = {name for i, name in _STRATEGIES.items() if i >= 2}


def _external_stub(name: str) -> Callable:
    def make(*a, **kw):
        raise RuntimeError(
            f"odometry strategy '{name}' wraps an external CPU/CUDA library "
            f"(reference: corelib/src/odometry/Odometry"
            f"{name.capitalize()}.cpp) and is not available on a TPU host; "
            f"use one of {sorted(set(_REGISTRY) - _EXTERNAL)}")
    return make


_REGISTRY: Dict[str, Callable] = {
    "f2m": OdometryF2M,
    "f2f": OdometryF2F,
    "mono": OdometryMono,
    # the reference reaches scan/ICP odometry through OdometryF2M +
    # Reg/Strategy=1 (OdometryF2M.cpp scan local map); here it is a
    # first-class strategy
    "scan_f2m": OdometryScanF2M,
}
_REGISTRY.update({n: _external_stub(n) for n in _EXTERNAL})


def available_strategies() -> List[str]:
    return sorted(_REGISTRY)


def create_odometry(cam, params=None, **kwargs):
    """Factory honoring the Odom/Strategy parameter (int, reference
    numbering) or a strategy name string via kwargs['strategy']."""
    strategy = kwargs.pop("strategy", None)
    if strategy is None:
        from rtabmap_tpu.utils.params import Parameters

        p = params or Parameters()
        strategy = _STRATEGIES.get(int(p["Odom/Strategy"]), "f2m")
        # the reference reaches scan odometry via OdometryF2M + Reg/Strategy=1
        # (ICP); mirror that dispatch (Registration::create in Odometry ctor)
        if strategy == "f2m" and int(p["Reg/Strategy"]) == 1:
            strategy = "scan_f2m"
    if isinstance(strategy, int):
        strategy = _STRATEGIES.get(strategy, "f2m")
    if strategy not in _REGISTRY:
        raise KeyError(f"unknown odometry strategy '{strategy}'; "
                       f"available: {available_strategies()}")
    return _REGISTRY[strategy](cam, params, **kwargs)
