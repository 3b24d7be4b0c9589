"""Leveled logging + wall-clock timing + per-tick statistics.

Capability parity: utilite's ``ULogger``/``UTimer`` and the engine's
``Statistics`` surface (/root/reference/utilite/include/rtabmap/utilite/
ULogger.h:59-63, UTimer.h; corelib/include/rtabmap/core/Statistics.h:43) —
leveled console/file logging, stage timers that feed ``Timing/*`` metrics,
and a flat named-metric dict emitted per ``process()`` call.

Host-side only; device code reports timings via returned arrays.
"""
from __future__ import annotations

import logging
import sys
import time
from contextlib import contextmanager
from typing import Dict, Optional

_logger = logging.getLogger("rtabmap_tpu")
if not _logger.handlers:
    h = logging.StreamHandler(sys.stderr)
    h.setFormatter(logging.Formatter("[%(levelname).1s %(asctime)s %(name)s] %(message)s", "%H:%M:%S"))
    _logger.addHandler(h)
    _logger.setLevel(logging.WARNING)


def get_logger(name: str = "") -> logging.Logger:
    return _logger.getChild(name) if name else _logger


def set_level(level: str) -> None:
    _logger.setLevel(getattr(logging, level.upper()))


def add_file_sink(path: str) -> None:
    h = logging.FileHandler(path)
    h.setFormatter(logging.Formatter("[%(levelname).1s %(asctime)s %(name)s] %(message)s"))
    _logger.addHandler(h)


class Timer:
    """Restartable stage timer (reference: UTimer.ticks())."""

    def __init__(self):
        self._t = time.perf_counter()

    def ticks(self) -> float:
        now = time.perf_counter()
        dt = now - self._t
        self._t = now
        return dt

    def elapsed(self) -> float:
        return time.perf_counter() - self._t

    def restart(self) -> None:
        self._t = time.perf_counter()


class Statistics:
    """Flat named-metric accumulator for one engine tick.

    Mirrors the reference's Statistics data() map semantics: string key ->
    float value, grouped by prefix (Timing/, Memory/, Loop/, Keypoint/...).
    """

    def __init__(self):
        self.data: Dict[str, float] = {}
        self.stamp: float = 0.0
        self.ref_id: int = 0
        self.loop_closure_id: int = 0
        self.proximity_detection_id: int = 0
        self.extended: bool = False

    def add(self, key: str, value: float) -> None:
        self.data[key] = float(value)

    def get(self, key: str, default: float = 0.0) -> float:
        return self.data.get(key, default)

    @contextmanager
    def time_stage(self, key: str):
        t0 = time.perf_counter()
        yield
        self.data[key] = (time.perf_counter() - t0) * 1000.0  # ms, matching Timing/* units

    def group(self, prefix: str) -> Dict[str, float]:
        return {k: v for k, v in self.data.items() if k.startswith(prefix)}

    _registry_cache = None

    @classmethod
    def reference_registry(cls):
        """The reference's full declared statistic catalog (164 names from
        RTABMAP_STATS macros, Statistics.h:43+), in its published
        'Prefix/Name with spaces/unit' key form."""
        if cls._registry_cache is None:
            import json
            import os

            path = os.path.join(os.path.dirname(__file__), "stats_registry.json")
            with open(path) as f:
                cls._registry_cache = tuple(json.load(f))
        return cls._registry_cache


class profile_trace:
    """JAX profiler trace context (SURVEY 5.1: the TPU-native analogue of
    the reference's UTimer-driven Timing/* statistics is a device trace —
    view with TensorBoard/xprof). No-op when ``trace_dir`` is empty.

    Usage::

        with profile_trace(params["Tpu/ProfileDir"]):
            for i, frame in enumerate(frames):
                with profile_trace.step(i):
                    ... device work ...
    """

    def __init__(self, trace_dir: str = ""):
        self.dir = str(trace_dir or "")
        self._cm = None

    def __enter__(self):
        if self.dir:
            import jax

            self._cm = jax.profiler.trace(self.dir)
            self._cm.__enter__()
        return self

    def __exit__(self, *exc):
        if self._cm is not None:
            self._cm.__exit__(*exc)
        return False

    @staticmethod
    def step(i: int, enabled: bool = True):
        if not enabled:
            import contextlib

            return contextlib.nullcontext()
        import jax

        return jax.profiler.StepTraceAnnotation("slam_tick", step_num=i)
