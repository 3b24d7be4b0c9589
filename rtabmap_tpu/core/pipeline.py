"""Threaded capture -> odometry -> SLAM pipeline with drop policies.

Capability parity: the reference's event-driven runtime (SURVEY.md §1 L7)
— ``SensorCaptureThread`` (grab + post-update), ``OdometryThread``
(SensorEvent -> OdometryEvent), ``RtabmapThread`` (queue with drop
policy / detection-rate gating -> Rtabmap::process), wired over the
UEventsManager bus (utilite). Python threads + bounded queues replace the
event bus: the device does the math, the host threads only move
references, so the GIL is not a bottleneck.
"""
from __future__ import annotations

import queue
import threading
import time
from dataclasses import dataclass, field
from typing import Any, Callable, Iterable, List, Optional

import numpy as np


@dataclass
class SensorEvent:
    frame: Any                 # FrameFeatures or raw frame
    stamp: float
    seq: int


@dataclass
class OdometryEvent:
    frame: Any
    pose: Optional[np.ndarray]
    covariance: np.ndarray
    info: dict
    stamp: float
    seq: int


class _DropQueue:
    """Bounded queue that drops the OLDEST item when full (the reference
    RtabmapThread's default data-buffer policy, RtabmapThread.h:85-90)."""

    def __init__(self, maxsize: int = 1):
        self._q: "queue.Queue" = queue.Queue(maxsize=maxsize)
        self.dropped = 0

    def put(self, item):
        while True:
            try:
                self._q.put_nowait(item)
                return
            except queue.Full:
                try:
                    self._q.get_nowait()
                    self.dropped += 1
                except queue.Empty:
                    pass

    def get(self, timeout=0.5):
        return self._q.get(timeout=timeout)


_SENTINEL = object()


class SensorCaptureThread(threading.Thread):
    """Pulls frames from a source iterable, applies an optional post-update
    (feature extraction / filtering), emits SensorEvents."""

    def __init__(self, source: Iterable, out_queue: _DropQueue,
                 post_update: Optional[Callable] = None, rate_hz: float = 0.0):
        super().__init__(daemon=True)
        self.source = source
        self.out = out_queue
        self.post_update = post_update
        self.rate = rate_hz
        self.captured = 0

    def run(self):
        t_last = 0.0
        for seq, item in enumerate(self.source):
            if self.rate > 0:
                dt = 1.0 / self.rate - (time.time() - t_last)
                if dt > 0:
                    time.sleep(dt)
                t_last = time.time()
            frame = self.post_update(item) if self.post_update else item
            stamp = getattr(item, "stamp", float(seq))
            self.out.put(SensorEvent(frame=frame, stamp=stamp, seq=seq))
            self.captured += 1
        self.out.put(_SENTINEL)


class OdometryThread(threading.Thread):
    """SensorEvent -> odometry -> OdometryEvent
    (reference: OdometryThread.h:42)."""

    def __init__(self, odometry, in_queue: _DropQueue, out_queue: _DropQueue):
        super().__init__(daemon=True)
        self.odom = odometry
        self.inq = in_queue
        self.out = out_queue
        self.processed = 0

    def run(self):
        while True:
            try:
                ev = self.inq.get()
            except queue.Empty:
                continue
            if ev is _SENTINEL:
                self.out.put(_SENTINEL)
                return
            pose, cov, info = self.odom.process(ev.frame)
            self.out.put(OdometryEvent(
                frame=ev.frame, pose=None if pose is None else np.asarray(pose),
                covariance=np.asarray(cov), info=info, stamp=ev.stamp, seq=ev.seq))
            self.processed += 1


class RtabmapThread(threading.Thread):
    """OdometryEvent -> Rtabmap::process with detection-rate gating
    (reference: RtabmapThread.cpp mainLoop)."""

    def __init__(self, slam, in_queue: _DropQueue,
                 on_stats: Optional[Callable] = None):
        super().__init__(daemon=True)
        self.slam = slam
        self.inq = in_queue
        self.on_stats = on_stats
        self.processed = 0
        self.stats: List = []

    def run(self):
        while True:
            try:
                ev = self.inq.get()
            except queue.Empty:
                continue
            if ev is _SENTINEL:
                return
            pose = ev.pose
            cov = ev.covariance
            if pose is None:
                pose = np.asarray(self.slam._last_pose) if self.slam._last_pose is not None \
                    else np.eye(3, 4, dtype=np.float32)
                cov = np.eye(6) * 9999.0
            st = self.slam.process(ev.frame, pose, cov, stamp=ev.stamp)
            self.processed += 1
            self.stats.append(st)
            if self.on_stats:
                self.on_stats(st)


def run_pipeline(source: Iterable, odometry, slam,
                 post_update: Optional[Callable] = None,
                 queue_size: int = 2, timeout: float = 600.0):
    """Wire and run the 3-stage pipeline to completion; returns the
    RtabmapThread (with .stats) and drop counters.

    (reference wiring: examples/RGBDMapping/main.cpp:100,269-300.)
    """
    q_sensor = _DropQueue(queue_size)
    q_odom = _DropQueue(queue_size)
    cap = SensorCaptureThread(source, q_sensor, post_update)
    odo = OdometryThread(odometry, q_sensor, q_odom)
    eng = RtabmapThread(slam, q_odom)
    eng.start()
    odo.start()
    cap.start()
    cap.join(timeout)
    odo.join(timeout)
    eng.join(timeout)
    return eng, {"sensor_dropped": q_sensor.dropped, "odom_dropped": q_odom.dropped,
                 "captured": cap.captured, "odom_processed": odo.processed,
                 "slam_processed": eng.processed}
