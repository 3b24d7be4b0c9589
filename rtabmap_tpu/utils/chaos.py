"""Fault injection for the SLAM pipeline (beyond the reference:
SURVEY §5.3 — "No fault injection framework" exists in RTAB-Map; recovery
paths there are only exercised by real failures).

Wraps a frame stream and/or an odometry instance with deterministic,
seeded fault schedules so the engine's recovery machinery — odometry-loss
new-session trigger (covariance>=9999 → Rtabmap::triggerNewMap),
detection-rate gating, bad-covariance handling, frame drops — can be
regression-tested:

    faults = FaultSchedule(seed=0, drop_frame_p=0.05,
                           odom_loss_at=(30, 31, 32),
                           covariance_spike_p=0.02)
    for fr in faults.frames(stream):
        pose, cov, info = faults.odometry(odom.process(feat))
        ...
"""
from __future__ import annotations

from typing import Iterable, Iterator, Optional, Sequence, Tuple

import numpy as np


class FaultSchedule:
    def __init__(self, seed: int = 0, drop_frame_p: float = 0.0,
                 odom_loss_at: Sequence[int] = (),
                 covariance_spike_p: float = 0.0,
                 covariance_spike_scale: float = 1e4,
                 noise_burst_at: Sequence[int] = (),
                 noise_burst_sigma: float = 0.2):
        self.rng = np.random.RandomState(seed)
        self.drop_frame_p = drop_frame_p
        self.odom_loss_at = set(int(i) for i in odom_loss_at)
        self.covariance_spike_p = covariance_spike_p
        self.covariance_spike_scale = covariance_spike_scale
        self.noise_burst_at = set(int(i) for i in noise_burst_at)
        self.noise_burst_sigma = noise_burst_sigma
        self.tick = -1
        self.injected = {"dropped": 0, "odom_loss": 0, "cov_spike": 0,
                         "noise_burst": 0}

    # ------------------------------------------------------------- frames
    def frames(self, stream: Iterable) -> Iterator:
        """Drop frames with probability drop_frame_p; corrupt images with
        additive noise bursts at scheduled ticks."""
        for k, fr in enumerate(stream):
            if self.drop_frame_p > 0 and self.rng.rand() < self.drop_frame_p:
                self.injected["dropped"] += 1
                continue
            if k in self.noise_burst_at and getattr(fr, "gray", None) is not None:
                g = np.asarray(fr.gray)
                g = np.clip(g + self.rng.randn(*g.shape).astype(g.dtype)
                            * self.noise_burst_sigma, 0.0, 1.0)
                fr = fr._replace(gray=g) if hasattr(fr, "_replace") else fr
                self.injected["noise_burst"] += 1
            yield fr

    # ----------------------------------------------------------- odometry
    def odometry(self, result: Tuple):
        """Wrap an odometry (pose, cov, info) result: scheduled total
        losses (pose->None, cov->9999 — the reference's failure
        convention) and random covariance spikes."""
        self.tick += 1
        pose, cov, info = result
        if self.tick in self.odom_loss_at:
            self.injected["odom_loss"] += 1
            return None, np.eye(6) * 9999.0, dict(info, injected_loss=True)
        if (pose is not None and self.covariance_spike_p > 0
                and self.rng.rand() < self.covariance_spike_p):
            self.injected["cov_spike"] += 1
            cov = np.asarray(cov) * self.covariance_spike_scale
        return pose, cov, info
