"""Proximity-by-time: cross-session STM closures (RGBD/ProximityByTime)."""
import jax
import jax.numpy as jnp
import numpy as np

from rtabmap_tpu.core.frame import extract_features
from rtabmap_tpu.datasets import synthetic as S
from rtabmap_tpu.engine.rtabmap import Rtabmap
from rtabmap_tpu.geometry import camera as C
from rtabmap_tpu.memory.memory import LINK_LOCAL_TIME_CLOSURE
from rtabmap_tpu.utils.params import Parameters


def test_cross_session_time_links():
    cam = C.CameraModel.make(160.0, 160.0, 79.5, 59.5, 160, 120)
    poses = S.loop_trajectory(64)[:6]
    grays, depths = S.render_sequence(poses, cam)
    ext = jax.jit(lambda g, d: extract_features(g, d, cam, 256))
    p = Parameters({"RGBD/ProximityByTime": True, "Rtabmap/DetectionRate": 0,
                    "Vis/MinInliers": 12})
    slam = Rtabmap(cam, p, node_capacity=64, words_per_frame=256)
    for i in range(4):
        slam.process(ext(grays[i], depths[i]), np.asarray(poses[i]),
                     np.eye(6) * 1e-4, stamp=float(i))
    slam.trigger_new_map()
    # revisit the same viewpoints in a new session while old nodes sit in STM
    n_time = 0
    for i in range(3):
        st = slam.process(ext(grays[i], depths[i]), np.asarray(poses[i]),
                          np.eye(6) * 1e-4, stamp=10.0 + i)
        n_time += int(st.get("Proximity/Time links added/", 0))
    assert n_time >= 1
    time_links = [lk for s in slam.memory.signatures.values()
                  for lk in s.links.values()
                  if lk.type == LINK_LOCAL_TIME_CLOSURE]
    assert time_links
