"""End-to-end SLAM: odometry + loop closure + graph optimization on the
synthetic loop. The flagship integration test (BOWMapping/RgbdDataset
analogue — reference SURVEY.md §4)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rtabmap_tpu.geometry import camera as C
from rtabmap_tpu.datasets import synthetic as S
from rtabmap_tpu.core.frame import extract_features
from rtabmap_tpu.odometry.f2m import OdometryF2M
from rtabmap_tpu.engine.rtabmap import Rtabmap
from rtabmap_tpu.utils import metrics
from rtabmap_tpu.utils.params import Parameters

CAM = C.CameraModel.make(300.0, 300.0, 160.0, 120.0, 320, 240)


@pytest.mark.slow
def test_slam_loop_closure_improves_ate():
    n_loop, n_extra = 48, 10
    poses_gt = jnp.concatenate(
        [S.loop_trajectory(n_loop), S.loop_trajectory(n_loop)[:n_extra]], axis=0
    )
    n = n_loop + n_extra
    extract = jax.jit(lambda g, d: extract_features(g, d, CAM, 384))
    odom = OdometryF2M(CAM)
    slam = Rtabmap(CAM, Parameters(), node_capacity=128, words_per_frame=384)
    est_odom = []
    loops = 0
    for i in range(n):
        g, d = S.render(poses_gt[i], CAM)
        fr = extract(g, d)
        pose, cov, info = odom.process(fr)
        assert pose is not None, f"odometry lost at {i}"
        st = slam.process(fr, np.asarray(pose), np.asarray(cov), stamp=float(i))
        est_odom.append(np.asarray(pose))
        loops += int(st.loop_closure_id > 0)

    assert loops >= 1, "no loop closures accepted on revisit"
    opt = slam.get_optimized_poses()
    ids = sorted(opt)
    assert len(ids) == n
    est = np.stack([opt[i] for i in ids])
    assert np.isfinite(est).all()
    ate_slam = metrics.ate_rmse(est, np.asarray(poses_gt))
    ate_odom = metrics.ate_rmse(np.stack(est_odom), np.asarray(poses_gt))
    # loop closure must not degrade the trajectory, and keep it tight
    assert ate_slam <= ate_odom * 1.1, (ate_slam, ate_odom)
    assert ate_slam < 0.08, ate_slam

    # statistics surface sanity (reference Statistics parity)
    st = slam.stats_history[-1]
    assert "Timing/Total/ms" in st.data
    assert st.get("Memory/Working memory size/") > 0
    assert st.get("Keypoint/Dictionary size/words") > 1000
