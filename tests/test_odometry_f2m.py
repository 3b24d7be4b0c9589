"""F2M odometry over a short synthetic arc: drift must stay small."""
import jax
import numpy as np

from rtabmap_tpu.geometry import camera as C
from rtabmap_tpu.datasets import synthetic as S
from rtabmap_tpu.core.frame import extract_features
from rtabmap_tpu.odometry.f2m import OdometryF2M
from rtabmap_tpu.utils import metrics

CAM = C.CameraModel.make(300.0, 300.0, 160.0, 120.0, 320, 240)


def test_f2m_short_arc():
    n_total, n_used = 64, 12
    poses = S.loop_trajectory(n_total)[:n_used]
    extract = jax.jit(lambda g, d: extract_features(g, d, CAM, 384))
    odom = OdometryF2M(CAM)
    est = []
    for i in range(n_used):
        g, d = S.render(poses[i], CAM)
        pose, cov, info = odom.process(extract(g, d))
        assert pose is not None, f"lost at {i}: {info}"
        est.append(np.asarray(pose))
    ate = metrics.ate_rmse(np.stack(est), np.asarray(poses))
    assert ate < 0.05, ate


def test_metrics_identity():
    poses = np.asarray(S.loop_trajectory(16))
    assert metrics.ate_rmse(poses, poses) < 1e-6
    t, r = metrics.rpe(poses, poses)
    assert t < 1e-6 and r < 1e-5


def test_metrics_alignment_invariance():
    import jax.numpy as jnp
    from rtabmap_tpu.geometry import transform as T

    poses = S.loop_trajectory(16)
    offset = T.from_xyzrpy(jnp.array([5.0, -2.0, 1.0, 0.3, 0.1, -0.7]))
    moved = jnp.stack([T.compose(offset, poses[i]) for i in range(16)])
    # ATE is invariant to a global rigid transform of the whole trajectory
    assert metrics.ate_rmse(np.asarray(moved), np.asarray(poses)) < 1e-5


def test_local_ba_improves_or_preserves(tmp_path=None):
    """OdomF2M/BundleAdjustment: window BA must not hurt a clean run and
    the refined trajectory stays metrically consistent (reference:
    OdometryF2M.cpp:345-475 local sba)."""
    import jax
    import numpy as np

    from rtabmap_tpu.core.frame import extract_features
    from rtabmap_tpu.datasets import synthetic as S
    from rtabmap_tpu.geometry import camera as C
    from rtabmap_tpu.geometry import transform as T
    from rtabmap_tpu.odometry.f2m import OdometryF2M
    from rtabmap_tpu.utils.metrics import ate_rmse
    from rtabmap_tpu.utils.params import Parameters
    import jax.numpy as jnp

    cam = C.CameraModel.make(300.0, 300.0, 160.0, 120.0, 320, 240)
    poses = S.loop_trajectory(96)[:16]
    extract = jax.jit(lambda g, d: extract_features(g, d, cam, 256))
    ates = {}
    for ba in (0, 1):
        p = (Parameters().set("OdomF2M/BundleAdjustment", ba)
             .set("Odom/KeyFrameThr", 0.9))  # force frequent keyframes
        odom = OdometryF2M(cam, p, max_features=256)
        est, gt = [], []
        for i in range(16):
            g, d = S.render(poses[i], cam)
            pose, cov, info = odom.process(extract(g, d))
            assert pose is not None, f"lost at {i} (ba={ba})"
            est.append(np.asarray(pose))
            gt.append(np.asarray(T.relative(jnp.asarray(poses[0]),
                                            jnp.asarray(poses[i]))))
        ates[ba] = ate_rmse(np.stack(est), np.stack(gt))
    # BA path must work and stay within 1.5x of the plain run (usually
    # better; synthetic depth is near-perfect so both are tiny)
    assert ates[1] < max(1.5 * ates[0], 0.05), ates


def test_post_reset_covariance_maturity_window():
    """Pin the round-4 post-reset covariance maturity decay
    (odometry/f2m.py): the first TRACKED tick after bootstrap/reset() must
    report a ~1e5-boosted covariance (no multi-view structure yet -> the
    mm-level residual covariance poisons the RGBD/OptimizeMaxError gate),
    decaying to the unboosted steady state after 5 tracked ticks."""
    import jax.numpy as jnp

    poses = S.loop_trajectory(64)[:10]
    extract = jax.jit(lambda g, d: extract_features(g, d, CAM, 384))
    odom = OdometryF2M(CAM)
    traces = []
    for i in range(10):
        g, d = S.render(poses[i], CAM)
        pose, cov, info = odom.process(extract(g, d))
        assert pose is not None, f"lost at {i}"
        traces.append(float(jnp.trace(cov)))
    # tick 0 is bootstrap (fixed tiny cov); tick 1 is the first tracked
    # tick: full 1e5 boost relative to the mature steady state
    steady = traces[-1]
    assert traces[1] / steady > 1e3, (traces[1], steady)
    # monotone non-increasing through the window (same scene => the base
    # residual covariance is comparable tick to tick)
    assert traces[1] > traces[2] > traces[3], traces[:4]
    # after >=6 tracked ticks the boost is gone: consecutive ticks agree
    # within an order of magnitude
    assert traces[-1] / traces[-2] < 10 and traces[-2] / traces[-1] < 10

    # reset() restores the window
    odom.reset(pose=poses[0])
    g, d = S.render(poses[0], CAM)
    odom.process(extract(g, d))          # bootstrap again
    g, d = S.render(poses[1], CAM)
    pose, cov, _ = odom.process(extract(g, d))
    assert pose is not None
    # base residual covariance varies ~100x frame to frame; the 1e5 boost
    # still dominates by far
    assert float(jnp.trace(cov)) / steady > 100
