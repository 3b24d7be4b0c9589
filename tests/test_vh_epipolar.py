"""Epipolar hypothesis verification wired into the engine accept path
(reference: Rtabmap.cpp:2193 `_verifyLoopClosureHypothesis` ->
EpipolarGeometry::check, gated by VhEp/Enabled)."""
import jax
import jax.numpy as jnp
import numpy as np

from rtabmap_tpu.core.frame import extract_features
from rtabmap_tpu.datasets import synthetic as S
from rtabmap_tpu.engine.rtabmap import Rtabmap
from rtabmap_tpu.geometry import camera as C
from rtabmap_tpu.utils.logging import Statistics
from rtabmap_tpu.utils.params import Parameters

CAM = C.CameraModel.make(300.0, 300.0, 160.0, 120.0, 320, 240)


def _engine(**over):
    p = Parameters()
    p.set("VhEp/Enabled", True)
    for k, v in over.items():
        p.set(k, v)
    return Rtabmap(CAM, p, node_capacity=64, words_per_frame=256)


def _make_sig(slam, pose):
    g, d = S.render(jnp.asarray(pose), CAM)
    fr = extract_features(g, d, CAM, 256)
    return slam.memory.create_signature(fr, np.asarray(pose), 0.0)


def test_geometric_pair_passes():
    slam = _engine()
    poses = S.loop_trajectory(32)
    a = _make_sig(slam, poses[0])
    b = _make_sig(slam, poses[1])  # small true motion: valid epipolar geom
    st = Statistics()
    assert slam._verify_hypothesis_ep(b, a.id, st)
    assert st.get("Loop/Epipolar pairs/") >= 8
    assert st.get("Loop/Epipolar inliers/") >= 8


def test_scrambled_pair_rejected():
    slam = _engine()
    poses = S.loop_trajectory(32)
    a = _make_sig(slam, poses[0])
    b = _make_sig(slam, poses[1])
    # scramble B's keypoint coordinates: word pairs remain, geometry gone
    rng = np.random.default_rng(0)
    b.uv = rng.uniform(0, 320, size=b.uv.shape).astype(np.float32)
    st = Statistics()
    assert not slam._verify_hypothesis_ep(b, a.id, st)


def test_too_few_pairs_rejected():
    slam = _engine(**{"VhEp/MatchCountMin": 10_000})
    poses = S.loop_trajectory(32)
    a = _make_sig(slam, poses[0])
    b = _make_sig(slam, poses[1])
    st = Statistics()
    assert not slam._verify_hypothesis_ep(b, a.id, st)


def test_param_changes_engine_behavior():
    """VhEp/Enabled must gate the accept path: with a scrambled current
    frame the hypothesis passes the appearance stage but must be rejected
    by epipolar verification."""
    import rtabmap_tpu.engine.rtabmap as ENG

    n = 20
    poses = S.loop_trajectory(n)
    for enabled, expect_verify_called in ((False, False), (True, True)):
        p = Parameters()
        p.set("VhEp/Enabled", enabled)
        p.set("RGBD/Enabled", False)
        p.set("Rtabmap/LoopThr", 0.0)
        p.set("Rtabmap/LoopRatio", 0.0)
        slam = Rtabmap(CAM, p, node_capacity=64, words_per_frame=256)
        called = []
        orig = ENG.Rtabmap._verify_hypothesis_ep

        def spy(self, sig, hyp, st, _orig=orig, _called=called):
            _called.append(hyp)
            return _orig(self, sig, hyp, st)

        slam._verify_hypothesis_ep = spy.__get__(slam)
        ext = jax.jit(lambda g, d: extract_features(g, d, CAM, 256))
        for i in range(n):
            g, d = S.render(poses[i % (n // 2)], CAM)
            fr = ext(g, d)
            slam.process(fr, np.asarray(poses[i % (n // 2)]), stamp=float(i))
        assert bool(called) == expect_verify_called, (enabled, called)
