"""Loop-closure registration correspondence modes (reference:
RegistrationVis.cpp:560-1150): guess-projected window matching
(Vis/CorGuessWinSize), optical-flow correspondences (Vis/CorType=1), and
GMS match re-ranking (Vis/CorNNType=7)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rtabmap_tpu.core.frame import extract_features
from rtabmap_tpu.datasets import synthetic as S
from rtabmap_tpu.geometry import camera as C
from rtabmap_tpu.geometry import transform as T
from rtabmap_tpu.memory.memory import Memory
from rtabmap_tpu.utils.params import Parameters

CAM = C.CameraModel.make(300.0, 300.0, 160.0, 120.0, 320, 240)


def _mem(**over):
    p = Parameters()
    for k, v in over.items():
        p.set(k, v)
    return Memory(p, node_capacity=16, words_per_frame=256)


def _pair(mem, i=0, j=2, keep_images=False):
    poses = S.loop_trajectory(32)
    out = []
    for k in (i, j):
        g, d = S.render(poses[k], CAM)
        fr = extract_features(g, d, CAM, 256)
        sig = mem.create_signature(fr, np.asarray(poses[k]), float(k))
        if keep_images:
            sig.image = np.asarray(g)
        out.append(sig)
    t_true = np.asarray(T.relative(poses[i], poses[j]))
    return out[0], out[1], t_true


def _check(t_ab, t_true, tol=0.05):
    assert t_ab is not None
    err = float(jnp.linalg.norm(T.se3_log(
        T.compose(T.inverse(jnp.asarray(t_ab)), jnp.asarray(t_true)))))
    assert err < tol, err


def test_window_matching_recovers_transform():
    mem = _mem()
    a, b, t_true = _pair(mem)
    key = jax.random.PRNGKey(0)
    t_ab, cov, inl = mem.compute_transform(
        a.id, b.id, CAM, key, guess=t_true, guess_window=True)
    _check(t_ab, t_true)
    assert inl >= 20


def test_window_matching_beats_global_on_corrupted_descriptors():
    """With heavy descriptor aliasing (every descriptor duplicated), global
    NNDR collapses (ratio test kills ambiguous matches) while the
    projection window disambiguates by geometry."""
    mem = _mem()
    a, b, t_true = _pair(mem)
    # alias descriptors pairwise: rows 2k and 2k+1 share a descriptor
    d = np.asarray(b.desc).copy()
    d[1::2] = d[0::2]
    b.desc = d
    key = jax.random.PRNGKey(1)
    t_glob, _, inl_glob = mem.compute_transform(a.id, b.id, CAM, key,
                                                guess=t_true, min_inliers=12)
    t_win, _, inl_win = mem.compute_transform(a.id, b.id, CAM, key,
                                              guess=t_true, min_inliers=12,
                                              guess_window=True)
    assert inl_win > inl_glob, (inl_win, inl_glob)
    _check(t_win, t_true, tol=0.1)


def test_flow_mode_registration():
    mem = _mem(**{"Vis/CorType": 1})
    a, b, t_true = _pair(mem, keep_images=True)
    key = jax.random.PRNGKey(2)
    t_ab, cov, inl = mem.compute_transform(a.id, b.id, CAM, key, guess=t_true)
    _check(t_ab, t_true, tol=0.08)
    assert inl >= 15


def test_flow_mode_without_images_falls_back():
    mem = _mem(**{"Vis/CorType": 1})
    a, b, t_true = _pair(mem, keep_images=False)
    key = jax.random.PRNGKey(3)
    t_ab, cov, inl = mem.compute_transform(a.id, b.id, CAM, key, guess=t_true)
    _check(t_ab, t_true, tol=0.08)


def test_gms_mode_registration():
    mem = _mem(**{"Vis/CorNNType": 7})
    a, b, t_true = _pair(mem)
    key = jax.random.PRNGKey(4)
    t_ab, cov, inl = mem.compute_transform(a.id, b.id, CAM, key)
    _check(t_ab, t_true, tol=0.12)
    assert inl >= 15
